"""NER record processor: sentence split + entity spans per text.

Reference semantics (what, not how): OpenNLPNerRecordProcessor — per
record, split into sentences, tokenize, run a span-tagging model per
entity type, emit typed spans (/root/reference/app/org/nlp4l/framework/
builtin/ner/OpenNLPNerProcessor.scala:44-107).

OpenNLP models are not available in this environment, so the tagging
step is pluggable: ``heuristic_tagger`` is a deterministic pure-Python
fake (capitalized-token runs, typed by a tiny gazetteer) used by tests;
a real model callable can be dropped in with the same
``(tokens) -> [(start_tok, end_tok, type)]`` contract. The Spark
plumbing — Arrow batching, sentence split, span explode, output schema —
is real and identical for either tagger.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_SENT_RE = re.compile(r"(?<=[.!?])\s+")
_TOK_RE = re.compile(r"\S+")
_CAP_RE = re.compile(r"^[A-Z][A-Za-z.-]*$")

_PERSON_HINTS = frozenset({"mr", "mrs", "ms", "dr", "prof"})
_LOC_HINTS = frozenset(
    {"london", "tokyo", "paris", "berlin", "osaka", "kyoto", "york"}
)

Span = tuple[int, int, str]
Tagger = Callable[[list[str]], Iterable[Span]]


def heuristic_tagger(tokens: list[str]) -> list[Span]:
    """Deterministic fake model: maximal runs of capitalized tokens
    (skipping the sentence-initial token unless the run extends), typed
    'location' if any token is in the gazetteer, preceded-by-honorific ->
    'person', else 'entity'."""
    spans: list[Span] = []

    def is_honorific(t: str) -> bool:
        return t.strip(".").lower() in _PERSON_HINTS

    i = 0
    while i < len(tokens):
        if _CAP_RE.match(tokens[i]):
            j = i
            # honorifics split a capitalized run: "Call Mr Jones" ->
            # run [Call], honorific, run [Jones] (person)
            while (
                j < len(tokens)
                and _CAP_RE.match(tokens[j])
                and not (j > i and is_honorific(tokens[j]))
            ):
                j += 1
            s = i
            if is_honorific(tokens[s]) and j > s + 1:
                s += 1
            if not (s == 0 and j == 1) and not (
                j == s + 1 and is_honorific(tokens[s])
            ):  # lone sentence-initial cap / bare honorific is noise
                words = [t.strip(".").lower() for t in tokens[s:j]]
                prev = tokens[s - 1].strip(".").lower() if s > 0 else ""
                if prev in _PERSON_HINTS:
                    typ = "person"
                elif any(w in _LOC_HINTS for w in words):
                    typ = "location"
                else:
                    typ = "entity"
                spans.append((s, j, typ))
            i = j
        else:
            i += 1
    return spans


_NER_ELEM = T.StructType(
    [
        T.StructField("sentence_idx", T.IntegerType()),
        T.StructField("entity", T.StringType()),
        T.StructField("entity_type", T.StringType()),
        T.StructField("start_tok", T.IntegerType()),
        T.StructField("end_tok", T.IntegerType()),
    ]
)


def extract_entities(
    df: DataFrame,
    text_col: str = "text",
    tagger: Tagger = heuristic_tagger,
) -> DataFrame:
    """One row per extracted span: (<input cols...>, sentence_idx, entity,
    entity_type, start_tok, end_tok)."""

    @F.pandas_udf(T.ArrayType(_NER_ELEM))
    def _ner(texts: pd.Series) -> pd.Series:
        def one(t):
            if not t:
                return []
            out = []
            for si, sent in enumerate(_SENT_RE.split(t)):
                toks = _TOK_RE.findall(sent)
                for s, e, typ in tagger(toks):
                    out.append(
                        {
                            "sentence_idx": si,
                            "entity": " ".join(toks[s:e]),
                            "entity_type": typ,
                            "start_tok": s,
                            "end_tok": e,
                        }
                    )
            return out

        return texts.map(one)

    return df.withColumn("_spans", _ner(F.col(text_col))).select(
        *df.columns, F.explode("_spans").alias("_s")
    ).select(*df.columns, "_s.*")
