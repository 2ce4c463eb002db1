"""Acronym extraction (SURVEY.md §2.3).

Reference semantics (/root/reference/app/org/nlp4l/framework/builtin/
acronym/AcronymExtractionProcessor.scala:33-281): find acronym candidates
matching ``[A-Z][A-Za-z/-]*[A-Z]`` (<= 10 chars), locate an expansion in
one of three syntactic shapes —

  1. "Chief Executive Officer (CEO)"   expansion ( ACRONYM )
  2. "Chief Executive Officer, or CEO" expansion[,] or ACRONYM
  3. "CEO (Chief Executive Officer)"   ACRONYM ( expansion )

then align acronym letters to expansion word initials with three strategies
tried in order: upper-case strict (each acronym letter consumes a
capitalized word initial), lower-case strict (initials case-insensitive),
upper-case loose (function words may be skipped). Output records are
"ACRONYM, Expansion" strings.

Executed as an Arrow-batched pandas UDF + explode: per-row pure-Python
string work (as in the reference), batching and shuffle-free fan-out from
Spark.
"""

from __future__ import annotations

import re

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_ACRO_RE = re.compile(r"[A-Z][A-Za-z/\-]*[A-Z]")
MAX_WORDS = 20


def _words_before(text: str, pos: int) -> list[str]:
    return text[:pos].strip().split()[-MAX_WORDS:]


def _align(acronym: str, words: list[str], *, lower: bool, loose: bool) -> str | None:
    """Right-to-left alignment of acronym letters to word initials."""
    letters = [c for c in acronym if c.isalpha()]
    li = len(letters) - 1
    wi = len(words) - 1
    used_start = None
    while li >= 0 and wi >= 0:
        w = words[wi]
        initial = w[0]
        a = letters[li]
        match = (
            initial.lower() == a.lower() if lower else initial == a
        )
        if match:
            used_start = wi
            li -= 1
            wi -= 1
        elif loose and w[0].islower():
            wi -= 1  # skip function word
        else:
            return None
    if li >= 0:
        return None
    return " ".join(words[used_start:]) if used_start is not None else None


def _find_expansion(text: str, acronym: str, start: int, end: int) -> str | None:
    candidates: list[list[str]] = []
    before = text[:start].rstrip()
    # shape 1: "Expansion (ACRONYM" — char before '(' is the expansion tail
    if before.endswith("("):
        candidates.append(_words_before(text, start - 1))
    # shape 2: "Expansion or ACRONYM" / "Expansion, or ACRONYM"
    m = re.search(r"([A-Za-z/\-\s]+),?\s+or\s*$", before)
    if m:
        candidates.append(m.group(1).strip().split()[-MAX_WORDS:])
    # shape 3: "ACRONYM (Expansion)"
    m = re.match(r"\s*\(([^)]+)\)", text[end:])
    if m:
        candidates.append(m.group(1).strip().split()[:MAX_WORDS])
    for words in candidates:
        words = [w.strip(",.;:") for w in words if w.strip(",.;:")]
        if len(words) < 2:
            continue
        for lower, loose in ((False, False), (True, False), (False, True)):
            exp = _align(acronym, words, lower=lower, loose=loose)
            if exp:
                return exp
    return None


def extract_acronyms_text(text: str | None) -> list[str]:
    """Pure-Python core (unit-testable): 'ACRONYM, Expansion' strings."""
    if not text:
        return []
    out = []
    for m in _ACRO_RE.finditer(text):
        if m.end() - m.start() <= 10:
            exp = _find_expansion(text, m.group(), m.start(), m.end())
            if exp:
                out.append(f"{m.group()}, {exp}")
    return out


def extract_acronyms(df: DataFrame, text_col: str = "text") -> DataFrame:
    """DataFrame op: one output row per (acronym, expansion) found."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _extract(texts: pd.Series) -> pd.Series:
        return texts.map(extract_acronyms_text)

    return df.select(
        F.explode(_extract(F.col(text_col))).alias("acronyms")
    )


def acronym_candidates(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(acronym, cnt) — the regex-find half of the reference operator
    (AcronymExtractionProcessor.scala:36: candidates match
    ``[A-Z][A-Za-z/-]*[A-Z]`` and are <= 10 chars), as pure JVM expressions
    (regexp_extract_all + explode), SQL-oracle comparable. The expansion
    alignment half stays in the pandas UDF (extract_acronyms)."""
    return (
        df.select(
            F.explode(
                F.expr(
                    rf"regexp_extract_all({text_col}, '[A-Z][A-Za-z/\\-]*[A-Z]', 0)"
                )
            ).alias("acronym")
        )
        .filter(F.length("acronym") <= 10)
        .groupBy("acronym")
        .agg(F.count("*").alias("cnt"))
    )
