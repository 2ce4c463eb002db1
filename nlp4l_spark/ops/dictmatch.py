"""Dictionary phrase matching — the SimpleFST surface, re-expressed.

Reference semantics: ``SimpleFST`` wraps a Lucene FST for dictionary
matching — sorted-key insert (/root/reference/app/org/nlp4l/lucene/
SimpleFST.scala:40-42), left-most/longest-substring lookup (:49-82), exact
match (:91-100), used to annotate text with known dictionary entries.

Spark-first rebuild: the "FST" is just a broadcast phrase table.

* ``phrase_occurrences`` — EVERY token-position occurrence of any
  dictionary phrase, as an equality join of candidate n-grams against the
  broadcast phrases. All JVM built-ins (one narrow explode per distinct
  phrase length, no Python), SQL-oracle comparable, and at 10^12 turns the
  join is a broadcast hash join against a scan — no shuffle of the corpus.
* ``annotate_left_most_longest`` — the FST's greedy scan semantics: walk
  the token stream, at each position take the LONGEST dictionary phrase
  starting there, emit it, continue after its end (no overlaps). The
  greedy recurrence is inherently sequential per document, so it runs in
  one Arrow-vectorized pass with the phrase set broadcast as a plain dict
  keyed by first token (exactly the role the FST plays in the reference).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nlp4l_spark.analysis import Analyzer, WHITESPACE_ANALYZER


def _phrase_token_lists(
    phrases: list[str], analyzer: Analyzer
) -> list[list[str]]:
    out = []
    for p in phrases:
        toks = analyzer.tokenize(p)
        if toks:
            out.append(toks)
    return out


def phrase_occurrences(
    df: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """(doc_id, start_tok, n_toks, phrase) for every occurrence of every
    dictionary phrase (token-aligned, overlaps included) — the relational
    form of FST substring lookup."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    plists = _phrase_token_lists(phrases, analyzer)
    spark = df.sparkSession
    if not plists:
        return spark.createDataFrame(
            [], f"doc_id long, start_tok int, n_toks int, phrase string"
        )
    lengths = sorted({len(p) for p in plists})
    pdf = F.broadcast(
        spark.createDataFrame(
            [(" ".join(p), len(p)) for p in plists], "phrase string, n_toks int"
        )
    )
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        analyzer.tokens_expr(text_col).alias("_tk"),
    )
    # candidate n-grams with start positions, one array per phrase length;
    # flatten -> ONE explode total (narrow), then broadcast-join phrases.
    # NB: the transform lambda must take exactly ONE arg — a 2-arg lambda
    # is interpreted by Spark as (element, index).
    def _gram(n: int):
        def inner(i):
            return F.struct(
                i.cast("int").alias("start_tok"),
                F.lit(n).alias("n_toks"),
                F.concat_ws(" ", F.slice("_tk", i + 1, n)).alias("gram"),
            )

        return inner

    per_len = [
        F.when(
            F.size("_tk") >= n,
            F.transform(F.sequence(F.lit(0), F.size("_tk") - n), _gram(n)),
        ).otherwise(F.array().cast(
            "array<struct<start_tok:int,n_toks:int,gram:string>>"
        ))
        for n in lengths
    ]
    cands = toks.select(
        "doc_id", F.explode(F.flatten(F.array(*per_len))).alias("_c")
    ).select("doc_id", "_c.start_tok", "_c.n_toks", F.col("_c.gram").alias("phrase"))
    return cands.join(pdf, ["phrase", "n_toks"]).select(
        "doc_id", "start_tok", "n_toks", "phrase"
    )


def exact_match(
    values: DataFrame,
    value_col: str,
    phrases: list[str],
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """(value, matched) — FST exactMatch (SimpleFST.scala:91-100): does the
    whole analyzed value equal a dictionary entry."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    plists = _phrase_token_lists(phrases, analyzer)
    spark = values.sparkSession
    pdf = F.broadcast(
        spark.createDataFrame(
            [(" ".join(p),) for p in plists] or [("",)], "phrase string"
        ).filter(F.col("phrase") != "")
    )
    norm = F.concat_ws(" ", analyzer.tokens_expr(value_col))
    matched = (
        pdf.withColumnRenamed("phrase", "_n")
        .join(
            values.select(norm.alias("_n")).distinct(), "_n", "left_semi"
        )
        .withColumn("matched", F.lit(True))
    )
    return (
        values.withColumn("_n", norm)
        .join(F.broadcast(matched), "_n", "left")
        .select(value_col, F.coalesce("matched", F.lit(False)).alias("matched"))
    )


_ANNOT_ELEM = T.StructType(
    [
        T.StructField("start_tok", T.IntegerType()),
        T.StructField("n_toks", T.IntegerType()),
        T.StructField("phrase", T.StringType()),
    ]
)


def annotate_left_most_longest(
    df: DataFrame,
    phrases: list[str],
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """(doc_id, start_tok, n_toks, phrase) — greedy FST scan: left-most
    match wins, longest phrase at each position wins, matches never
    overlap (SimpleFST.leftMostSubstring semantics, SimpleFST.scala:49-82).
    One Arrow pass; the dictionary rides to executors as a broadcast-closure
    dict keyed by first token."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    plists = _phrase_token_lists(phrases, analyzer)
    by_first: dict[str, list[list[str]]] = {}
    for p in plists:
        by_first.setdefault(p[0], []).append(p)
    for v in by_first.values():
        v.sort(key=len, reverse=True)  # longest first
    tokenize = analyzer.tokenize

    @F.pandas_udf(T.ArrayType(_ANNOT_ELEM))
    def _annot(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tokenize(t)
            spans = []
            i = 0
            while i < len(toks):
                hit = None
                for cand in by_first.get(toks[i], ()):
                    if toks[i : i + len(cand)] == cand:
                        hit = cand
                        break  # longest-first order
                if hit is not None:
                    spans.append(
                        {
                            "start_tok": i,
                            "n_toks": len(hit),
                            "phrase": " ".join(hit),
                        }
                    )
                    i += len(hit)
                else:
                    i += 1
            out.append(spans)
        return pd.Series(out)

    return (
        df.select(
            F.col(id_col).alias("doc_id"), _annot(F.col(text_col)).alias("_a")
        )
        .select("doc_id", F.explode("_a").alias("_s"))
        .select("doc_id", "_s.start_tok", "_s.n_toks", "_s.phrase")
    )
