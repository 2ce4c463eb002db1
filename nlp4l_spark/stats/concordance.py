"""Concordance (KWIC) and term-dispersion corpus analytics.

Keyword-in-context is THE classic corpus-linguistics query the
reference's index browser serves interactively (doc/term position
browsing, /root/reference/app/org/nlp4l/lucene/RawReader.scala — the
positions/offsets read model); Gries' DP (Gries 2008, "Dispersions and
adjusted frequencies in corpora") is the standard measure of how evenly
a term spreads across documents — burstiness QC for training corpora
(a high-cf term with high DP is boilerplate concentrated in few docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nlp4l_spark.analysis import Analyzer, WHITESPACE_ANALYZER
from nlp4l_spark.stats.corpus import Corpus


def kwic(
    df: DataFrame,
    term: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    analyzer: Analyzer | None = None,
    width: int = 3,
    k: int = 100,
) -> DataFrame:
    """Keyword-in-context concordance: every occurrence of ``term`` with
    up to ``width`` tokens of left/right context, ordered (doc_id, pos),
    first ``k`` rows. Output: (id_col, pos, left_ctx, right_ctx) — pos
    is the 0-based token offset; contexts are space-joined token runs
    (empty string at document edges).

    Scale shape: everything happens inside ONE corpus scan — match
    positions, context slices and joins are JVM array HOFs over the
    per-doc token array; only matching occurrences explode into rows,
    and the final top-k is a TakeOrderedAndProject. No shuffle at all
    before the k-row merge."""
    az = analyzer or WHITESPACE_ANALYZER
    tk = az.tokens_expr(text_col)
    matches = F.when(
        F.size(tk) >= 1,
        F.filter(
            F.sequence(F.lit(1), F.size(tk)),
            lambda i: F.element_at(tk, i) == F.lit(term),
        ),
    ).otherwise(F.array().cast("array<int>"))
    base = df.select(
        F.col(id_col), tk.alias("_tk"), F.explode(matches).alias("_i")
    )
    i = F.col("_i")
    ls = F.greatest(i - width, F.lit(1))
    llen = i - ls
    rlen = F.least(F.lit(width), F.size("_tk") - i)
    left = F.when(llen > 0, F.slice("_tk", ls, llen)).otherwise(
        F.array().cast("array<string>")
    )
    right = F.when(rlen > 0, F.slice("_tk", i + 1, rlen)).otherwise(
        F.array().cast("array<string>")
    )
    return (
        base.select(
            id_col,
            (i - 1).cast("int").alias("pos"),
            F.concat_ws(" ", left).alias("left_ctx"),
            F.concat_ws(" ", right).alias("right_ctx"),
        )
        .orderBy(F.asc(id_col), F.asc("pos"))
        .limit(k)
    )


def term_dispersion(corpus: Corpus, top_n: int = 20) -> DataFrame:
    """Gries' DP dispersion for the ``top_n`` most frequent terms:
    ``DP = 0.5 * Σ_i |v_i − s_i|`` where v_i is the share of the term's
    occurrences in doc i and s_i the doc's share of the corpus — 0 means
    the term spreads exactly with document sizes, →1 means it is
    concentrated in a vanishing fraction of the corpus (boilerplate /
    burst QC). Absent docs (tf=0) contribute s_i, folded in closed form:
    ``DP = 0.5 * (Σ_present |v_i − s_i| + 1 − Σ_present s_i)`` so only
    (doc, term) rows with tf > 0 are ever touched.

    Output: (term, cf, dp), top_n by cf desc (term asc ties), rounded
    to 6.

    Scale shape: two corpus-wide exchanges — a doc-keyed window for doc
    lengths and the per-term aggregation — plus a broadcast of the
    vocab-sized cf table; the final top-n is a TakeOrdered."""
    dt = corpus.doc_terms()
    dl = F.sum(F.col("tf").cast("double")).over(Window.partitionBy("doc_id"))
    cf = dt.groupBy("term").agg(F.sum("tf").cast("double").alias("_cf"))
    n = float(
        dt.agg(F.sum("tf")).collect()[0][0] or 0.0
    )
    if n == 0.0:
        raise ValueError("term_dispersion: the corpus tokenized to nothing")
    with_dl = dt.withColumn("_dl", dl).join(F.broadcast(cf), "term")
    v = F.col("tf").cast("double") / F.col("_cf")
    s = F.col("_dl") / F.lit(n)
    per_term = with_dl.groupBy("term").agg(
        F.max("_cf").alias("_cf"),
        F.sum(F.abs(v - s)).alias("_dev"),
        F.sum(s).alias("_share"),
    )
    return (
        per_term.select(
            "term",
            F.col("_cf").cast("long").alias("cf"),
            F.round(
                0.5 * (F.col("_dev") + (F.lit(1.0) - F.col("_share"))), 6
            ).alias("dp"),
        )
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(top_n)
    )
