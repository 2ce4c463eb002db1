"""Rank fusion for hybrid retrieval: combine lexical (BM25) and other
rankings (dense cosine, phrase, recency, ...) without score calibration.

Reciprocal Rank Fusion (Cormack, Clarke & Buettcher, SIGIR 2009):
RRF(d) = Σ_r 1 / (k + rank_r(d)) over the rankings r that contain d.
Rank-based fusion is the standard way to merge BM25 with embedding
retrieval because the two score distributions are incomparable; k=60 is
the paper's (and Elasticsearch's) default.

Scale shape: each input ranking is already top-n (tiny — candidates per
query, never corpus-sized); fusion is a union + one small aggregation.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 60,
    topk: int = 10,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Fuse ranked lists into (id_col, rrf_score, rank).

    Each input DataFrame needs (id_col, rank_col) with 1-based ranks; a
    doc absent from a ranking simply contributes nothing for it. Output
    is the global top-``topk`` by RRF score, ties broken by id asc —
    deterministic for oracle comparison.
    """
    if not rankings:
        raise ValueError("rrf_fuse needs at least one ranking")
    parts = [
        r.select(
            F.col(id_col),
            (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col).cast("double"))).alias(
                "_c"
            ),
        )
        for r in rankings
    ]
    allc = reduce(lambda a, b: a.unionByName(b), parts)
    fused = (
        allc.groupBy(id_col)
        .agg(F.sum("_c").alias("rrf_score"))
        .orderBy(F.desc("rrf_score"), F.asc(id_col))
        .limit(topk)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("rrf_score"), F.asc(id_col))
    return fused.withColumn("rank", F.row_number().over(w)).select(
        id_col, F.round("rrf_score", 6).alias("rrf_score"), "rank"
    )
