"""Streaming heavy hitters: Misra-Gries guarantees hold across
micro-batches and query restarts — heavy terms always present, counts in
[true - err, true], state bounded by num_groups x capacity."""

from __future__ import annotations

import os
from collections import Counter

from nlp4l_spark.streaming.heavyhitters import (
    _mg_merge,
    current_summary,
    streaming_heavy_hitters,
)

SCHEMA = "doc_id long, text string"


def _write_batch(spark, path, rows, part):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, part))


def _run_available_now(spark, in_dir, chk, out_dir, **kw):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = (
        streaming_heavy_hitters(stream, **kw)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_mg_merge_bounds():
    s, delta = _mg_merge({}, {"a": 10, "b": 3, "c": 1}, capacity=2)
    # (cap+1)-th largest = 1 subtracted from all, c dropped
    assert delta == 1 and s == {"a": 9, "b": 2}
    s2, d2 = _mg_merge(dict(s), {"c": 5}, capacity=2)
    assert d2 == 2 and s2 == {"a": 7, "c": 3}
    # no trim when under capacity
    s3, d3 = _mg_merge({}, {"x": 1}, capacity=2)
    assert d3 == 0 and s3 == {"x": 1}


def test_heavy_terms_survive_batches_and_restart(spark, tmp_path):
    in_dir, chk, out_dir = (str(tmp_path / d) for d in ("in", "chk", "out"))
    # skewed stream: 'hot' dominates, long tail of singletons
    b1 = [(i, "hot term " + f"tail{i}") for i in range(30)]
    b2 = [(100 + i, "hot hot " + f"rare{i}") for i in range(30)]
    _write_batch(spark, in_dir, b1, "b1")
    _run_available_now(
        spark, in_dir, chk, out_dir, capacity=8, num_groups=2
    )
    # restart with a new batch: state resumes from the checkpoint
    _write_batch(spark, in_dir, b2, "b2")
    snaps = _run_available_now(
        spark, in_dir, chk, out_dir, capacity=8, num_groups=2
    )
    cur = current_summary(snaps)
    rows = {r["term"]: r for r in cur.collect()}
    # exact truth over both batches
    toks = [t for _, txt in b1 + b2 for t in txt.split()]
    truth = Counter(toks)
    assert truth["hot"] == 90 and truth["term"] == 30
    # the heavy hitters are guaranteed present with bounded undercount
    for t in ("hot", "term"):
        assert t in rows, t
        r = rows[t]
        assert r["count"] <= truth[t]
        assert r["count"] >= truth[t] - r["err"]
    # state/summary size bounded by capacity per group
    sizes = Counter(r["grp"] for r in cur.collect())
    assert all(v <= 8 for v in sizes.values())
    # per-group token accounting matches the stream
    n_by_grp = {r["grp"]: r["n_tokens"] for r in cur.collect()}
    assert sum(n_by_grp.values()) == len(toks)
