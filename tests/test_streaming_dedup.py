"""Streaming exact dedup: first-seen-wins across micro-batches AND query
restarts (checkpointed fingerprint state), agreeing with the batch twin
(ops/dedup.exact_dedup) on batch-order-compatible inputs."""

from __future__ import annotations

import os

from nlp4l_spark.ops.dedup import exact_dedup
from nlp4l_spark.streaming.dedup import streaming_dedup_exact

SCHEMA = "doc_id long, text string"


def _write_batch(spark, path, rows, part):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, part))


def _run_available_now(spark, in_dir, chk, out_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = (
        streaming_dedup_exact(stream)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_first_seen_wins_across_batches_and_restart(spark, tmp_path):
    in_dir, chk, out_dir = (
        str(tmp_path / d) for d in ("in", "chk", "out")
    )
    # batch 1: in-batch duplicate (1 vs 3, whitespace/case-normalized
    # equal) -> lowest id wins, like the batch twin
    _write_batch(spark, in_dir, [
        (1, "alpha beta"),
        (2, "gamma delta"),
        (3, "  Alpha   BETA "),
    ], "b1")
    out1 = _run_available_now(spark, in_dir, chk, out_dir)
    assert sorted(r["doc_id"] for r in out1.collect()) == [1, 2]

    # batch 2 (restart from the checkpoint): cross-batch duplicates are
    # dropped even though doc 4 has a LOWER id than nothing — 4 dups 1,
    # 5 is new
    _write_batch(spark, in_dir, [
        (4, "alpha beta"),
        (5, "epsilon zeta"),
    ], "b2")
    out2 = _run_available_now(spark, in_dir, chk, out_dir)
    assert sorted(r["doc_id"] for r in out2.collect()) == [1, 2, 5]

    # per-batch agreement with the batch twin: batch 1 alone dedups to
    # the same winners
    b1 = spark.read.parquet(os.path.join(in_dir, "b1"))
    batch_kept = sorted(
        r["doc_id"] for r in exact_dedup(b1).select("doc_id").collect()
    )
    assert batch_kept == [1, 2]
