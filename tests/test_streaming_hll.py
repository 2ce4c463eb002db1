"""Streaming HLL: the stateful register fold must equal the one-pass
batch sketch exactly, survive query restarts, and keep bounded state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nlp4l_spark.ops import sketches
from nlp4l_spark.streaming.hll import current_estimate, streaming_hll

SCHEMA = "event_type string, ud string"


def _rows(i0, n, types=("click", "view")):
    return [
        (types[i % len(types)], f"u{i % 37}:d{i0 + i}") for i in range(n)
    ]


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
        streaming_hll(stream, F.col("ud"), "event_type")
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def _batch_truth(spark, in_dir):
    df = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    return {
        r["event_type"]: (r["registers_used"], r["hll_est"])
        for r in sketches.hll_estimate(
            df, F.col("ud"), ["event_type"]
        ).collect()
    }


def test_streaming_hll_matches_batch_and_survives_restart(spark, tmp_path):
    in_dir, chk, out_dir = (str(tmp_path / d) for d in ("in", "chk", "out"))
    _write_batch(spark, in_dir, _rows(0, 400), "b1")
    _write_batch(spark, in_dir, _rows(200, 400), "b2")  # overlaps b1
    out = _run_available_now(spark, in_dir, chk, out_dir)
    got = {
        r["grp"]: (r["registers_used"], r["hll_est"])
        for r in current_estimate(out).collect()
    }
    want = _batch_truth(spark, in_dir)
    assert set(got) == set(want)
    for g in want:
        assert got[g][0] == want[g][0], (g, got[g], want[g])  # registers exact
        assert abs(got[g][1] - want[g][1]) <= 1e-6, (g, got[g], want[g])

    # restart from the checkpoint with a third batch: still equals the
    # one-pass batch sketch over everything seen so far
    _write_batch(spark, in_dir, _rows(700, 300, types=("click", "view", "buy")), "b3")
    out = _run_available_now(spark, in_dir, chk, out_dir)
    got = {
        r["grp"]: (r["registers_used"], r["hll_est"])
        for r in current_estimate(out).collect()
    }
    want = _batch_truth(spark, in_dir)
    assert set(got) == set(want) and "buy" in got
    for g in want:
        assert got[g][0] == want[g][0], (g, got[g], want[g])
        assert abs(got[g][1] - want[g][1]) <= 1e-6, (g, got[g], want[g])
