"""Streaming DDSketch: the stateful bucket-count fold must equal the
one-pass batch sketch exactly (bucket-for-bucket, hence quantile-for-
quantile), survive query restarts, and keep bucket-bounded state."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nlp4l_spark.ops import sketches
from nlp4l_spark.streaming.ddsketch import (
    current_quantiles,
    streaming_ddsketch,
)

SCHEMA = "event_type string, value double"


def _rows(i0, n, types=("click", "view")):
    return [
        (types[i % len(types)], round(0.03 + ((i0 + i) * 7.13) % 300, 2))
        for i in range(n)
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
    cents = F.round(F.col("value") * 100).cast("long")
    q = (
        streaming_ddsketch(stream, cents, "event_type", scale=100.0)
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
    cents = F.round(F.col("value") * 100).cast("long")
    sk = sketches.dd_sketch(
        df.select("event_type", cents.alias("c")), "c",
        group_cols=["event_type"],
    )
    qd = sketches.dd_quantiles(
        sk, [0.5, 0.9, 0.99], scale=100.0, group_cols=["event_type"]
    )
    out = {}
    for r in qd.collect():
        out.setdefault(r["event_type"], {})[r["pct"]] = r["estimate"]
    return out


def test_streaming_matches_batch_and_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    _write_batch(spark, in_dir, _rows(0, 400), "b0")
    _write_batch(spark, in_dir, _rows(400, 300), "b1")
    out = _run_available_now(spark, in_dir, chk, out_dir)
    snap1 = {
        r["grp"]: (r["n"], r["p50"], r["p90"], r["p99"])
        for r in current_quantiles(out).collect()
    }
    truth = _batch_truth(spark, in_dir)
    for g, (n, p50, p90, p99) in snap1.items():
        assert (p50, p90, p99) == (
            truth[g][0.5],
            truth[g][0.9],
            truth[g][0.99],
        ), g
    assert sum(n for n, *_ in snap1.values()) == 700

    # restart from the checkpoint with one more batch: the resumed state
    # must fold the new data onto the OLD counts, not start over
    _write_batch(spark, in_dir, _rows(700, 500), "b2")
    out = _run_available_now(spark, in_dir, chk, out_dir)
    snap2 = {
        r["grp"]: (r["n"], r["p50"], r["p90"], r["p99"])
        for r in current_quantiles(out).collect()
    }
    truth2 = _batch_truth(spark, in_dir)
    for g, (n, p50, p90, p99) in snap2.items():
        assert (p50, p90, p99) == (
            truth2[g][0.5],
            truth2[g][0.9],
            truth2[g][0.99],
        ), g
    assert sum(n for n, *_ in snap2.values()) == 1200


def test_state_is_bucket_bounded(spark, tmp_path):
    """State per group = occupied buckets, not values: 1200 distinct
    cents values fold into far fewer DDSketch buckets."""
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, _rows(0, 1200, types=("x",)), "b0")
    df = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    cents = F.round(F.col("value") * 100).cast("long")
    sk = sketches.dd_sketch(df.select(cents.alias("c")), "c")
    n_buckets = sk.count()
    n_distinct = df.select("value").distinct().count()
    assert n_buckets < 600 and n_buckets < n_distinct
