"""Streaming daily EWMA/Holt: the day-keyed additive state must make
the smoothed outputs identical to the batch twins regardless of
micro-batch boundaries, arrival order, and checkpoint restarts."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from nlp4l_spark.streaming.ewma import (
    current_levels,
    streaming_daily_smooth,
)

SCHEMA = "event_type string, ts timestamp, value double"


def _rows(i0, n, types=("click", "view")):
    # deterministic synthetic events spread over ~10 days
    return [
        (
            types[i % len(types)],
            f"2024-01-{1 + ((i0 + i) * 3) % 10:02d} 0{(i0 + i) % 10}:00:00",
            round(0.03 + ((i0 + i) * 7.13) % 300, 2),
        )
        for i in range(n)
    ]


def _write_batch(spark, path, rows, part):
    ts = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    )
    ts.select(
        "event_type", F.to_timestamp("ts").alias("ts"), "value"
    ).coalesce(1).write.mode("append").parquet(os.path.join(path, part))


def _run(spark, in_dir, chk, out_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    sec = F.col("ts").cast("long")
    day = F.floor(sec / 86400).cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    q = (
        streaming_daily_smooth(stream, day, cents, "event_type")
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
    """Recompute the smoothing from the raw files with plain batch ops —
    the same recurrences the oracled event_ewma / holt_forecast twins
    implement."""
    df = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    sec = F.col("ts").cast("long")
    daily = (
        df.select(
            "event_type",
            F.floor(sec / 86400).cast("long").alias("day"),
            F.round(F.col("value") * 100).cast("long").alias("c"),
        )
        .groupBy("event_type", "day")
        .agg(F.sum("c").alias("s"))
        .collect()
    )
    series: dict[str, dict[int, int]] = {}
    for r in daily:
        series.setdefault(r["event_type"], {})[r["day"]] = int(r["s"])
    out = {}
    for g, dc in series.items():
        ew = lv = tr = None
        for d in sorted(dc):
            x = float(dc[d])
            ew = x if ew is None else 0.5 * x + 0.5 * ew
            if lv is None:
                lv, tr = x, 0.0
            else:
                nl = 0.5 * x + 0.5 * (lv + tr)
                tr = 0.5 * (nl - lv) + 0.5 * tr
                lv = nl
        out[g] = (
            len(dc),
            round(ew / 100.0, 6),
            round(lv / 100.0, 6),
            round(tr / 100.0, 6),
        )
    return out


def test_streaming_matches_batch_and_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)

    _write_batch(spark, in_dir, _rows(0, 300), "b0")
    _write_batch(spark, in_dir, _rows(300, 200), "b1")
    out = _run(spark, in_dir, chk, out_dir)
    snap = {
        r["grp"]: (r["n_days"], r["ewma"], r["holt_level"], r["holt_trend"])
        for r in current_levels(out).collect()
    }
    assert snap == _batch_truth(spark, in_dir)

    # restart from the checkpoint: resumed state folds new days/cents
    # onto the old sums, and the re-fold still matches the batch truth
    _write_batch(spark, in_dir, _rows(500, 400), "b2")
    out = _run(spark, in_dir, chk, out_dir)
    snap2 = {
        r["grp"]: (r["n_days"], r["ewma"], r["holt_level"], r["holt_trend"])
        for r in current_levels(out).collect()
    }
    assert snap2 == _batch_truth(spark, in_dir)


def test_state_is_day_bounded(spark, tmp_path):
    """900 events over 10 calendar days keep n_days = 10 — state scales
    with the calendar, not the stream."""
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    os.makedirs(in_dir)
    _write_batch(spark, in_dir, _rows(0, 900, types=("x",)), "b0")
    out = _run(spark, in_dir, chk, out_dir)
    rows = current_levels(out).collect()
    assert len(rows) == 1 and rows[0]["n_days"] == 10
