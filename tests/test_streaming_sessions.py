"""Stateful streaming sessionization: sessions spanning micro-batches AND
query restarts must be stitched exactly (checkpointed state), and results
must agree with the batch twin (ops/processors.sessionize) on the closed
sessions."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.ops import processors
from nlp4l_spark.streaming.sessions import streaming_sessionize

SCHEMA = "user_id long, ts timestamp"


def _write_batch(spark, path, rows, part):
    from datetime import datetime

    rows = [(u, datetime.strptime(t, "%Y-%m-%d %H:%M:%S")) for u, t in rows]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, part))


def _run_available_now(spark, in_dir, chk, out_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    # file sink: the only built-in sink that supports checkpoint RECOVERY
    # (memory sink refuses to restart), which is the property under test
    q = (
        streaming_sessionize(stream, gap_seconds=600)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_sessions_span_batches_and_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    t = "2026-01-01 10:{m:02d}:00"

    # batch 1: user 1 has events at 10:00 & 10:05 (one open session);
    # user 2 at 10:00 then 10:30 (gap 30min > 10min -> first closes)
    _write_batch(spark, in_dir, [
        (1, t.format(m=0)), (1, t.format(m=5)),
        (2, t.format(m=0)), (2, t.format(m=30)),
    ], "b1")
    out1 = _run_available_now(spark, in_dir, chk, out_dir)
    got1 = [(r["user_id"], r["n_events"]) for r in out1.collect()]
    assert got1 == [(2, 1)]  # only user 2's first session closed

    # batch 2 (same checkpoint -> restored state): user 1 gets an event
    # 40min later, closing the 2-event session carried in state; user 2's
    # open session extends (10:35, within gap of 10:30). The file sink
    # output is cumulative across the restart.
    _write_batch(spark, in_dir, [
        (1, t.format(m=45)), (2, t.format(m=35)),
    ], "b2")
    out2 = _run_available_now(spark, in_dir, chk, out_dir)
    got2 = sorted((r["user_id"], r["n_events"]) for r in out2.collect())
    assert got2 == [(1, 2), (2, 1)]  # user 1's cross-restart session closed

    # and the closed sessions match the batch twin over the same events
    all_rows = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    batch = processors.sessionize(all_rows, "user_id", "ts", 600)
    closed_batch = (
        batch.groupBy("user_id", "session_id")
        .agg(F.count("*").alias("n"), F.max("ts").alias("last"))
    )
    # batch sees ALL sessions; streaming emitted only the closed ones —
    # every streaming-closed (user, n_events) must appear in the batch view
    bset = {(r["user_id"], r["n"]) for r in closed_batch.collect()}
    for u, n in got2:
        assert (u, n) in bset


def test_out_of_order_events_merge_without_rewinding(spark, tmp_path):
    """A later micro-batch delivering an event with ts EARLIER than the
    stored session tail must merge into the open session (start=min,
    last=max) — it must NOT rewind `last` and split the session when an
    on-time event follows."""
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")
    out_dir = str(tmp_path / "out")
    t = "2026-01-01 10:{m:02d}:00"

    # batch 1: session open with last=10:08
    _write_batch(spark, in_dir, [(7, t.format(m=0)), (7, t.format(m=8))], "b1")
    _run_available_now(spark, in_dir, chk, out_dir)

    # batch 2: a LATE event at 10:03 (before the stored last)
    _write_batch(spark, in_dir, [(7, t.format(m=3))], "b2")
    _run_available_now(spark, in_dir, chk, out_dir)

    # batch 3: an on-time event at 10:15 — within gap of last=10:08, so
    # the session must EXTEND (a rewound last=10:03 would still pass
    # here; the split shows at close time via n_events)
    # batch 4: 11:00 closes it — the session must contain all 4 events
    _write_batch(spark, in_dir, [(7, t.format(m=15))], "b3")
    _run_available_now(spark, in_dir, chk, out_dir)
    _write_batch(spark, in_dir, [(7, "2026-01-01 11:00:00")], "b4")
    out = _run_available_now(spark, in_dir, chk, out_dir)
    closed = [
        (r["n_events"], r["session_start"], r["session_end"])
        for r in out.filter(F.col("user_id") == 7).collect()
    ]
    assert len(closed) == 1, closed
    n, start, end = closed[0]
    assert n == 4  # 10:00, 10:03 (late), 10:08, 10:15 — one session
    # tz-independent: the session spans exactly 10:00 -> 10:15
    assert end - start == 15 * 60
