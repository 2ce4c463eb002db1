"""Watermark + tumbling-window aggregation: windows finalize when the
watermark passes, and events arriving later than the watermark are
DROPPED — the core late-data contract."""

from __future__ import annotations

import os
from datetime import datetime

from nlp4l_spark.streaming.windows import windowed_event_counts

SCHEMA = "user_id long, ts timestamp"


def _write(spark, path, rows, part):
    rows = [(u, datetime.strptime(t, "%Y-%m-%d %H:%M:%S")) for u, t in rows]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, part))


def _run(spark, in_dir, chk, out_dir):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .option("maxFilesPerTrigger", "1")  # batches process in file order
        .parquet(in_dir)
    )
    q = (
        windowed_event_counts(
            stream, "10 minutes", "5 minutes", key_col=None
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_watermark_finalizes_windows_and_drops_late(spark, tmp_path):
    in_dir, chk, out = (
        str(tmp_path / "in"), str(tmp_path / "chk"), str(tmp_path / "o")
    )
    # batch 1: two events in [10:00, 10:10) and one at 10:30 that advances
    # the watermark to 10:25 -> the 10:00 window finalizes with n=2
    _write(spark, in_dir, [
        (1, "2026-01-01 10:01:00"),
        (2, "2026-01-01 10:04:00"),
        (1, "2026-01-01 10:30:00"),
    ], "a_b1")
    got = {
        (str(r["window_start"]), r["n_events"])
        for r in _run(spark, in_dir, chk, out).collect()
    }
    assert ("2026-01-01 10:01:00", 2) not in got  # sanity: window boundaries
    assert ("2026-01-01 10:00:00", 2) in got

    # batch 2: a LATE event for the already-finalized 10:00 window
    # (watermark is 10:25 > 10:10) must be dropped, not re-emitted;
    # an event at 10:50 advances the watermark past the 10:30 window
    _write(spark, in_dir, [
        (2, "2026-01-01 10:02:00"),   # late -> dropped
        (1, "2026-01-01 10:50:00"),
    ], "b_b2")
    got2 = {
        (str(r["window_start"]), r["n_events"])
        for r in _run(spark, in_dir, chk, out).collect()
    }
    # the 10:00 window is still n=2 (no duplicate/updated emission) and
    # the 10:30 window finalized with exactly its one on-time event
    assert ("2026-01-01 10:00:00", 2) in got2
    assert ("2026-01-01 10:30:00", 1) in got2
    assert not any(w == "2026-01-01 10:00:00" and n != 2 for w, n in got2)
