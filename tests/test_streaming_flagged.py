"""Streaming policy-term alerts (streaming/flagged.py): exactly one
alert per conversation at the threshold-crossing turn, state persisting
across micro-batches AND query restarts, agreeing with the batch twin
(ops/chatqc.flagged_turn_triage filtered at the threshold)."""

from __future__ import annotations

import os

from nlp4l_spark.ops.chatqc import flagged_turn_triage
from nlp4l_spark.streaming.flagged import streaming_flag_alerts

SCHEMA = (
    "conv_id long, turn_idx int, role string, text string, tool string"
)
TERMS = ["badword", "alert"]


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
        streaming_flag_alerts(stream, TERMS, threshold=2)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out_dir)


def test_alert_fires_once_at_crossing_and_survives_restart(spark, tmp_path):
    in_dir, chk, out_dir = (str(tmp_path / d) for d in ("in", "chk", "out"))
    # batch 1: conv 0 crosses threshold=2 in-batch at turn 3; conv 1 has
    # one flagged turn (no alert yet); user turns never count
    _write_batch(spark, in_dir, [
        (0, 0, "user", "badword from the user does not count", None),
        (0, 1, "assistant", "badword one", None),
        (0, 2, "user", "ok", None),
        (0, 3, "assistant", "alert two", None),
        (1, 0, "user", "hi", None),
        (1, 1, "assistant", "badword only once", None),
    ], "b1")
    out1 = _run_available_now(spark, in_dir, chk, out_dir)
    got1 = {
        r["conv_id"]: (r["n_flagged"], r["alert_turn_idx"])
        for r in out1.collect()
    }
    assert got1 == {0: (2, 3)}

    # batch 2 (restart from the checkpoint): conv 1's second flagged
    # turn arrives -> alert with cross-batch count; conv 0 gets MORE
    # flagged turns but never re-alerts
    _write_batch(spark, in_dir, [
        (0, 4, "assistant", "badword three", None),
        (1, 2, "assistant", "alert crossing now", None),
    ], "b2")
    out2 = _run_available_now(spark, in_dir, chk, out_dir)
    got2 = {
        r["conv_id"]: (r["n_flagged"], r["alert_turn_idx"])
        for r in out2.collect()
    }
    assert got2 == {0: (2, 3), 1: (2, 2)}

    # batch-twin agreement on the full input: the alerted convs are
    # exactly those with n_flagged >= threshold
    full = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    twin = {
        r["conv_id"]: r["n_flagged"]
        for r in flagged_turn_triage(full, TERMS).collect()
        if r["n_flagged"] >= 2
    }
    assert set(twin) == set(got2)
