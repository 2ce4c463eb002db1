"""Stream-stream interval join (streaming/attribution.py): the
watermarked click→purchase join must emit exactly the batch pair set
across micro-batches and a checkpoint restart."""

from __future__ import annotations

import datetime
import os

from pyspark.sql import functions as F

from nlp4l_spark.streaming.attribution import attribution_join

SCHEMA = "user_id long, event_id long, event_type string, ts timestamp"
T0 = datetime.datetime(2024, 1, 1)


def _ev(uid, eid, typ, offset_s):
    return (uid, eid, typ, T0 + datetime.timedelta(seconds=offset_s))


ROWS_B0 = [
    _ev(1, 10, "click", 0),
    _ev(1, 11, "purchase", 600),        # within 1h of click 10
    _ev(1, 12, "purchase", 3600),       # exactly at the bound: kept
    _ev(2, 20, "click", 0),
    _ev(2, 21, "purchase", 4000),       # outside the window
    _ev(3, 30, "purchase", 100),        # purchase with no prior click
]
ROWS_B1 = [
    _ev(2, 22, "click", 3900),
    _ev(2, 23, "purchase", 4100),       # matches click 22 (delay 200)
    _ev(1, 13, "purchase", 3601),       # 1s past click 10's window
]


def _write(spark, path, rows, part):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(os.path.join(path, part))


def _run(spark, in_dir, chk, out_dir):
    s = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = (
        attribution_join(
            s.filter(F.col("event_type") == "click"),
            s.filter(F.col("event_type") == "purchase"),
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user_id"], r["click_id"], r["conv_id"], r["delay_s"])
        for r in spark.read.parquet(out_dir).collect()
    }


def _batch(spark, in_dir):
    df = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    return {
        (r["user_id"], r["click_id"], r["conv_id"], r["delay_s"])
        for r in attribution_join(
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        ).collect()
    }


def test_stream_join_equals_batch_and_restarts(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _write(spark, in_dir, ROWS_B0, "b0")
    got = _run(spark, in_dir, str(tmp_path / "chk"), str(tmp_path / "out"))
    assert got == _batch(spark, in_dir)
    assert (1, 10, 12, 3600) in got          # inclusive upper bound
    assert not any(c == 21 for _, _, c, _ in got)  # outside window

    # restart from the checkpoint: cross-micro-batch pair (click in b1,
    # purchase in b1 near b0's watermark) and no duplicates of b0 pairs
    _write(spark, in_dir, ROWS_B1, "b1")
    got2 = _run(spark, in_dir, str(tmp_path / "chk"), str(tmp_path / "out"))
    assert got2 == _batch(spark, in_dir)
    assert (2, 22, 23, 200) in got2
    assert not any(c == 13 for _, _, c, _ in got2)  # 1s past the bound


def test_state_eviction_is_watermark_bounded(spark):
    """The join's state requirement is (watermark + window)-bounded: the
    plan carries event-time watermarks on both sides (no unbounded
    buffering)."""
    import tempfile

    d = tempfile.mkdtemp()
    spark.createDataFrame([], SCHEMA).write.mode("overwrite").parquet(d)
    st = spark.readStream.schema(SCHEMA).parquet(d)
    j = attribution_join(
        st.filter(F.col("event_type") == "click"),
        st.filter(F.col("event_type") == "purchase"),
    )
    plan = j._jdf.queryExecution().logical().toString()
    assert plan.count("EventTimeWatermark") == 2, plan


# ---------------- left-outer (unmatched clicks, session 13) ---------------- #
from nlp4l_spark.streaming.attribution import attribution_unmatched


def _run_unmatched(spark, in_dir, chk, out_dir):
    s = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = (
        attribution_unmatched(
            s.filter(F.col("event_type") == "click"),
            s.filter(F.col("event_type") == "purchase"),
            watermark="10 minutes",
        )
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {
        (r["user_id"], r["click_id"])
        for r in spark.read.parquet(out_dir).collect()
    }


def test_stream_outer_join_emits_on_state_expiry(spark, tmp_path):
    """Unmatched clicks emit ONLY once the watermark proves no future
    purchase can match; matched clicks never emit; the held-back tail
    (the sentinel itself) stays in state — the streaming outer-join
    contract. The emitted set equals the batch anti-join RESTRICTED to
    expired clicks."""
    rows_b0 = [
        _ev(1, 10, "click", 0),
        _ev(1, 11, "purchase", 600),   # click 10 converts -> never emits
        _ev(2, 20, "click", 0),        # no purchase -> should emit on expiry
        _ev(3, 30, "purchase", 100),   # purchase-only user
    ]
    # sentinels must advance BOTH sides: the global watermark is the MIN
    # over the two EventTimeWatermark nodes (multipleWatermarkPolicy=min),
    # so a click-only sentinel leaves the purchase watermark — and hence
    # eviction — frozen
    rows_b1 = [
        _ev(9, 90, "click", 20000),
        _ev(7, 70, "purchase", 20000),
    ]
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    _write(spark, in_dir, rows_b0, "b0")
    got0 = _run_unmatched(
        spark, in_dir, str(tmp_path / "chk"), str(tmp_path / "out")
    )
    # watermark after b0 = 600s - 10min <= 0: nothing can have expired
    assert got0 == set()

    _write(spark, in_dir, rows_b1, "b1")
    got1 = _run_unmatched(
        spark, in_dir, str(tmp_path / "chk"), str(tmp_path / "out")
    )
    # the b1 data advances BOTH watermarks to 20000-600=19400, past
    # click 20's expiry (0+3600): availableNow's trailing micro-batch
    # evicts it and emits the NULL-padded row. Click 10 converted so it
    # never emits; sentinel click 90's own expiry (23600) not reached.
    assert got1 == {(2, 20)}

    # batch twin on the same files = all unmatched regardless of expiry
    df = spark.read.option("recursiveFileLookup", "true").parquet(in_dir)
    batch = {
        (r["user_id"], r["click_id"])
        for r in attribution_unmatched(
            df.filter(F.col("event_type") == "click"),
            df.filter(F.col("event_type") == "purchase"),
        ).collect()
    }
    assert batch == {(2, 20), (9, 90)}
    assert got1 == {x for x in batch if x[0] == 2}  # expired subset only
