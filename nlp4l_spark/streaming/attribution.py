"""Stream-stream interval join: click→conversion attribution.

The one Structured Streaming join shape the rest of the streaming
family doesn't exercise: TWO unbounded streams joined on a key plus an
EVENT-TIME interval (purchase within ATTR_WINDOW_S of the same user's
click). Spark buffers each side in state and uses the watermark + time
bound to evict: a click older than (watermark − window) can never match
a future purchase, so state is bounded by window × arrival rate — the
property that makes stream-stream joins feasible at all (an unbounded
join would buffer both streams forever).

Batch twin: entry_queries.q_attribution_pairs (same predicate as a
self-join, DuckDB-oracled); tests/test_streaming_attribution.py asserts
the streaming join emits EXACTLY the batch pair set across
micro-batches and a checkpoint restart.

Reference parity: the reference's click-model chain
(ClickModelAnalyzer) consumes pre-joined impression/click logs; this is
the upstream join that produces them, expressed stream-natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

ATTR_WINDOW_S = 3600


def attribution_join(
    clicks: DataFrame,
    conversions: DataFrame,
    window_s: int = ATTR_WINDOW_S,
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, click_id, conv_id, delay_s) pairs where the conversion
    follows the same user's click by (0, window_s]. Both inputs must
    carry (user_id, event_id, ts); works on streaming AND batch frames
    (batch ignores the watermark) — the twin-path contract the tests
    exploit."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = conversions.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("p_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    return c.join(p, cond, "inner").select(
        F.col("c_user").alias("user_id"),
        "click_id",
        "conv_id",
        (
            F.col("p_ts").cast("timestamp").cast("long")
            - F.col("c_ts").cast("timestamp").cast("long")
        ).alias("delay_s"),
    )


def attribution_unmatched(
    clicks: DataFrame,
    conversions: DataFrame,
    window_s: int = ATTR_WINDOW_S,
    watermark: str = "2 hours",
) -> DataFrame:
    """LEFT-OUTER stream-stream interval join: clicks with NO conversion
    in (0, window_s] — (user_id, click_id, click_ts). The shape
    attribution_join doesn't exercise: Spark holds each click in state
    until the watermark proves no future purchase can match
    (click_ts + window + watermark delay), and only THEN emits the
    NULL-padded row — the state-expiry contract that makes streaming
    outer joins correct (an early emit would be retracted by a late
    purchase). Batch mode: same predicate, plain left-outer + IS NULL
    (≡ anti join). tests/test_streaming_attribution.py asserts the
    streaming output is exactly the batch set RESTRICTED to clicks whose
    expiry the final watermark passed — the held-back tail is the
    correctness property, not a loss."""
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    p = conversions.select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("conv_id"),
        F.col("ts").alias("p_ts"),
    )
    if c.isStreaming:
        c = c.withWatermark("c_ts", watermark)
        p = p.withWatermark("p_ts", watermark)
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (
            F.col("p_ts")
            <= F.col("c_ts") + F.expr(f"INTERVAL {window_s} SECONDS")
        )
    )
    if c.isStreaming:
        # streaming left-outer + NULL sentinel (anti join is not a
        # streaming-supported join type). Filter on p_user — a join-side
        # column that cannot be NULL on a matched row — rather than
        # conv_id, so a conversion that legitimately carries a NULL
        # event_id still counts as a match.
        j = c.join(p, cond, "left_outer").filter(F.col("p_user").isNull())
    else:
        # batch: a plain anti join states the intent with no sentinel
        j = c.join(p, cond, "left_anti")
    return j.select(
        F.col("c_user").alias("user_id"),
        "click_id",
        F.col("c_ts").alias("click_ts"),
    )
