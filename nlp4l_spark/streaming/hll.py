"""Streaming distinct-count: HyperLogLog registers as stream state.

Batch ``ops/sketches.hll_estimate`` (oracled) answers "how many distinct
keys" with one pass; an ingest pipeline wants the running estimate as
data ARRIVES. Registers merge by max, so the streaming fold is lossless:
after any partitioning of the stream into micro-batches the state equals
the one-pass batch registers bit-for-bit (tested, including a query
restart from the checkpoint).

Distribution shape: the hash/bucket/rank math runs JVM-side on the
micro-batch (the SAME expressions as the batch sketch — ops/sketches
``hll_registers``); the stateful fold only takes per-bucket maxima, so
state is exactly 2^p ints per group — independent of stream length, the
defining property that makes distinct-count streamable at all (exact
streaming distinct needs unbounded state). The reference has no
streaming (SURVEY.md §2.9); this extends the sketches family the same
way streaming/heavyhitters.py extends wordcounts.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "grp string, registers_used long, hll_est double, ver long"
STATE_SCHEMA = "regs array<int>, ver long"


def _make_fn(p: int):
    m = 1 << p
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            regs_list, ver = state.get
            regs = np.asarray(regs_list, dtype=np.int64)
        else:
            regs, ver = np.zeros(m, dtype=np.int64), 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            gb = pdf.groupby("bucket")["rank"].max()
            idx = gb.index.to_numpy(dtype=np.int64)
            regs[idx] = np.maximum(regs[idx], gb.to_numpy(dtype=np.int64))
        ver += 1
        state.update(([int(x) for x in regs], ver))
        used = int((regs > 0).sum())
        v = m - used
        z = float(np.power(2.0, -regs[regs > 0].astype(np.float64)).sum()) + v
        e_raw = alpha_m2 / z
        est = m * math.log(m / v) if (e_raw <= 2.5 * m and v > 0) else e_raw
        yield pd.DataFrame(
            [
                {
                    "grp": key[0],
                    "registers_used": used,
                    "hll_est": round(est, 4),
                    "ver": ver,
                }
            ]
        )

    return fn


def streaming_hll(
    stream: DataFrame, key_col, group_col: str, p: int = 8
) -> DataFrame:
    """Per-group running HLL estimates over an unbounded stream. Each
    micro-batch emits every touched group's current snapshot tagged
    with a ``ver`` counter; the live view is the max-``ver`` row per
    group (``current_estimate``)."""
    from nlp4l_spark.ops.sketches import _hash32

    if p < 7:
        raise ValueError("p >= 7 required (alpha constant assumes m >= 128)")
    wmax = 1 << (32 - p)
    maxrank = 33 - p
    h = _hash32(key_col)
    w = h % wmax
    rank = F.when(w == 0, maxrank).otherwise(
        F.lit(maxrank) - F.length(F.bin(w))
    )
    prepared = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        F.floor(h / wmax).cast("int").alias("bucket"),
        rank.cast("int").alias("rank"),
    )
    return prepared.groupBy("grp").applyInPandasWithState(
        _make_fn(p),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def current_estimate(out: DataFrame) -> DataFrame:
    """Max-ver snapshot per group from the appended output table."""
    latest = out.groupBy("grp").agg(F.max("ver").alias("ver"))
    return out.join(latest, ["grp", "ver"]).select(
        "grp", "registers_used", "hll_est"
    )
