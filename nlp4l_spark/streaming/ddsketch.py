"""Streaming quantiles: DDSketch bucket counts as stream state.

Batch ``ops/sketches.dd_sketch`` / ``dd_quantiles`` (oracled via the
``dds_percentiles`` registry twin) answers "what is p50/p90/p99" in one
pass; an ingest pipeline wants the running percentile as data ARRIVES.
Bucket counts merge by ADDITION, so the streaming fold is lossless:
after any partitioning of the stream into micro-batches the state
equals the one-pass batch sketch bucket-for-bucket (tested, including a
query restart from the checkpoint), and therefore every quantile
estimate matches the batch sketch exactly.

Distribution shape: the bucket index ceil(ln(v)/ln(gamma)) is computed
JVM-side on the micro-batch with the SAME expression as the batch
sketch (``ops/sketches.dd_bucket_expr``); the stateful fold only adds
per-bucket counts, so state is one (bucket, cnt) pair per OCCUPIED
bucket per group — bounded by log(value range)/alpha, independent of
stream length (the property that makes streaming percentiles possible
at all; exact streaming quantiles need the whole history). The
reference has no streaming (SURVEY.md §2.9); this extends the sketches
family the same way streaming/hll.py extends cardinality.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nlp4l_spark.ops.sketches import DD_ALPHA, dd_bucket_expr, dd_gamma

OUT_SCHEMA = (
    "grp string, n long, p50 double, p90 double, p99 double, ver long"
)
STATE_SCHEMA = "buckets array<long>, cnts array<long>, ver long"
_QS = (0.5, 0.9, 0.99)


def _make_fn(alpha: float, scale: float):
    gamma = dd_gamma(alpha)
    lg = math.log(gamma)

    def _estimate(buckets: np.ndarray, cnts: np.ndarray, q: float) -> float:
        order = np.argsort(buckets)
        b, c = buckets[order], cnts[order]
        cum = np.cumsum(c)
        n = int(cum[-1])
        rank = math.ceil(q * n)
        i = int(np.searchsorted(cum, rank))
        est = 2.0 * math.exp(float(b[i]) * lg) / (gamma + 1.0) / scale
        return round(est, 6)

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            bl, cl, ver = state.get
            acc = dict(zip(bl, cl))
        else:
            acc, ver = {}, 0
        for pdf in pdfs:
            if pdf.empty:
                continue
            gb = pdf.groupby("bucket")["bucket"].count()
            for b, c in gb.items():
                acc[int(b)] = acc.get(int(b), 0) + int(c)
        ver += 1
        state.update(
            (list(acc.keys()), [int(v) for v in acc.values()], ver)
        )
        buckets = np.fromiter(acc.keys(), dtype=np.int64)
        cnts = np.fromiter(acc.values(), dtype=np.int64)
        row = {
            "grp": key[0],
            "n": int(cnts.sum()),
            "ver": ver,
        }
        for q, name in zip(_QS, ("p50", "p90", "p99")):
            row[name] = _estimate(buckets, cnts, q)
        yield pd.DataFrame([row])

    return fn


def streaming_ddsketch(
    stream: DataFrame,
    value_col,
    group_col: str,
    alpha: float = DD_ALPHA,
    scale: float = 1.0,
) -> DataFrame:
    """Per-group running p50/p90/p99 over an unbounded stream of
    POSITIVE values. Each micro-batch emits every touched group's
    current snapshot tagged with a ``ver`` counter; the live view is
    the max-``ver`` row per group (``current_quantiles``)."""
    prepared = stream.select(
        F.col(group_col).cast("string").alias("grp"),
        dd_bucket_expr(value_col, alpha).alias("bucket"),
    )
    return prepared.groupBy("grp").applyInPandasWithState(
        _make_fn(alpha, float(scale)),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def current_quantiles(out: DataFrame) -> DataFrame:
    """Max-ver snapshot per group from the appended output table."""
    latest = out.groupBy("grp").agg(F.max("ver").alias("ver"))
    return out.join(latest, ["grp", "ver"]).select(
        "grp", "n", "p50", "p90", "p99"
    )
