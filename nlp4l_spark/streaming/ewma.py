"""Streaming smoothed daily metrics: per-day exact sums as stream state.

Batch ``event_ewma`` / ``holt_forecast`` (both DuckDB-oracled) smooth
the daily value-sum histogram; an ingest pipeline wants the running
smoothed level as data ARRIVES. The recurrences are ORDER-SENSITIVE, so
a naive per-record fold would make the result depend on arrival order —
instead the stream state is the per-day EXACT CENT SUM map (additive,
hence lossless under any micro-batching: after every trigger the state
equals the batch day histogram cent-for-cent, tested including a
checkpoint restart), and each emission re-folds the smoothing IN DAY
ORDER over that bounded state. Arrival order, batch boundaries, and
restarts therefore cannot change a single output digit.

State shape: one (day, cents) pair per calendar day per group — bounded
by the retention window, independent of event count (the same
state-bounding argument as streaming/hll.py and streaming/ddsketch.py).
The smoothing fold is O(days) per emission, trivially amortized. The
reference has no streaming (SURVEY.md §2.9); this extends the
time-series family the way streaming/ddsketch extends quantiles.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "grp string, n_days long, last_day long, last_raw double, "
    "ewma double, holt_level double, holt_trend double, ver long"
)
STATE_SCHEMA = "days array<long>, cents array<long>, ver long"


def _smooth(day_cents: dict[int, int], alpha: float, beta: float):
    """EWMA + Holt folds in day order over exact cent sums — the same
    recurrences as the batch twins (event_ewma, holt_forecast)."""
    ew = lv = tr = None
    for d in sorted(day_cents):
        x = float(day_cents[d])
        ew = x if ew is None else alpha * x + (1 - alpha) * ew
        if lv is None:
            lv, tr = x, 0.0
        else:
            nl = alpha * x + (1 - alpha) * (lv + tr)
            tr = beta * (nl - lv) + (1 - beta) * tr
            lv = nl
    return ew, lv, tr


def _make_fn(alpha: float, beta: float):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            days, cents, ver = state.get
            day_cents = dict(zip(days, cents))
        else:
            day_cents, ver = {}, 0
        for pdf in pdfs:
            agg = pdf.groupby("day")["cents"].sum()
            for d, c in agg.items():
                day_cents[int(d)] = day_cents.get(int(d), 0) + int(c)
        ver += 1
        items = sorted(day_cents.items())
        state.update(
            ([d for d, _ in items], [c for _, c in items], ver)
        )
        ew, lv, tr = _smooth(day_cents, alpha, beta)
        last_day = items[-1][0]
        yield pd.DataFrame(
            [
                {
                    "grp": key[0],
                    "n_days": len(items),
                    "last_day": last_day,
                    "last_raw": round(day_cents[last_day] / 100.0, 6),
                    "ewma": round(ew / 100.0, 6),
                    "holt_level": round(lv / 100.0, 6),
                    "holt_trend": round(tr / 100.0, 6),
                    "ver": ver,
                }
            ]
        )

    return fn


def streaming_daily_smooth(
    stream: DataFrame,
    day_col,
    cents_col,
    group_col: str,
    alpha: float = 0.5,
    beta: float = 0.5,
) -> DataFrame:
    """Stateful daily EWMA + Holt over a stream.

    ``stream`` is any streaming DataFrame; ``day_col``/``cents_col`` are
    Column expressions for the epoch-day bucket and the exact integer
    cents contribution; one output row per (group, trigger) carries the
    smoothed levels after folding that trigger's days into state.
    """
    src = stream.select(
        stream[group_col].alias("grp"),
        day_col.alias("day"),
        cents_col.alias("cents"),
    )
    return src.groupBy("grp").applyInPandasWithState(
        _make_fn(alpha, beta),
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def current_levels(out: DataFrame) -> DataFrame:
    """Latest emission per group (max ver) from the append-mode sink."""
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy("grp").orderBy(F.desc("ver"))
    return (
        out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
