"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch twin is ``ops/processors.sessionize`` (one window pass); this is
the streaming form for unbounded event/agent-transcript logs: per-user
session state (start, last_ts, n_events) lives in the state store, a
session CLOSES when a later event arrives past the gap, and closed
sessions are appended downstream. State survives restarts via the
checkpoint — a session spanning micro-batches (or a query restart) is
stitched together exactly (tested in tests/test_streaming_sessions.py).

Out-of-order delivery across micro-batches: a late event whose ts falls
at or before the open session's last ts merges into that session
(start = min, last = max — the session never rewinds); there is no
watermark, so an arbitrarily old event still merges rather than being
dropped. Within a batch, events are processed in ts order.

The reference has no streaming at all (SURVEY.md §2.9); this is the
training-pipeline extension the task brief names (custom stateful
operators via applyInPandasWithState).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start long, session_end long, n_events int"
)
STATE_SCHEMA = "start long, last long, n int"


def _session_fn(gap_seconds: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        secs: list[int] = []
        for pdf in pdfs:
            ts = pd.to_datetime(pdf["ts"])
            secs.extend((ts.astype("int64") // 1_000_000_000).tolist())
        closed = []
        for sec in sorted(secs):
            if last is None:
                start, last, n = sec, sec, 1
            elif sec - last > gap_seconds:
                closed.append((uid, start, last, n))
                start, last, n = sec, sec, 1
            else:
                # Late (out-of-order across micro-batches) events merge into
                # the open session without rewinding its end: last only ever
                # moves forward, start only backward.
                start, last, n = min(start, sec), max(last, sec), n + 1
        if last is not None:
            state.update((int(start), int(last), int(n)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events"],
            )

    return fn


def streaming_sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
) -> DataFrame:
    """events (streaming DataFrame with ``ts`` timestamp) -> appended
    CLOSED sessions (user_id, session_start/end epoch secs, n_events).
    The open tail session stays in state until a later event closes it."""
    return events.groupBy(user_col).applyInPandasWithState(
        _session_fn(gap_seconds),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
