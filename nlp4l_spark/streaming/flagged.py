"""Streaming policy-term alerts: a custom stateful operator
(``applyInPandasWithState``) keyed by conv_id that raises ONE alert per
conversation when its cumulative count of flagged turns (one role's
turns containing >= 1 flagged term) crosses a threshold — flagged-turn
state survives micro-batch boundaries and query restarts via the
checkpointed state store.

The batch twin is ``ops/chatqc.flagged_turn_triage`` (filter
n_flagged >= threshold); in a stream the alert fires AT the crossing
turn, exactly once, which is what a moderation/triage pipeline wants —
no re-alerting as more flagged turns arrive.

The reference has no streaming (SURVEY.md §2.9); this is a
training-pipeline extension in the same family as the streaming dedup /
heavy-hitter / percolation twins. State per conversation is two ints,
so the store holds |active conversations| entries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nlp4l_spark.analysis import STANDARD_ANALYZER

OUT_SCHEMA = "conv_id long, n_flagged long, alert_turn_idx int"
STATE_SCHEMA = "n long, alerted int"


def streaming_flag_alerts(
    turns: DataFrame,
    terms: list[str],
    threshold: int = 2,
    role: str = "assistant",
    analyzer=None,
) -> DataFrame:
    """streaming turns -> one (conv_id, n_flagged, alert_turn_idx) row
    per conversation, emitted in the micro-batch where the cumulative
    flagged-turn count first reaches ``threshold``. Token-level term
    match under the analyzer contract, identical to the batch twin."""
    az = analyzer or STANDARD_ANALYZER
    tset = frozenset(terms)
    tokenize = az.tokenize

    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, alerted = state.get if state.exists else (0, 0)
        if alerted:
            return
        rows = []
        for pdf in pdfs:
            sub = pdf[pdf["role"] == role]
            for _, r in sub.sort_values("turn_idx").iterrows():
                txt = r["text"]
                if txt is not None and tset.intersection(tokenize(txt)):
                    rows.append(int(r["turn_idx"]))
        for idx in sorted(rows):
            n += 1
            if n >= threshold and not alerted:
                alerted = 1
                yield pd.DataFrame(
                    {
                        "conv_id": [int(key[0])],
                        "n_flagged": [n],
                        "alert_turn_idx": [idx],
                    }
                )
                break
        state.update((n, alerted))

    return (
        turns.groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            OUT_SCHEMA,
            STATE_SCHEMA,
            "append",
            GroupStateTimeout.NoTimeout,
        )
    )
