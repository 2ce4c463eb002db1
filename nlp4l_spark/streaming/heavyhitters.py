"""Streaming heavy hitters: approximate top terms over an unbounded token
stream with BOUNDED state (Misra-Gries summaries, the mergeable batched
form of Agarwal et al. 2012).

Batch wordcounts (stats/wordcounts.py, oracled) need a full corpus pass;
an ingest pipeline wants "what are the hot terms so far" as data ARRIVES.
Misra-Gries keeps at most ``capacity`` (term, count) pairs and guarantees,
per group: true_count - err <= count <= true_count, with err bounded by
(tokens seen in group) / capacity — any term above that frequency is
guaranteed present.

Distribution shape: terms are hash-partitioned into ``num_groups`` state
groups (a term always lands in the same group, so cross-group merging is
a plain union — no double counting), each group holds ONE summary in the
state store: total state = num_groups x capacity pairs, independent of
stream length. Per micro-batch each group does one exact value_counts on
its slice + one summary merge. Query restarts resume from the
checkpointed summaries (tested).

Each batch emits the group's full current summary tagged with a ``ver``
counter; the live view is the max-``ver`` snapshot per group (helper
``current_summary``). The reference has no streaming (SURVEY.md §2.9) —
this is a training-pipeline extension like streaming/dedup.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "grp int, term string, count long, err long, n_tokens long, ver long"
)
STATE_SCHEMA = (
    "terms array<string>, counts array<long>, err long, n long, ver long"
)


def _mg_merge(summary: dict, batch: dict, capacity: int) -> tuple[dict, int]:
    """Merge exact batch counts into a Misra-Gries summary; returns the
    trimmed summary and the decrement applied (adds to the error bound)."""
    for t, c in batch.items():
        summary[t] = summary.get(t, 0) + int(c)
    if len(summary) <= capacity:
        return summary, 0
    # subtract the (capacity+1)-th largest count, drop the non-positive —
    # the standard mergeable-MG trim
    delta = sorted(summary.values(), reverse=True)[capacity]
    trimmed = {t: c - delta for t, c in summary.items() if c - delta > 0}
    return trimmed, delta


def _make_fn(capacity: int):
    def fn(
        key, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            terms, counts, err, n, ver = state.get
            summary = dict(zip(terms, (int(c) for c in counts)))
        else:
            summary, err, n, ver = {}, 0, 0, 0
        batch: dict[str, int] = {}
        for pdf in pdfs:
            if pdf.empty:
                continue
            vc = pdf["term"].value_counts()
            for t, c in vc.items():
                batch[t] = batch.get(t, 0) + int(c)
            n += int(len(pdf))
        summary, delta = _mg_merge(summary, batch, capacity)
        err += delta
        ver += 1
        state.update(
            (list(summary), [summary[t] for t in summary], int(err), int(n), int(ver))
        )
        items = sorted(summary.items(), key=lambda kv: (-kv[1], kv[0]))
        yield pd.DataFrame(
            {
                "grp": [int(key[0])] * len(items),
                "term": [t for t, _ in items],
                "count": [c for _, c in items],
                "err": [int(err)] * len(items),
                "n_tokens": [int(n)] * len(items),
                "ver": [int(ver)] * len(items),
            }
        )

    return fn


def streaming_heavy_hitters(
    docs: DataFrame,
    text_col: str = "text",
    *,
    capacity: int = 64,
    num_groups: int = 8,
    analyzer=None,
) -> DataFrame:
    """streaming docs -> per-group Misra-Gries summaries of the analyzed
    token stream. Tokenization is the same JVM expression the batch
    wordcount uses, so streaming and batch agree on the token contract."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    toks = (
        docs.select(F.explode(az.tokens_expr(text_col)).alias("term"))
        .withColumn("grp", F.pmod(F.xxhash64("term"), F.lit(num_groups)).cast("int"))
    )
    return toks.groupBy("grp").applyInPandasWithState(
        _make_fn(capacity),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )


def current_summary(snapshots: DataFrame) -> DataFrame:
    """Latest summary per group from the emitted snapshots (max ver)."""
    from pyspark.sql import Window

    w = Window.partitionBy("grp")
    return (
        snapshots.withColumn("_mx", F.max("ver").over(w))
        .filter(F.col("ver") == F.col("_mx"))
        .drop("_mx")
    )
