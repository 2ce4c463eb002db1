"""Streaming exact deduplication: a custom stateful operator
(``applyInPandasWithState``) keyed by the normalized-text fingerprint —
only the FIRST document ever seen with a given fingerprint is emitted;
all later exact duplicates (same batch, later batches, or after a query
restart — state lives in the checkpoint) are dropped.

The batch twin is ``ops/dedup.exact_dedup`` (lowest-id winner per hash);
in a stream "first seen" replaces "lowest id": arrival order IS the
dedup priority, which is what an append-only ingest pipeline wants.
Within one micro-batch the lowest doc_id wins, matching the batch twin
on any single batch.

The reference has no streaming (SURVEY.md §2.9); this is the
training-pipeline extension the task brief names — dedup as data ARRIVES
instead of as a post-hoc corpus pass. State per key is one byte, so the
state store holds |distinct fingerprints| entries — the same cardinality
any exact dedup must track.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from nlp4l_spark.ops.dedup import _norm_text

OUT_SCHEMA = "doc_id long, text string"
STATE_SCHEMA = "seen int"


def _dedup_fn(
    key, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        return  # fingerprint already emitted in an earlier batch
    first = None
    for pdf in pdfs:
        if pdf.empty:
            continue
        cand = pdf.loc[pdf["doc_id"].idxmin()]
        if first is None or cand["doc_id"] < first["doc_id"]:
            first = cand
    if first is not None:
        state.update((1,))
        yield pd.DataFrame(
            {"doc_id": [int(first["doc_id"])], "text": [first["text"]]}
        )


def streaming_dedup_exact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """streaming docs -> first-seen docs only (doc_id, text).

    Fingerprint = xxhash64 of whitespace-normalized lowercased text,
    identical to the batch twin's ``exact_dedup`` hash."""
    keyed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).alias("text"),
        F.xxhash64(_norm_text(text_col)).alias("_fp"),
    )
    return keyed.groupBy("_fp").applyInPandasWithState(
        _dedup_fn,
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        GroupStateTimeout.NoTimeout,
    )
