"""Deterministic docID assignment: parallelism-independence is the property
the north_rule's two-cluster-size run depends on (SURVEY.md §7.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index.docids import assign_doc_ids


def _ids(spark, n_parts):
    df = synth_transcripts(spark, 3000, num_partitions=n_parts)
    out = assign_doc_ids(df, num_partitions=n_parts)
    rows = out.select("conv_id", "turn_idx", "doc_id").collect()
    return {(r["conv_id"], r["turn_idx"]): r["doc_id"] for r in rows}


def test_dense_and_order_preserving(spark):
    ids = _ids(spark, 4)
    assert sorted(ids.values()) == list(range(3000))
    by_key = sorted(ids.items())
    assert [v for _, v in by_key] == list(range(3000))


def test_parallelism_independent(spark):
    a = _ids(spark, 2)
    b = _ids(spark, 13)
    assert a == b


def test_synth_transcripts_deterministic_across_partitioning(spark):
    x = synth_transcripts(spark, 500, num_partitions=1).orderBy(
        "conv_id", "turn_idx"
    ).collect()
    y = synth_transcripts(spark, 500, num_partitions=7).orderBy(
        "conv_id", "turn_idx"
    ).collect()
    assert x == y
    # schema is exactly the input_hint shape
    df = synth_transcripts(spark, 10)
    assert [
        (f.name, f.dataType.simpleString()) for f in df.schema.fields
    ] == [
        ("conv_id", "string"),
        ("turn_idx", "int"),
        ("role", "string"),
        ("text", "string"),
        ("tool", "string"),
        ("ts", "timestamp"),
    ]
