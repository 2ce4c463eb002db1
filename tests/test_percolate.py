"""Percolation (ops/percolate.py): reverse search of docs against stored
conjunctive queries — subset semantics, analyzer application, empty-query
match-all, and the no-hit query."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.ops.percolate import percolate

DOCS = [
    (0, "Spark JOIN merge vector"),
    (1, "join and nothing else"),
    (2, "the scan hash vector pipeline"),
    (3, ""),
]
QUERIES = [
    (10, ["join"]),
    (11, ["join", "merge"]),
    (12, ["vector", "scan"]),
    (13, ["zzznope"]),
    (14, []),
]


@pytest.fixture(scope="module")
def hits(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        QUERIES, "query_id int, must_terms array<string>"
    )
    return {
        (r["doc_id"], r["query_id"])
        for r in percolate(docs, qs).collect()
    }


def test_subset_semantics(spark, hits):
    # doc 0 tokens (lowercased): spark join merge vector
    assert (0, 10) in hits and (0, 11) in hits
    assert (0, 12) not in hits  # has vector but not scan
    # doc 1 matches the single-term join query only ("and" is a stopword)
    assert (1, 10) in hits and (1, 11) not in hits
    # doc 2 matches the vector+scan conjunction
    assert (2, 12) in hits and (2, 10) not in hits


def test_no_hit_query(spark, hits):
    assert not any(q == 13 for _, q in hits)


def test_empty_query_matches_every_doc(spark, hits):
    assert {d for d, q in hits if q == 14} == {0, 1, 2, 3}


def test_empty_doc_matches_only_match_all(spark, hits):
    assert {q for d, q in hits if d == 3} == {14}


def test_streaming_percolation(spark, tmp_path):
    """Percolation over a Structured Streaming doc source — the alerting
    deployment shape: file-stream docs matched against the broadcast
    query registry, hits landing in a sink, end state identical to the
    batch run on the same rows."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        QUERIES, "query_id int, must_terms array<string>"
    )
    landing = str(tmp_path / "docs_landing")
    docs.write.parquet(landing)
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        landing
    )
    alerts = percolate(stream, qs)
    q = (
        alerts.writeStream.format("memory")
        .queryName("percolate_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["doc_id"], r["query_id"])
        for r in spark.sql("SELECT * FROM percolate_alerts").collect()
    }
    batch = {
        (r["doc_id"], r["query_id"]) for r in percolate(docs, qs).collect()
    }
    assert got == batch and got
