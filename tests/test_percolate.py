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


# --------------------------------------------------------------------- #
# Bool percolation: must / must_not / should + minimum_should_match
# --------------------------------------------------------------------- #
BOOL_QUERIES = [
    # (query_id, must, must_not, should, min_should)
    (20, ["join"], ["scan"], [], 0),
    (21, [], [], ["spark", "vector", "hash"], 2),
    (22, ["join"], [], ["merge", "vector"], 1),
    (23, [], ["join"], [], 0),          # match-all minus 'join' docs
    (24, [], [], ["zzznope"], 1),       # unsatisfiable should
]


@pytest.fixture(scope="module")
def bool_hits(spark):
    from nlp4l_spark.ops.percolate import percolate_bool

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(
        BOOL_QUERIES,
        "query_id int, must_terms array<string>, must_not_terms array<string>,"
        " should_terms array<string>, min_should int",
    )
    return {
        (r["doc_id"], r["query_id"])
        for r in percolate_bool(docs, qs).collect()
    }


def test_bool_must_and_must_not(bool_hits):
    # doc 0 (spark join merge vector): must join ok, no scan -> hit
    assert (0, 20) in bool_hits and (1, 20) in bool_hits
    # doc 2 has scan -> excluded even though it lacks join anyway
    assert (2, 20) not in bool_hits


def test_bool_minimum_should_match(bool_hits):
    # q21 needs >= 2 of {spark, vector, hash}
    assert (0, 21) in bool_hits      # spark + vector
    assert (2, 21) in bool_hits      # vector + hash
    assert (1, 21) not in bool_hits  # none


def test_bool_must_plus_should(bool_hits):
    # q22: must join AND >=1 of {merge, vector}
    assert (0, 22) in bool_hits
    assert (1, 22) not in bool_hits  # join but no should term


def test_bool_pure_must_not_is_match_all_minus(bool_hits):
    assert {d for d, q in bool_hits if q == 23} == {2, 3}


def test_bool_unsatisfiable_should(bool_hits):
    assert not any(q == 24 for _, q in bool_hits)
