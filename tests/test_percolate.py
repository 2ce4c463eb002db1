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
