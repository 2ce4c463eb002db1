"""Analyzer contract tests: golden TF values from the reference suite and
engine-equivalence (python == Spark SQL == Arrow UDF == DuckDB SQL)."""

from __future__ import annotations

from collections import Counter

import duckdb
import pytest

from pyspark.sql import functions as F

from nlp4l_spark.analysis import STANDARD_ANALYZER, WHITESPACE_ANALYZER
from nlp4l_spark.data import LONDON_BRIDGE_VERSES


def test_golden_tf_vector_doc0():
    # /root/reference/test/org/nlp4l/lucene/stats/TFIDFSuite.scala:74-80
    toks = STANDARD_ANALYZER.tokenize(LONDON_BRIDGE_VERSES[0])
    assert Counter(toks) == {
        "bridge": 2, "down": 4, "fair": 1, "falling": 4,
        "lady": 1, "london": 2, "my": 1,
    }


def test_stopwords_removed_position_holders_not_counted():
    toks = STANDARD_ANALYZER.tokenize(LONDON_BRIDGE_VERSES[2])
    # "build" appears 4x in verse 2; stopwords (is/it/will) are gone
    assert Counter(toks)["build"] == 4
    assert "will" not in toks and "it" not in toks


def test_ideographic_space_splits():
    assert STANDARD_ANALYZER.tokenize("wood　clay") == ["wood", "clay"]


def test_empty_and_none():
    assert STANDARD_ANALYZER.tokenize(None) == []
    assert STANDARD_ANALYZER.tokenize("") == []
    assert STANDARD_ANALYZER.tokenize("the is of") == []  # stopwords-only


@pytest.mark.parametrize("analyzer", [STANDARD_ANALYZER, WHITESPACE_ANALYZER])
def test_engines_agree(spark, analyzer):
    texts = LONDON_BRIDGE_VERSES + ["", "THE QUICK brown-fox 42 jumps_over"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    # Spark SQL builtin engine
    sql_toks = [
        r["toks"]
        for r in df.select(analyzer.tokens_expr("text").alias("toks")).collect()
    ]
    # Arrow pandas-UDF engine
    udf_toks = [
        r["toks"] for r in df.select(analyzer.tokenize_udf()(F.col("text")).alias("toks")).collect()
    ]
    # plain python engine
    py_toks = [analyzer.tokenize(t) for t in texts]
    assert sql_toks == py_toks
    assert udf_toks == py_toks


def test_duckdb_tokens_match_python():
    texts = LONDON_BRIDGE_VERSES + ["MiXeD CaSe 007　and\tthe end."]
    con = duckdb.connect()
    expr = STANDARD_ANALYZER.duckdb_tokens_sql("t")
    out = [
        row[0]
        for row in con.execute(
            f"select {expr} from (select unnest(?) as t)", [texts]
        ).fetchall()
    ]
    assert out == [STANDARD_ANALYZER.tokenize(t) for t in texts]


def test_term_counts_udf(spark):
    df = spark.createDataFrame([(t,) for t in LONDON_BRIDGE_VERSES], "text string")
    tc = STANDARD_ANALYZER.term_counts_udf()
    rows = df.select(tc(F.col("text")).alias("tc")).collect()
    for verse, row in zip(LONDON_BRIDGE_VERSES, rows):
        expected = Counter(STANDARD_ANALYZER.tokenize(verse))
        got = dict(zip(row["tc"]["terms"], row["tc"]["tfs"]))
        assert got == dict(expected)
        assert row["tc"]["dl"] == sum(expected.values())
