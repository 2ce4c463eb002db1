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


# ---------------- Porter stemming ---------------------------------------- #
def test_porter_stem_canonical_outputs():
    from nlp4l_spark.analysis.stem import porter_stem

    # full-pipeline outputs from Porter's published voc/output list
    golden = {
        "caresses": "caress", "flies": "fli", "dies": "di", "mules": "mule",
        "denied": "deni", "died": "di", "agreed": "agre", "owned": "own",
        "humbled": "humbl", "sized": "size", "meetings": "meet",
        "stating": "state", "siezing": "siez", "itemization": "item",
        "sensational": "sensat", "traditional": "tradit",
        "reference": "refer", "colonizer": "colon", "plotted": "plot",
        "conditional": "condit", "rational": "ration",
        "electrical": "electr", "hopefulness": "hope",
        "relational": "relat", "operator": "oper", "feudalism": "feudal",
        "happy": "happi", "sky": "sky", "cats": "cat", "roll": "roll",
        "controlling": "control", "generalization": "gener",
        "oscillators": "oscil",
    }
    for w, want in golden.items():
        assert porter_stem(w) == want, w
    # short words untouched
    assert porter_stem("is") == "is" and porter_stem("by") == "by"


def test_porter_analyzer_index_roundtrip(spark, tmp_path):
    from pyspark.sql import functions as F

    from nlp4l_spark.analysis.stem import PorterAnalyzer
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.search import Searcher

    az = PorterAnalyzer(stopwords=frozenset({"the"}))
    docs = [
        (0, "the runner was running races"),
        (1, "he runs a race"),
        (2, "nothing related here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "stemidx")
    IndexBuilder(analyzer=az, sort_cols=("conv_id", "turn_idx")).build(df, d)
    s = Searcher(spark, d, analyzer=az)
    # 'running' and 'runs' both stem to 'run' -> cross-form recall
    got = {r["doc_id"] for r in s.search("running", k=10).collect()}
    assert got == {0, 1}
    got2 = {r["doc_id"] for r in s.search("races", k=10).collect()}
    assert got2 == {0, 1}  # races/race -> race
    # the SQL engine is deliberately absent
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        az.tokens_expr("text")
