"""Property test: the four analyzer engines (driver Python, Spark SQL
expression, Arrow pandas UDF, DuckDB SQL oracle) tokenize IDENTICALLY on
seeded random inputs spanning the contract alphabet — ASCII letters/digits,
whitespace (incl. U+3000), punctuation, case mixing, empty strings. The
DuckDB engine is what the external correctness gate uses, so 4-way
agreement is what makes every oracle comparison meaningful.

(Reference analogue: the analyzer contract is pinned by golden tests, and
SchemaLoaderSuite exercises analyzer construction; this adds the
cross-engine identity the reference never needed — it had ONE Lucene.)"""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from pyspark.sql import functions as F

from nlp4l_spark.analysis import STANDARD_ANALYZER, WHITESPACE_ANALYZER

ALPHABET = list(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    "  \t\n　.,;:!?'\"()[]{}-_/\\@#$%&*+=<>|~^"
)


def _random_texts(n: int, seed: int) -> list[str]:
    rng = np.random.RandomState(seed)
    out = []
    for _ in range(n):
        length = int(rng.randint(0, 80))
        out.append("".join(rng.choice(ALPHABET, size=length)))
    out += ["", "   ", "the the THE", "a1b2c3", "ALLCAPS lower 123"]
    return out


@pytest.mark.parametrize("analyzer", [STANDARD_ANALYZER, WHITESPACE_ANALYZER])
def test_four_engines_agree(spark, analyzer):
    texts = _random_texts(300, seed=1234)
    expected = [analyzer.tokenize(t) for t in texts]

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    # engine 2: Spark SQL expression (JVM)
    sql_rows = df.select("i", analyzer.tokens_expr("text").alias("tk")).collect()
    got_sql = [r["tk"] for r in sorted(sql_rows, key=lambda r: r["i"])]
    assert got_sql == expected

    # engine 3: Arrow pandas UDF
    udf_rows = df.select("i", analyzer.tokenize_udf()(F.col("text")).alias("tk")).collect()
    got_udf = [r["tk"] for r in sorted(udf_rows, key=lambda r: r["i"])]
    assert got_udf == expected

    # engine 4: DuckDB SQL (the oracle's tokenizer)
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", list(enumerate(texts)))
    got_ddb = [
        r[0] if r[0] is not None else []
        for r in con.execute(
            f"SELECT {analyzer.duckdb_tokens_sql('text')} FROM t ORDER BY i"
        ).fetchall()
    ]
    assert got_ddb == expected


def test_term_counts_udf_agrees_with_tokenize(spark):
    texts = _random_texts(150, seed=77)
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, text string"
    )
    tc = STANDARD_ANALYZER.term_counts_udf()
    rows = df.select("i", tc(F.col("text")).alias("c")).collect()
    for r in sorted(rows, key=lambda r: r["i"]):
        toks = STANDARD_ANALYZER.tokenize(texts[r["i"]])
        counts = {}
        for t in toks:
            counts[t] = counts.get(t, 0) + 1
        got = dict(zip(r["c"]["terms"], r["c"]["tfs"]))
        assert got == counts
        assert r["c"]["dl"] == len(toks)
