"""Driver-contract query registry: every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions) as a
(spark, sf_dir) -> DataFrame callable with a matching DuckDB oracle SQL.

Parity rules (driver compares row-count + schema + order-insensitive
value-hash):
* every computed column is aliased identically on both sides,
* floats are rounded to 6 decimals on both sides,
* counts are bigint on both sides,
* tokenization is the SAME analyzer contract rendered for each engine
  (Analyzer.tokens_expr for Spark, Analyzer.duckdb_tokens_sql for DuckDB).
"""

from __future__ import annotations

import math
import os
import tempfile

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from nlp4l_spark.analysis import (
    LUCENE_ENGLISH_STOPWORDS,
    STANDARD_ANALYZER,
    WHITESPACE_ANALYZER,
    Analyzer,
)
from nlp4l_spark.ops import (
    bpe,
    dedup,
    multimodal,
    processors,
    similarity,
    sketches,
    textqc,
)
from nlp4l_spark.stats import Corpus, concordance, keyness, moments, tfidf, wordcounts

TOK_SQL = STANDARD_ANALYZER.duckdb_tokens_sql("text")
WS_SQL = WHITESPACE_ANALYZER.duckdb_tokens_sql("text")
TOKS_CTE = f"toks AS (SELECT doc_id, unnest({TOK_SQL}) AS term FROM documents)"

BM25_QUERY = "join merge vector"
BM25_TERMS = ["join", "merge", "vector"]
BM25_K = 10
TFIDF_FEATURES = ["join", "hash", "scan", "spark", "window"]
CHI2_TERMS = ["join", "hash", "scan", "slow"]

SOLR_LOG_LINES = [
    "2017-01-04 08:18:34.327 INFO  (qtp110456297-15) [   x:collection1] "
    "o.a.s.c.S.Request [collection1]  webapp=/solr path=/select "
    "params={q=apple&fq=type:fruit&facet.field=category&rows=10} hits=42 status=0 QTime=3",
    "2017-01-04 08:19:01.001 INFO  (qtp110456297-16) [   x:collection1] "
    "o.a.s.c.S.Request [collection1]  webapp=/solr path=/select "
    "params={q=banana+split&facet.query=price:[0+TO+100]} hits=7 status=0 QTime=12",
    "2017-01-04 08:20:15.900 INFO  (qtp110456297-17) [   x:collection1] "
    "o.a.s.c.S.Request [collection1]  webapp=/solr path=/select "
    "params={q=*:*} hits=1000 status=0 QTime=1",
]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _corpus(spark: SparkSession, sf_dir: str) -> Corpus:
    return Corpus(_docs(spark, sf_dir), "text", "doc_id")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet"))


def _embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def _lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))


# --------------------------------------------------------------------- #
# WordCounts / RawReader stats surface (SURVEY §2.5)
# --------------------------------------------------------------------- #
def q_wordcount_cf(spark, sf_dir):
    return wordcounts.count_whole_index(_corpus(spark, sf_dir))


O_WORDCOUNT_CF = f"""
WITH {TOKS_CTE}
SELECT term, count(*)::bigint AS cf FROM toks GROUP BY term
"""


def q_wordcount_df(spark, sf_dir):
    return wordcounts.count_df(_corpus(spark, sf_dir))


O_WORDCOUNT_DF = f"""
WITH {TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::bigint AS df FROM toks GROUP BY term
"""


def q_top_terms_df(spark, sf_dir):
    return wordcounts.top_terms_by_doc_freq(_corpus(spark, sf_dir), 20)


O_TOP_TERMS_DF = f"""
WITH {TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::bigint AS df FROM toks GROUP BY term
ORDER BY df DESC, term ASC LIMIT 20
"""


def q_top_terms_cf(spark, sf_dir):
    return wordcounts.top_terms_by_total_term_freq(_corpus(spark, sf_dir), 20)


O_TOP_TERMS_CF = f"""
WITH {TOKS_CTE}
SELECT term, count(*)::bigint AS cf FROM toks GROUP BY term
ORDER BY cf DESC, term ASC LIMIT 20
"""


def q_count_prefix(spark, sf_dir):
    return wordcounts.count_prefix(_corpus(spark, sf_dir), "s")


O_COUNT_PREFIX = f"""
WITH {TOKS_CTE}
SELECT count(DISTINCT term)::bigint AS cnt FROM toks WHERE term LIKE 's%'
"""


def q_total_count(spark, sf_dir):
    return wordcounts.total_count(_corpus(spark, sf_dir))


O_TOTAL_COUNT = f"""
WITH {TOKS_CTE}
SELECT count(*)::bigint AS total FROM toks
"""


def q_doc_lens(spark, sf_dir):
    return (
        _corpus(spark, sf_dir)
        .doc_lens()
        .select("doc_id", F.col("dl").cast("long").alias("dl"))
    )


O_DOC_LENS = f"""
WITH {TOKS_CTE},
cnt AS (SELECT doc_id, count(*)::bigint AS dl FROM toks GROUP BY doc_id)
SELECT d.doc_id, coalesce(cnt.dl, 0)::bigint AS dl
FROM documents d LEFT JOIN cnt USING (doc_id)
"""


def q_field_stats(spark, sf_dir):
    fs = wordcounts.field_stats(_corpus(spark, sf_dir))
    return fs.select(
        "field", "num_docs", "sum_dl", F.round("avgdl", 6).alias("avgdl"), "uniq_terms"
    )


O_FIELD_STATS = f"""
WITH {TOKS_CTE}
SELECT 'text' AS field,
       (SELECT count(*) FROM documents)::bigint AS num_docs,
       (SELECT count(*) FROM toks)::bigint AS sum_dl,
       round((SELECT count(*) FROM toks)::double /
             (SELECT count(*) FROM documents), 6) AS avgdl,
       (SELECT count(DISTINCT term) FROM toks)::bigint AS uniq_terms
"""


def q_count_docset(spark, sf_dir):
    return wordcounts.count_docset(_corpus(spark, sf_dir), [0, 1, 2])


O_COUNT_DOCSET = f"""
WITH {TOKS_CTE}
SELECT term, count(*)::bigint AS cnt FROM toks
WHERE doc_id IN (0, 1, 2) GROUP BY term
"""


# --------------------------------------------------------------------- #
