"""Incremental append + Structured Streaming ingestion."""

from __future__ import annotations

import time

import pytest

from nlp4l_spark.data import LONDON_BRIDGE_VERSES
from nlp4l_spark.data.fixtures import TRANSCRIPTS_SCHEMA_DDL, transcripts_df
from nlp4l_spark.index import build_index
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.oracle import OracleIndex
from nlp4l_spark.search import Searcher
from nlp4l_spark.streaming import append_to_index, stream_into_index


def test_append_matches_full_build(spark, tmp_path):
    first, rest = LONDON_BRIDGE_VERSES[:6], LONDON_BRIDGE_VERSES[6:]
    path = str(tmp_path / "idx_incr")
    build_index(transcripts_df(spark, verses=first), path)
    append_to_index(
        transcripts_df(spark, verses=rest, conv_id="conv-00000001"), path
    )
    oracle = OracleIndex.build(list(enumerate(LONDON_BRIDGE_VERSES)))
    cat = IndexCatalog(path)
    fs = cat.read(spark, "field_stats").collect()[0]
    assert fs["num_docs"] == 11
    assert fs["sum_dl"] == oracle.sum_dl
    assert fs["uniq_terms"] == oracle.uniq_terms()
    s = Searcher(spark, path)
    for q in ["build", "silver gold", "wood clay needles pins"]:
        got = [(r["doc_id"], round(r["score"], 9)) for r in s.search(q, 10).collect()]
        exp = [(d, round(sc, 9)) for d, sc in oracle.search(q, 10)]
        assert got == exp, q


def test_stream_into_index(spark, tmp_path):
    first, rest = LONDON_BRIDGE_VERSES[:6], LONDON_BRIDGE_VERSES[6:]
    path = str(tmp_path / "idx_stream")
    build_index(transcripts_df(spark, verses=first), path)
    landing = str(tmp_path / "landing")
    transcripts_df(spark, verses=rest, conv_id="conv-00000001").write.parquet(landing)
    stream = spark.readStream.schema(TRANSCRIPTS_SCHEMA_DDL).parquet(landing)
    q = stream_into_index(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    fs = IndexCatalog(path).read(spark, "field_stats").collect()[0]
    oracle = OracleIndex.build(list(enumerate(LONDON_BRIDGE_VERSES)))
    assert fs["num_docs"] == 11
    assert fs["sum_dl"] == oracle.sum_dl
