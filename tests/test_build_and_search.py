"""End-to-end index build + BM25 search vs the reference goldens and the
pure-Python oracle (SURVEY.md §5 strategy)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data import LONDON_BRIDGE_VERSES, TFIDF_SUITE_DOC_INDICES, transcripts_df
from nlp4l_spark.index import build_index, codec
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.oracle import OracleIndex
from nlp4l_spark.search import Searcher


@pytest.fixture(scope="module")
def index11(spark, tmp_path_factory):
    """11-doc London Bridge corpus index (RawReaderSpec corpus, no deletes)."""
    path = str(tmp_path_factory.mktemp("idx") / "lb11")
    df = transcripts_df(spark)
    build_index(df, path)
    return path


@pytest.fixture(scope="module")
def oracle11():
    return OracleIndex.build(list(enumerate(LONDON_BRIDGE_VERSES)))


def test_docid_order_and_text_roundtrip(spark, index11):
    """Per-row invariant (BASELINE.json:15): per-turn text equality under
    stable (conv_id, turn_idx) ordering."""
    stored = IndexCatalog(index11).read(spark, "stored")
    rows = stored.orderBy("doc_id").collect()
    assert [r["doc_id"] for r in rows] == list(range(len(LONDON_BRIDGE_VERSES)))
    assert [r["text"] for r in rows] == LONDON_BRIDGE_VERSES
    assert [r["turn_idx"] for r in rows] == list(range(len(LONDON_BRIDGE_VERSES)))


def test_term_stats_golden_build(spark, index11):
    """term 'build' over the full 11-doc corpus: df=5, cf=12 (the reference
    golden df=4/cf=10 at RawReaderSpec.scala:180-183 is AFTER deleting docs
    3 and 4 — verified against the oracle here, and the deleted-docs case in
    test_delete_semantics)."""
    ts = IndexCatalog(index11).read(spark, "term_stats")
    row = ts.filter(F.col("term") == "build").collect()[0]
    oracle = OracleIndex.build(list(enumerate(LONDON_BRIDGE_VERSES)))
    assert row["df"] == oracle.df("build") == 5
    assert row["cf"] == oracle.cf("build") == 12


def test_delete_semantics_golden(spark, tmp_path):
    """RawReaderSpec golden: after deleting docs id=3 and id=4, term 'build'
    has df=4, cf=10 (RawReaderSpec.scala:180-183). Deletion in our engine =
    filtering the corpus before build (immutable index rebuild)."""
    kept = [v for i, v in enumerate(LONDON_BRIDGE_VERSES) if i not in (3, 4)]
    spark_df = transcripts_df(spark, verses=kept)
    path = str(tmp_path / "lb9")
    build_index(spark_df, path)
    row = (
        IndexCatalog(path)
        .read(spark, "term_stats")
        .filter(F.col("term") == "build")
        .collect()[0]
    )
    assert row["df"] == 4
    assert row["cf"] == 10


def test_field_stats_match_oracle(spark, index11, oracle11):
    fs = IndexCatalog(index11).read(spark, "field_stats").collect()[0]
    assert fs["num_docs"] == oracle11.num_docs == 11
    assert fs["sum_dl"] == oracle11.sum_dl
    assert fs["avgdl"] == pytest.approx(oracle11.avgdl)
    assert fs["uniq_terms"] == oracle11.uniq_terms()


def test_doc_lens_match_oracle(spark, index11, oracle11):
    lens = {
        r["doc_id"]: r["dl"]
        for r in IndexCatalog(index11).read(spark, "doc_lens").collect()
    }
    assert lens == oracle11.doc_lens


def test_postings_decode_matches_oracle(spark, index11, oracle11):
    rows = IndexCatalog(index11).read(spark, "postings").collect()
    got: dict[str, list[tuple[int, int]]] = {}
    for r in sorted(rows, key=lambda r: (r["term"], r["shard"])):
        d = codec.decode_doc_ids(r["doc_ids_enc"])
        t = codec.decode_tfs(r["tfs_enc"])
        got.setdefault(r["term"], []).extend(zip(d.tolist(), t.tolist()))
        assert r["df"] == len(d)
        assert r["cf"] == int(t.sum())
        assert r["min_doc"] == d[0] and r["max_doc"] == d[-1]
        assert list(d) == sorted(d)
    assert got == oracle11.postings


QUERIES = [
    (1, "build", 10),          # mid-frequency term
    (2, "lady", 5),            # appears in every doc (head term)
    (3, "silver gold", 10),    # 2-term OR
    (4, "wood clay needles pins", 10),  # 4-term OR
    (5, "the is of", 10),      # stopwords-only -> empty
    (6, "zzzunknown", 10),     # unknown term -> empty
    (7, "bridge zzzunknown", 10),  # known + unknown
    (8, "strong", 3),          # k smaller than matches
]


@pytest.mark.parametrize("method", ["dataframe", "wand"])
def test_bm25_rank_identity_vs_oracle(spark, index11, oracle11, method):
    searcher = Searcher(spark, index11)
    res = searcher.search_batch(QUERIES, method=method).collect()
    by_qid: dict[int, list] = {}
    for r in sorted(res, key=lambda r: (r["qid"], r["rank"])):
        by_qid.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    for qid, query, k in QUERIES:
        expected = oracle11.search(query, k)
        got = by_qid.get(qid, [])
        assert [d for d, _ in got] == [d for d, _ in expected], (
            f"qid={qid} q={query!r} method={method}: {got} != {expected}"
        )
        for (_, gs), (_, es) in zip(got, expected):
            assert gs == pytest.approx(es, abs=1e-9)


def test_bm25_score_formula_spot_check(spark, index11, oracle11):
    """First-principles BM25 recomputation (mirrors TFIDFSuite's style of
    asserting against formulas recomputed in the test)."""
    searcher = Searcher(spark, index11)
    res = searcher.search("bridge", k=1, method="dataframe").collect()[0]
    # bridge: df=1 (only doc 0), tf=2, dl=15, N=11
    n, df, tf = 11, 1, 2
    dl = oracle11.doc_lens[0]
    avgdl = oracle11.avgdl
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    expected = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
    assert res["doc_id"] == 0
    assert res["score"] == pytest.approx(expected, abs=1e-12)
