"""Doc-range sharding: the head-term skew bound (SURVEY §7.3).

A term's postings are sharded by doc_id range (docs_per_shard); no merge
or scoring task ever sees more than one shard of one term. These tests
force real multi-shard terms (tiny docs_per_shard) and assert search
results are identical to the unsharded build and the oracle.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts, synth_queries
from nlp4l_spark.index.builder import IndexBuilder
from nlp4l_spark.oracle import OracleIndex
from nlp4l_spark.search import Searcher


def _topk(searcher, queries, method="wand"):
    res = searcher.search_batch(queries, method=method).collect()
    out = {}
    for r in res:
        out.setdefault(r["qid"], []).append((r["doc_id"], round(r["score"], 6)))
    return out


def test_multi_shard_terms_rank_identical(spark, tmp_path):
    df = synth_transcripts(spark, 3000, num_partitions=8)

    sharded_dir = str(tmp_path / "idx_sharded")
    plain_dir = str(tmp_path / "idx_plain")
    # 3000 docs / 256 docs-per-shard => head terms span ~12 shards
    IndexBuilder(docs_per_shard=256).build(df, sharded_dir)
    IndexBuilder().build(df, plain_dir)

    cat = IndexBuilder().build(df, plain_dir)  # resume no-op, get catalog
    post_sharded = (
        Searcher(spark, sharded_dir)
        .cat.read(spark, "postings")
        .groupBy("term")
        .agg(F.count("*").alias("n_shards"))
        .filter("n_shards > 1")
        .count()
    )
    assert post_sharded > 0, "expected multi-shard terms at docs_per_shard=256"

    queries = synth_queries(12)
    s_sharded = Searcher(spark, sharded_dir)
    s_plain = Searcher(spark, plain_dir)
    got_sharded = _topk(s_sharded, queries)
    got_plain = _topk(s_plain, queries)
    assert got_sharded == got_plain

    # and against the single-node oracle
    stored = cat.read(spark, "stored").select("doc_id", "text").collect()
    oracle = OracleIndex.build([(r["doc_id"], r["text"]) for r in stored])
    for qid, q, k in queries:
        expect = [(d, round(s, 6)) for d, s in oracle.search(q, k)]
        assert got_sharded.get(qid, []) == expect, f"qid={qid} q={q!r}"


def test_sharded_dataframe_method_matches_wand(spark, tmp_path):
    df = synth_transcripts(spark, 1500, num_partitions=4)
    idx = str(tmp_path / "idx_sh_df")
    IndexBuilder(docs_per_shard=128).build(df, idx)
    s = Searcher(spark, idx)
    queries = synth_queries(8)
    assert _topk(s, queries, "wand") == _topk(s, queries, "dataframe")
