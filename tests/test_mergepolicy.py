"""Tiered merge policy + generation compaction (index/mergepolicy.py).

Semantics pinned here:
1. TieredMergePolicy.find_merges is deterministic, bounds group width by
   max_merge_at_once / max_merged_segment_bytes, and leaves a generation
   list that fits the Lucene tier budget.
2. compact(gens) is rank-, score- AND docID-identical to both
   MultiSearcher(gens) (the query-time federation it replaces) and a
   single index built over the whole corpus — the Lucene invariant that
   merging segments never changes search results.
3. maintain() round-trips: surviving + merged dirs still cover the
   corpus exactly.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index import build_index
from nlp4l_spark.index.mergepolicy import (
    TieredMergePolicy,
    compact,
    index_size_bytes,
    maintain,
)
from nlp4l_spark.search import MultiSearcher, Searcher


# ---------------------------------------------------------------- policy


def test_allowed_count_tier_walk():
    p = TieredMergePolicy(
        segs_per_tier=4, max_merge_at_once=4, floor_segment_bytes=1
    )
    # 16 segments of 1 byte: tier walk -> 4 at level 1, 4 at level 4 ...
    assert p.allowed_segment_count([1] * 16) < 16
    # under budget: small counts are always allowed
    assert p.allowed_segment_count([1, 1]) >= 2
    assert p.allowed_segment_count([]) == 0


def test_find_merges_deterministic_and_bounded():
    p = TieredMergePolicy(
        segs_per_tier=2,
        max_merge_at_once=3,
        floor_segment_bytes=1,
        max_merged_segment_bytes=100,
    )
    sizes = {f"g{i:02d}": 10 for i in range(9)}
    m1 = p.find_merges(dict(sizes))
    m2 = p.find_merges(dict(reversed(list(sizes.items()))))
    assert m1 == m2  # input-order independent
    assert m1, "9 equal segments at segs_per_tier=2 must trigger merges"
    for g in m1:
        assert 2 <= len(g) <= 3
        assert g == sorted(g)
    # a merged group never exceeds the byte cap unless it's forced
    for g in m1:
        assert sum(sizes[x] for x in g if x in sizes) <= 100


def test_find_merges_respects_byte_cap():
    p = TieredMergePolicy(
        segs_per_tier=1,
        max_merge_at_once=10,
        floor_segment_bytes=1,
        max_merged_segment_bytes=25,
    )
    sizes = {"a": 10, "b": 10, "c": 10, "d": 10}
    for g in p.find_merges(sizes):
        assert sum(sizes[x] for x in g) <= 25


def test_find_merges_noop_when_under_budget():
    p = TieredMergePolicy(segs_per_tier=10, max_merge_at_once=10)
    assert p.find_merges({"a": 5 << 20, "b": 6 << 20}) == []
    assert p.find_merges({"a": 5 << 20}) == []
    assert p.find_merges({}) == []


# ------------------------------------------------------------- compaction


@pytest.fixture(scope="module")
def gens(spark, tmp_path_factory):
    """Three prefix-split generations + the single-index twin."""
    root = tmp_path_factory.mktemp("mergepol")
    full = synth_transcripts(spark, 1200, num_partitions=4)
    convs = sorted(
        r["conv_id"] for r in full.select("conv_id").distinct().collect()
    )
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    d_full = str(root / "full")
    d = [str(root / f"gen{i}") for i in range(3)]
    build_index(full, d_full)
    build_index(full.filter(F.col("conv_id") < c1), d[0])
    build_index(
        full.filter((F.col("conv_id") >= c1) & (F.col("conv_id") < c2)), d[1]
    )
    build_index(full.filter(F.col("conv_id") >= c2), d[2])
    return d_full, d


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


QUERIES = ("w00001 w00454", "w00002", "w00010 w00020 w00030")


def test_compact_identical_to_federation_and_single(spark, gens, tmp_path):
    d_full, d = gens
    out = str(tmp_path / "compacted")
    cat = compact(spark, d, out)
    # collection stats are exact unions
    fs = cat.read(spark, "field_stats").collect()[0]
    single = Searcher(spark, d_full)
    assert fs["num_docs"] == single.num_docs
    assert fs["sum_dl"] == single.sum_dl
    comp = Searcher(spark, out)
    multi = MultiSearcher(spark, d)
    for q in QUERIES:
        want_multi = _rows(multi.search(q, k=10))
        want_single = _rows(single.search(q, k=10, method="dataframe"))
        got = _rows(comp.search(q, k=10, method="dataframe"))
        assert got == want_multi and got == want_single and got, q
    # WAND over the compacted index agrees on ranking too
    got_w = [x[0] for x in _rows(comp.search(QUERIES[0], k=10, method="wand"))]
    assert got_w == [x[0] for x in _rows(single.search(QUERIES[0], k=10))]


def test_compact_requires_forward_index(spark, tmp_path):
    df = synth_transcripts(spark, 60, num_partitions=2)
    d0 = str(tmp_path / "nofwd")
    build_index(df, d0, materialize_forward=False)
    with pytest.raises(ValueError, match="doc_terms_fwd"):
        compact(spark, [d0], str(tmp_path / "out"))


def test_maintain_round(spark, gens, tmp_path):
    _, d = gens
    # force a merge: generations are far under the floor, so they all
    # floor-equalize and the 1-per-tier budget demands compaction
    policy = TieredMergePolicy(
        segs_per_tier=1.0,
        max_merge_at_once=2,
        floor_segment_bytes=1 << 30,
        max_merged_segment_bytes=1 << 40,
    )
    before = _rows(MultiSearcher(spark, d).search(QUERIES[0], k=10))
    live = maintain(spark, d, str(tmp_path / "maint"), policy)
    assert len(live) < len(d) + 1  # something was compacted
    assert any(x.startswith(str(tmp_path / "maint")) for x in live)
    # the new generation list still answers identically — NOTE: doc ids
    # are renumbered by federation order, so compare scores only
    after = _rows(MultiSearcher(spark, live).search(QUERIES[0], k=10))
    assert [s for _, s in after] == [s for _, s in before]


def test_compact_carries_positions_and_vectors(spark, tmp_path):
    """pos_postings + term_vectors survive compaction without
    re-analysis; a deliberately tiny docs_per_shard forces the
    row-splitting slow path at rebased shard boundaries. The compacted
    index answers phrase queries identically to a single build and
    passes the full offline integrity check."""
    from nlp4l_spark.index import IndexBuilder, check_index

    full = synth_transcripts(spark, 600, num_partitions=3)
    convs = sorted(
        r["conv_id"] for r in full.select("conv_id").distinct().collect()
    )
    mid = convs[len(convs) // 2]
    b = IndexBuilder(store_positions=True, store_term_vectors=True)
    d_full = str(tmp_path / "full")
    d0, d1 = str(tmp_path / "g0"), str(tmp_path / "g1")
    b.build(full, d_full)
    b.build(full.filter(F.col("conv_id") < mid), d0)
    b.build(full.filter(F.col("conv_id") >= mid), d1)
    out = str(tmp_path / "out")
    cat = compact(spark, [d0, d1], out, docs_per_shard=97)
    assert cat.is_committed("pos_postings")
    assert cat.is_committed("term_vectors")
    comp = Searcher(spark, out)
    single = Searcher(spark, d_full)
    hit = False
    for q in ('"w00010 w00020"', '"w00001 w00454"', '"w00002 w00003"'):
        phrase = q.strip('"')
        got = _rows(comp.search_phrase(phrase, k=10))
        want = _rows(single.search_phrase(phrase, k=10))
        assert got == want, phrase
        hit = hit or bool(got)
    # term_vectors: rebased union matches the single build row-for-row
    tv_c = cat.read(spark, "term_vectors")
    tv_s = Searcher(spark, d_full).cat.read(spark, "term_vectors")
    assert sorted(map(tuple, tv_c.collect())) == sorted(
        map(tuple, tv_s.collect())
    )
    # offline integrity: postings/pos_postings/term_vectors all agree
    report = check_index(spark, out).collect()
    bad = [(r["check"], r["detail"]) for r in report if not r["ok"]]
    assert report and not bad, bad


def test_compact_expunges_deletes(spark, tmp_path):
    """Lucene merge semantics: tombstoned docs leave the compacted
    generation and stats recompute. Surviving docIDs keep their
    federation numbering (holes where deleted). The independent Python
    OracleIndex over the surviving (rebased_id, text) pairs is the
    referee for both ranking AND absolute BM25 scores; check_index
    validates postings/pos_postings/term_vectors consistency after the
    masked carry-over."""
    from nlp4l_spark.index import IndexBuilder, check_index, delete_docs
    from nlp4l_spark.oracle import OracleIndex

    full = synth_transcripts(spark, 500, num_partitions=2)
    convs = sorted(
        r["conv_id"] for r in full.select("conv_id").distinct().collect()
    )
    mid = convs[len(convs) // 2]
    b = IndexBuilder(store_positions=True, store_term_vectors=True)
    d0, d1 = str(tmp_path / "g0"), str(tmp_path / "g1")
    b.build(full.filter(F.col("conv_id") < mid), d0)
    b.build(full.filter(F.col("conv_id") >= mid), d1)
    multi = MultiSearcher(spark, [d0, d1])
    base1 = multi.doc_bases[1]
    # delete a top hit from each generation (global ids span both)
    top = [r["doc_id"] for r in multi.search("w00001", k=4).collect()]
    dels_global = {top[0], top[-1], 3, base1 + 3}
    for g in sorted(dels_global):
        if g < base1:
            delete_docs(spark, d0, [g])
        else:
            delete_docs(spark, d1, [g - base1])
    out = str(tmp_path / "out")
    cat = compact(spark, [d0, d1], out)
    # surviving corpus with federation numbering, minus deletions
    pairs = []
    for d, bb in ((d0, 0), (d1, base1)):
        for r in (
            Searcher(spark, d).cat.read(spark, "stored")
            .select("doc_id", "text").collect()
        ):
            g = r["doc_id"] + bb
            if g not in dels_global:
                pairs.append((g, r["text"]))
    oracle = OracleIndex.build(pairs)
    fs = cat.read(spark, "field_stats").collect()[0]
    assert fs["num_docs"] == len(pairs)
    assert fs["sum_dl"] == oracle.sum_dl
    comp = Searcher(spark, out)
    for q in ("w00001", "w00002 w00005", "w00010 w00020"):
        got = [
            (r["doc_id"], round(r["score"], 6))
            for r in comp.search(q, k=10, method="wand").collect()
        ]
        want = [(d, round(s, 6)) for d, s in oracle.search(q, 10)]
        assert got == want, (q, got, want)
        assert not ({g for g, _ in got} & dels_global)
    # phrase path: pos mask agrees with the term_vectors mask (two
    # independent carry-over implementations), deleted docs gone
    for ph in ("w00010 w00020", "w00001 w00454"):
        via_pos = _rows(comp.search_phrase(ph, k=10, method="postings"))
        via_tv = _rows(comp.search_phrase(ph, k=10, method="term_vectors"))
        assert via_pos == via_tv, ph
        assert not ({g for g, _ in via_pos} & dels_global)
    report = check_index(spark, out).collect()
    bad = [(r["check"], r["detail"]) for r in report if not r["ok"]]
    assert report and not bad, bad


def test_generation_log_delete_routes_and_expunges(spark, tmp_path):
    from nlp4l_spark.index import GenerationLog, TieredMergePolicy, deleted_count

    full = synth_transcripts(spark, 450, num_partitions=2)
    convs = sorted(
        r["conv_id"] for r in full.select("conv_id").distinct().collect()
    )
    c1, c2 = convs[len(convs) // 3], convs[2 * len(convs) // 3]
    log = GenerationLog(str(tmp_path / "log"))
    log.ingest(full.filter(F.col("conv_id") < c1))
    log.ingest(full.filter((F.col("conv_id") >= c1) & (F.col("conv_id") < c2)))
    # NOTE: a 2-generation log is always within the tier budget
    # (allowed_segment_count >= 2) — three generations force the merge
    log.ingest(full.filter(F.col("conv_id") >= c2))
    fed = log.searcher(spark)
    top = [r["doc_id"] for r in fed.search("w00001", k=3).collect()]
    n = log.delete(spark, top[:2])
    assert n == 2
    # visible immediately through the federated view
    after = [r["doc_id"] for r in log.searcher(spark).search("w00001", k=3).collect()]
    assert not (set(after) & set(top[:2]))
    with pytest.raises(ValueError):
        log.delete(spark, [10**9])
    # maintain physically expunges: compacted generation has no tombstones
    log.maintain(
        spark,
        TieredMergePolicy(
            segs_per_tier=1.0,
            floor_segment_bytes=1 << 30,
            max_merged_segment_bytes=1 << 42,
        ),
    )
    assert len(log.live_dirs) == 1
    assert deleted_count(log.live_dirs[0]) == 0
    final = [r["doc_id"] for r in log.searcher(spark).search("w00001", k=3).collect()]
    assert not (set(final) & set(top[:2]))


def test_index_size_bytes(gens):
    _, d = gens
    s = index_size_bytes(d[0])
    assert s > 0
    assert index_size_bytes(d[0] + "_missing") == 0
