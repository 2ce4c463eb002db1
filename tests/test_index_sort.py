"""Index-time sorting (Lucene IndexWriterConfig.setIndexSort) and the
early-terminated sort query (TopFieldCollector over a sorted index).

Contract under test:
* IndexBuilder(sort_cols, sort_desc) assigns docIDs in the requested
  order (descending keys supported) and records the sort in the stored
  manifest.
* Searcher.search_sorted on the INDEX sort takes the k smallest matching
  docIDs from the query's own postings and point-fetches exactly k
  stored rows (pushed In(doc_id)) — identical results to the generic
  join+TakeOrdered path, which remains the fallback for a
  non-matching sort.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index import IndexBuilder
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.search import Searcher

N_DOCS = 1200
QUERY = "w00001 w00454"


@pytest.fixture(scope="module")
def sorted_idx(spark, tmp_path_factory):
    """Transcripts indexed newest-first: (ts desc, conv_id, turn_idx)."""
    d = str(tmp_path_factory.mktemp("idx_sorted") / "idx")
    df = synth_transcripts(spark, N_DOCS, num_partitions=4)
    IndexBuilder(
        sort_cols=("ts", "conv_id", "turn_idx"),
        sort_desc=(True, False, False),
    ).build(df, d)
    return d


@pytest.fixture(scope="module")
def plain_idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_plain") / "idx")
    IndexBuilder().build(synth_transcripts(spark, N_DOCS, num_partitions=4), d)
    return d


def test_docids_follow_descending_index_sort(spark, sorted_idx):
    stored = IndexCatalog(sorted_idx).read(spark, "stored")
    rows = (
        stored.select("doc_id", "ts", "conv_id", "turn_idx")
        .orderBy("doc_id")
        .collect()
    )
    keys = [(r["ts"], r["conv_id"], r["turn_idx"]) for r in rows]
    # docID ascending must equal (ts DESC, conv_id ASC, turn_idx ASC)
    expected = sorted(keys, key=lambda t: (_neg_ts(t[0]), t[1], t[2]))
    assert keys == expected
    man = IndexCatalog(sorted_idx).manifest("stored")["counters"]
    assert man["index_sort"] == ["ts", "conv_id", "turn_idx"]
    assert man["index_sort_desc"] == [True, False, False]


def _neg_ts(ts):
    # sort helper: invert a timestamp for a descending python sort
    import datetime

    if isinstance(ts, datetime.datetime):
        return -ts.timestamp()
    return -ts


def test_early_terminated_sort_matches_generic_path(spark, sorted_idx, plain_idx):
    """The sorted-index fast path must return exactly what the generic
    (join + TakeOrdered) path computes on an unsorted index of the same
    corpus."""
    fast = Searcher(spark, sorted_idx).search_sorted(
        QUERY, "ts", k=10, ascending=False
    )
    slow = Searcher(spark, plain_idx).search_sorted(
        QUERY, "ts", k=10, ascending=False
    )
    got = [(r["ts"],) for r in fast.collect()]
    want = [(r["ts"],) for r in slow.collect()]
    # doc_ids differ between the two indexes (different docID assignment
    # orders); the sort keys and their order must be identical
    assert got == want
    # and the fast path's key sequence is ts-descending
    assert got == sorted(got, reverse=True)


def test_sorted_index_fast_path_point_fetches_stored(spark, sorted_idx):
    """Plan guard: on the sorted index, the stored read carries a pushed
    In(doc_id) over the k collected ids — never a join of the matching
    set against the corpus, never a Sort of the stored table."""
    df = Searcher(spark, sorted_idx).search_sorted(
        QUERY, "ts", k=10, ascending=False
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    assert any("doc_id" in ln and "In(" in ln for ln in pushed), pushed
    assert "SortMergeJoin" not in plan
    assert "postings" not in plan  # ids were resolved before this plan


def test_non_matching_sort_falls_back(spark, sorted_idx):
    """ascending=True does NOT match the (ts desc) index sort — the
    generic path must serve it, and correctly."""
    s = Searcher(spark, sorted_idx)
    res = s.search_sorted(QUERY, "ts", k=10, ascending=True).collect()
    keys = [r["ts"] for r in res]
    assert keys == sorted(keys)
    plan_df = s.search_sorted(QUERY, "ts", k=10, ascending=True)
    plan = plan_df._jdf.queryExecution().executedPlan().toString()
    assert "postings" in plan or "Join" in plan  # the generic shape


def test_old_index_without_sort_metadata_still_works(spark, plain_idx):
    """An index whose manifest predates index_sort must fall back (the
    default build records its (conv_id, turn_idx) sort; simulate a
    legacy manifest by querying a non-leading column)."""
    res = Searcher(spark, plain_idx).search_sorted(
        QUERY, "turn_idx", k=5, ascending=False
    )
    keys = [r["turn_idx"] for r in res.collect()]
    assert keys == sorted(keys, reverse=True)


def test_block_join_parent_col_matches_child_fold(spark, plain_idx):
    """search_block_join(parent_col=...) must equal a hand fold of the
    full child BM25 result set (rounded-6dp max/total/count/argmax per
    conv_id)."""
    from collections import defaultdict

    s = Searcher(spark, plain_idx)
    res = {
        r["parent"]: (
            r["score_max"],
            r["score_total"],
            r["n_child"],
            r["best_child"],
        )
        for r in s.search_block_join(
            QUERY, k=10**6, parent_col="conv_id"
        ).collect()
    }
    children = s.search(QUERY, k=10**6, method="dataframe").collect()
    stored = IndexCatalog(plain_idx).read(spark, "stored")
    conv = {
        r["doc_id"]: r["conv_id"]
        for r in stored.select("doc_id", "conv_id").collect()
    }
    folded = defaultdict(list)
    for r in children:
        folded[conv[r["doc_id"]]].append((round(r["score"], 6), r["doc_id"]))
    want = {}
    for p, rows in folded.items():
        smax = max(x[0] for x in rows)
        total = round(sum(round(x[0] * 1e6) for x in rows) / 1e6, 6)
        best = min(d for sc, d in rows if sc == smax)
        want[p] = (smax, total, len(rows), best)
    assert res == want and len(res) > 0
