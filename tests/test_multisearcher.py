"""MultiSearcher (Lucene MultiReader analogue): searching K per-split
indexes with blended global stats must be rank- AND score-identical to
searching one index built over the whole corpus — BM25 sees the corpus
only through (N, df, avgdl, tf, dl), all blended exactly. The split is
a prefix split in (conv_id, turn_idx) order so docBase offsets line up
with the single index's dense docIDs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index import build_index
from nlp4l_spark.search import MultiSearcher, Searcher


@pytest.fixture(scope="module")
def dirs(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("multi")
    full = synth_transcripts(spark, 1500, num_partitions=4)
    convs = sorted(
        r["conv_id"] for r in full.select("conv_id").distinct().collect()
    )
    mid = convs[len(convs) // 2]
    d_full, d_a, d_b = str(root / "full"), str(root / "a"), str(root / "b")
    build_index(full, d_full)
    build_index(full.filter(F.col("conv_id") < mid), d_a)
    build_index(full.filter(F.col("conv_id") >= mid), d_b)
    return d_full, d_a, d_b


def _rows(df):
    return [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]


def test_split_equals_single_index(spark, dirs):
    d_full, d_a, d_b = dirs
    single = Searcher(spark, d_full)
    multi = MultiSearcher(spark, [d_a, d_b])
    assert multi.num_docs == single.num_docs
    assert multi.sum_dl == single.sum_dl
    assert abs(multi.avgdl - single.avgdl) < 1e-12
    for q in ("w00001 w00454", "w00002", "w00010 w00020 w00030"):
        got = _rows(multi.search(q, k=10))
        want = _rows(single.search(q, k=10, method="dataframe"))
        assert got == want and want, q
    # and rank-identity against the WAND path too
    got = [d for d, _ in _rows(multi.search("w00001 w00454", k=10))]
    want = [
        d for d, _ in _rows(single.search("w00001 w00454", k=10, method="wand"))
    ]
    assert got == want


def test_single_dir_degenerate(spark, dirs):
    d_full, _, _ = dirs
    multi = MultiSearcher(spark, [d_full])
    single = Searcher(spark, d_full)
    q = "w00001 w00454"
    assert _rows(multi.search(q, k=10)) == _rows(
        single.search(q, k=10, method="dataframe")
    )


def test_unknown_and_empty(spark, dirs):
    _, d_a, d_b = dirs
    multi = MultiSearcher(spark, [d_a, d_b])
    assert multi.search("zzzqqqxxx", k=5).count() == 0
    with pytest.raises(ValueError):
        MultiSearcher(spark, [])


def test_federation_respects_per_shard_deletes(spark, dirs, tmp_path):
    """Deleting a doc in ONE shard must drop it from federated results
    while the other shard's candidates are untouched — Lucene's
    per-reader liveDocs semantics under MultiReader."""
    import shutil

    from nlp4l_spark.index import delete_docs

    d_full, d_a, d_b = dirs
    # work on copies so the module fixture stays pristine
    ca, cb = str(tmp_path / "da"), str(tmp_path / "db")
    shutil.copytree(d_a, ca)
    shutil.copytree(d_b, cb)
    ms0 = MultiSearcher(spark, [ca, cb])
    q = "w00001 w00454"
    before = [r["doc_id"] for r in ms0.search(q, k=5).collect()]
    assert before
    top = before[0]
    # locate the top doc's owning shard + local id, tombstone it there
    base_a = ms0.doc_bases[1]
    if top < base_a:
        delete_docs(spark, ca, [top])
    else:
        delete_docs(spark, cb, [top - base_a])
    ms1 = MultiSearcher(spark, [ca, cb])
    after = [r["doc_id"] for r in ms1.search(q, k=5).collect()]
    assert top not in after
    # the rest of the ranking is unchanged (stats frozen until expunge,
    # the Lucene deletes model) and the next candidate fills in
    assert after[: len(before) - 1] == [d for d in before if d != top][:4]
