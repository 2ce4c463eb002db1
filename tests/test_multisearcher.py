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
