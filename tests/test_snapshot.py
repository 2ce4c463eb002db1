"""Snapshot/restore: point-in-time copy, incremental re-snapshot,
inventory verification, identical search results after restore."""

from __future__ import annotations

import os

import pytest

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index import (
    IndexBuilder,
    restore,
    snapshot,
    verify_snapshot,
)
from nlp4l_spark.search import Searcher


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("snap") / "idx")
    IndexBuilder().build(synth_transcripts(spark, 1200, num_partitions=4), d)
    return d


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_snapshot_restore_roundtrip(spark, idx, tmp_path):
    repo = str(tmp_path / "repo")
    m = snapshot(idx, repo)
    assert m["files_copied"] > 0 and "postings" in m["tables"]
    verify_snapshot(repo)
    restored = str(tmp_path / "restored")
    restore(repo, restored)
    q = "w00001 w00002"
    want = _rows(Searcher(spark, idx).search(q, k=5))
    got = _rows(Searcher(spark, restored).search(q, k=5))
    assert want and got == want


def test_second_snapshot_is_incremental(idx, tmp_path):
    repo = str(tmp_path / "repo2")
    first = snapshot(idx, repo)
    second = snapshot(idx, repo)
    assert second["files_copied"] == 0
    assert second["files_skipped"] == first["files_copied"]


def test_verify_catches_tampering(idx, tmp_path):
    repo = str(tmp_path / "repo3")
    m = snapshot(idx, repo)
    table = "postings"
    victim = next(iter(m["tables"][table]["files"]))
    with open(os.path.join(repo, table, victim), "ab") as fh:
        fh.write(b"junk")
    with pytest.raises(ValueError, match="size drift"):
        verify_snapshot(repo)


def test_restore_refuses_non_empty_target(idx, tmp_path):
    repo = str(tmp_path / "repo4")
    snapshot(idx, repo)
    target = str(tmp_path / "occupied")
    os.makedirs(target)
    open(os.path.join(target, "something"), "w").close()
    with pytest.raises(ValueError, match="not empty"):
        restore(repo, target)
