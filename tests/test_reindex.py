"""ES _reindex semantics: stored-fields round-trip, source.query filter,
live-docs (tombstones never survive), ingest-pipeline transform slot."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index import IndexBuilder, IndexCatalog, delete_docs, reindex
from nlp4l_spark.search import Searcher


@pytest.fixture(scope="module")
def src(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("reidx") / "src")
    IndexBuilder().build(synth_transcripts(spark, 1200, num_partitions=4), d)
    return d


def test_plain_reindex_reproduces_stats(spark, src, tmp_path):
    dst = str(tmp_path / "dst")
    reindex(spark, src, dst)
    a = IndexCatalog(src).manifest("doc_lens")["counters"]
    b = IndexCatalog(dst).manifest("doc_lens")["counters"]
    assert a["num_docs"] == b["num_docs"]
    # term dictionary identical (same analyzer, same live docs)
    ts_a = {
        (r["term"], r["cf"], r["df"])
        for r in IndexCatalog(src).read(spark, "term_stats").collect()
    }
    ts_b = {
        (r["term"], r["cf"], r["df"])
        for r in IndexCatalog(dst).read(spark, "term_stats").collect()
    }
    assert ts_a == ts_b


def test_reindex_drops_tombstoned_docs(spark, src, tmp_path):
    """A tombstoned doc must not survive the reindex even though it is
    still present in the source's stored table."""
    work = str(tmp_path / "work")
    reindex(spark, src, work)  # isolate: never tombstone the shared src
    victim = (
        IndexCatalog(work)
        .read(spark, "stored")
        .orderBy("doc_id")
        .limit(1)
        .collect()
    )
    delete_docs(spark, work, [victim[0]["doc_id"]])
    dst = str(tmp_path / "dst2")
    reindex(spark, work, dst)
    n_src = IndexCatalog(work).manifest("doc_lens")["counters"]["num_docs"]
    n_dst = IndexCatalog(dst).manifest("doc_lens")["counters"]["num_docs"]
    assert n_dst == n_src - 1


def test_reindex_where_and_transform(spark, src, tmp_path):
    """source.query + ingest pipeline: filter to one speaker and redact
    the text — the destination index only knows the transformed docs."""
    dst = str(tmp_path / "dst3")
    stored = IndexCatalog(src).read(spark, "stored")
    speaker_col = "speaker" if "speaker" in stored.columns else None
    where = f"{speaker_col} = 'user'" if speaker_col else "turn_idx = 0"
    expected = stored.filter(where).count()
    reindex(
        spark,
        src,
        dst,
        where=where,
        transform=lambda d: d.withColumn(
            "text", F.regexp_replace("text", "needle[0-9]+", "REDACTED")
        ),
    )
    n_dst = IndexCatalog(dst).manifest("doc_lens")["counters"]["num_docs"]
    assert n_dst == expected
    assert Searcher(spark, dst).search("needle03", k=5).count() == 0
    assert Searcher(spark, dst).search("redacted", k=5).count() >= 0
