"""Incremental index maintenance: append new turns to a built index.

The reference has no streaming operators (SURVEY.md §2.9) — jobs are batch
chains; Lucene handles incremental writes via new segments + merges
(IWriter.scala:56-72). The rebuild's analogue:

* ``append_to_index(new_df, index_dir)`` — one micro-batch: assign docIDs
  continuing after the current maximum, tokenize, APPEND to the stored /
  doc_terms_fwd / doc_lens / segments tables, then re-merge postings and
  refresh stats. Only compressed segments shuffle in the re-merge — the
  Lucene "segment merge" economics, expressed as a deterministic recompute
  from the retained segments table (idempotent; safe to re-run after a
  crash because the merge consumes the committed segments snapshot).
* ``stream_into_index(stream_df, index_dir, ...)`` — Structured Streaming
  wiring: ``foreachBatch(append)`` with ``Trigger.AvailableNow`` semantics
  for catch-up ingestion of newly landed files.

avgdl drifts as docs arrive; the re-merge recomputes every block's
max-impact with the fresh avgdl, so WAND bounds stay exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nlp4l_spark.analysis import Analyzer, STANDARD_ANALYZER
from nlp4l_spark.index.builder import (
    POSTINGS_SCHEMA,
    SEGMENT_SCHEMA,
    _segment_builder,
    _segment_merger,
)
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.index.docids import assign_doc_ids


def append_to_index(
    new_df: DataFrame,
    index_dir: str,
    *,
    analyzer: Analyzer | None = None,
    text_col: str = "text",
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
    docs_per_shard: int = 1 << 24,
) -> IndexCatalog:
    analyzer = analyzer or STANDARD_ANALYZER
    spark = new_df.sparkSession
    cat = IndexCatalog(index_dir)

    base = int(cat.manifest("doc_lens")["counters"]["num_docs"])
    with_ids = assign_doc_ids(new_df, sort_cols).withColumn(
        "doc_id", F.col("doc_id") + F.lit(base)
    )
    n_new = with_ids.count()
    cat.write(with_ids, "stored", mode="append",
              counters={"num_docs": base + n_new})
    cache = getattr(with_ids, "_docid_cache", None)
    if cache is not None:
        cache.unpersist()
    # work from the committed snapshot (avoids recomputing the range shuffle)
    new_stored = cat.read(spark, "stored").filter(F.col("doc_id") >= base)

    tc = analyzer.term_counts_udf()
    fwd = new_stored.select("doc_id", tc(F.col(text_col)).alias("_tc")).select(
        "doc_id",
        F.col("_tc.terms").alias("terms"),
        F.col("_tc.tfs").alias("tfs"),
        F.col("_tc.dl").alias("dl"),
    )
    fwd = fwd.persist()
    new_sum_dl = int(fwd.agg(F.sum("dl")).collect()[0][0] or 0)
    cat.write(fwd, "doc_terms_fwd", mode="append")
    old = cat.manifest("doc_lens")["counters"]
    num_docs = base + n_new
    sum_dl = int(old["sum_dl"]) + new_sum_dl
    cat.write(
        fwd.select("doc_id", "dl"), "doc_lens", mode="append",
        counters={"num_docs": num_docs, "sum_dl": sum_dl},
    )
    new_segs = fwd.sortWithinPartitions("doc_id").mapInPandas(
        _segment_builder(docs_per_shard), SEGMENT_SCHEMA
    )
    cat.write(new_segs, "segments", mode="append")
    fwd.unpersist()

    # re-merge from the full segments snapshot (fresh avgdl -> fresh bounds)
    avgdl = sum_dl / num_docs if num_docs else 0.0
    segs = cat.read(spark, "segments")
    # explicit numPartitions: AQE would coalesce this small-byte exchange
    # under the python-heavy merge (see IndexBuilder stage 5)
    merged = (
        segs.repartition(spark.sparkContext.defaultParallelism, "term", "shard")
        .sortWithinPartitions("term", "shard", "min_doc")
        .mapInPandas(_segment_merger(avgdl), POSTINGS_SCHEMA)
    )
    cat.write(merged, "postings", sort_by=["term"])
    postings = cat.read(spark, "postings")
    cat.write(
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("tlen", F.length("term").cast("int")),
        "term_stats",
        sort_by=["term"],
    )
    uniq = cat.row_count("term_stats")  # parquet footers, no job
    cat.write(
        spark.createDataFrame(
            [(text_col, num_docs, sum_dl, avgdl, uniq)],
            "field string, num_docs long, sum_dl long, avgdl double, uniq_terms long",
        ),
        "field_stats",
    )
    return cat


def stream_into_index(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    *,
    analyzer: Analyzer | None = None,
    available_now: bool = True,
):
    """Structured Streaming sink: micro-batch append via foreachBatch.

    ``stream_df`` is a streaming DataFrame of transcript turns (e.g.
    ``spark.readStream.schema(...).parquet(dir)``). AvailableNow processes
    the backlog then stops — the incremental-ingest trigger for a
    periodically scheduled catch-up job."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_to_index(batch_df, index_dir, analyzer=analyzer)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
