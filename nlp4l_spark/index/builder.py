"""Index build pipeline: transcripts -> inverted index tables.

Reference semantics rebuilt (what, not how): LuceneIndexingProcessor +
IWriter — analyze each doc's text, accumulate per-segment posting lists,
then merge segments (/root/reference/app/org/nlp4l/framework/builtin/lucene/
LuceneIndexingProcessor.scala:88-117, /root/reference/app/org/nlp4l/lucene/
IWriter.scala:56-72). The rebuild is the north_star pipeline
(BASELINE.json:6): Arrow-UDF tokenization, per-partition posting segments,
an explicit segment-merge pass, delta-gap+varbyte blocks, block-max
metadata.

Stages (each a snapshot-committed table; resume skips committed stages):

  stored         doc_id + original transcript columns ("stored fields";
                 per-turn text round-trip invariant is tested on this)
  doc_terms_fwd  (doc_id, terms[], tfs[], dl) — forward index / term
                 vectors analogue; THE tokenize checkpoint
  doc_lens       (doc_id, dl)
  segments       per-input-partition, per-doc_id-shard encoded posting
                 segments — this IS the salted two-phase aggregation: the
                 per-posting explosion never crosses the network; only
                 compressed segments shuffle, keyed (term, shard)
  postings       merged, globally doc_id-sorted, varbyte posting lists with
                 per-block (last_doc, max_impact) skip metadata
  term_stats     (term, df, cf) — the term dictionary (FST analogue)
  field_stats    (field, num_docs, sum_dl, avgdl, uniq_terms)
  _lineage       per-stage / per-partition counters (turns tokenized,
                 postings emitted, bytes compressed)

Scale notes (10^12 turns):
* The only wide shuffles are the docID range partition and the
  groupBy(term, shard) of *compressed segments*. Head-term skew ("the"
  appears in ~every doc) is bounded by sharding on doc_id range: no merge
  task ever sees more than DOCS_PER_SHARD postings for one term, and a
  term's segments-per-shard is bounded by input partitions overlapping
  that shard. No driver-resident state is O(corpus): the driver holds only
  per-partition counts (docIDs) and scalar stats.
* dl is stored inline per posting (dls_enc), trading ~1 byte/posting for
  eliminating the 10^12-row doc_lens join at query time — Spark has no
  random-access norms file, so self-contained posting shards keep scoring
  embarrassingly parallel.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

from nlp4l_spark.analysis import Analyzer, STANDARD_ANALYZER
from nlp4l_spark.index import codec
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.index.docids import assign_doc_ids

K1 = 1.2
B = 0.75

SEGMENT_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.LongType()),
        T.StructField("pid", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("cf", T.LongType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("tfs_enc", T.BinaryType()),
        T.StructField("dls_enc", T.BinaryType()),
    ]
)

POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.LongType()),
        T.StructField("df", T.LongType()),
        T.StructField("cf", T.LongType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("tfs_enc", T.BinaryType()),
        T.StructField("dls_enc", T.BinaryType()),
        T.StructField(
            "block_max",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("last_doc", T.LongType()),
                        T.StructField("max_impact", T.DoubleType()),
                    ]
                )
            ),
        ),
    ]
)


@dataclass
class IndexBuilder:
    """Builds the inverted index for one text field of a transcripts table."""

    analyzer: Analyzer = field(default_factory=lambda: STANDARD_ANALYZER)
    text_col: str = "text"
    sort_cols: tuple[str, ...] = ("conv_id", "turn_idx")
    docs_per_shard: int = 1 << 24  # bounds any merge/scoring task
    num_partitions: int | None = None
    # Lucene FieldType(termVectors, termPositions, termOffsets) analogue
    # (/root/reference/app/org/nlp4l/lucene/Schema.scala:88-90): opt-in
    # because BM25 does not need positions; when set, a `term_vectors`
    # table (doc_id, term, tf, positions, start_offsets, end_offsets) is
    # written alongside the postings.
    store_term_vectors: bool = False

    # ------------------------------------------------------------------ #
    def build(
        self,
        df: DataFrame,
        index_dir: str,
        *,
        resume: bool = True,
        fail_after_stage: str | None = None,  # test hook for kill/restart
    ) -> IndexCatalog:
        spark = df.sparkSession
        cat = IndexCatalog(index_dir)
        lineage: list[tuple] = []

        def done(stage: str) -> bool:
            return resume and cat.is_committed(stage)

        # -- stage 1: docIDs + stored fields --------------------------------
        if not done("stored"):
            with_ids = assign_doc_ids(
                df, self.sort_cols, num_partitions=self.num_partitions
            )
            n = with_ids.count()
            cat.write(
                with_ids,
                "stored",
                sort_by=["doc_id"],
                counters={"num_docs": n},
            )
            cache = getattr(with_ids, "_docid_cache", None)
            if cache is not None:
                cache.unpersist()
        self._check_fail(fail_after_stage, "stored")
        stored = cat.read(spark, "stored")

        # -- stage 2: tokenize (Arrow UDF) -> forward index -----------------
        if not done("doc_terms_fwd"):
            tc = self.analyzer.term_counts_udf()
            fwd = stored.select(
                "doc_id", tc(F.col(self.text_col)).alias("_tc")
            ).select(
                "doc_id",
                F.col("_tc.terms").alias("terms"),
                F.col("_tc.tfs").alias("tfs"),
                F.col("_tc.dl").alias("dl"),
            )
            cat.write(fwd, "doc_terms_fwd", sort_by=["doc_id"])
        self._check_fail(fail_after_stage, "doc_terms_fwd")
        fwd = cat.read(spark, "doc_terms_fwd")

        # -- stage 3: doc_lens + collection stats ---------------------------
        if not done("doc_lens"):
            stats = fwd.agg(
                F.count("*").alias("num_docs"), F.sum("dl").alias("sum_dl")
            ).collect()[0]
            num_docs, sum_dl = stats["num_docs"], int(stats["sum_dl"] or 0)
            cat.write(
                fwd.select("doc_id", "dl"),
                "doc_lens",
                sort_by=["doc_id"],
                counters={"num_docs": num_docs, "sum_dl": sum_dl},
            )
        self._check_fail(fail_after_stage, "doc_lens")
        lens_man = cat.manifest("doc_lens")["counters"]
        num_docs = int(lens_man["num_docs"])
        sum_dl = int(lens_man["sum_dl"])
        avgdl = (sum_dl / num_docs) if num_docs else 0.0

        # -- stage 4: per-partition posting segments ------------------------
        if not done("segments"):
            segs = fwd.sortWithinPartitions("doc_id").mapInPandas(
                _segment_builder(self.docs_per_shard), SEGMENT_SCHEMA
            )
            cat.write(segs, "segments")
        self._check_fail(fail_after_stage, "segments")
        segs = cat.read(spark, "segments")

        # -- stage 5: segment merge -> postings ------------------------------
        # One hash shuffle keyed (term, shard) moves only compressed
        # segments; the merge itself is a run-scan over the sorted
        # partition (mapInPandas), NOT per-group applyInPandas — per-term
        # Python call overhead would dominate at vocab sizes of 10^4-10^6.
        if not done("postings"):
            merged = (
                segs.repartition("term", "shard")
                .sortWithinPartitions("term", "shard", "min_doc")
                .mapInPandas(_segment_merger(avgdl), POSTINGS_SCHEMA)
            )
            cat.write(merged, "postings", sort_by=["term"])
        self._check_fail(fail_after_stage, "postings")
        postings = cat.read(spark, "postings")

        # -- stage 6: term dictionary ----------------------------------------
        if not done("term_stats"):
            cat.write(
                postings.groupBy("term").agg(
                    F.sum("df").alias("df"), F.sum("cf").alias("cf")
                ),
                "term_stats",
                sort_by=["term"],
            )
        self._check_fail(fail_after_stage, "term_stats")

        # -- stage 7: field stats ---------------------------------------------
        if not done("field_stats"):
            uniq = cat.read(spark, "term_stats").count()
            cat.write(
                spark.createDataFrame(
                    [(self.text_col, num_docs, sum_dl, avgdl, uniq)],
                    "field string, num_docs long, sum_dl long, avgdl double, uniq_terms long",
                ),
                "field_stats",
            )
        self._check_fail(fail_after_stage, "field_stats")

        # -- optional stage: term vectors (positions + offsets) --------------
        if self.store_term_vectors and not done("term_vectors"):
            from nlp4l_spark.stats.corpus import Corpus

            tv = Corpus(
                stored, text_col=self.text_col, analyzer=self.analyzer
            ).term_vectors()
            cat.write(tv, "term_vectors", sort_by=["doc_id"])
        if self.store_term_vectors:
            self._check_fail(fail_after_stage, "term_vectors")

        # -- stage 8: lineage ---------------------------------------------------
        if not done("_lineage"):
            per_pid = (
                segs.groupBy("pid")
                .agg(
                    F.sum("df").alias("postings_emitted"),
                    (
                        F.sum(F.length("doc_ids_enc"))
                        + F.sum(F.length("tfs_enc"))
                        + F.sum(F.length("dls_enc"))
                    ).alias("bytes_compressed"),
                )
                .select(
                    F.lit("segments").alias("stage"),
                    F.col("pid").alias("partition_id"),
                    F.lit(num_docs).alias("turns_tokenized"),
                    "postings_emitted",
                    "bytes_compressed",
                )
            )
            cat.write(per_pid, "_lineage")
        return cat

    @staticmethod
    def _check_fail(fail_after_stage: str | None, stage: str) -> None:
        if fail_after_stage == stage:
            raise RuntimeError(f"injected failure after stage '{stage}'")


# ---------------------------------------------------------------------- #
def _segment_builder(docs_per_shard: int):
    """mapInPandas fn: forward-index partition -> encoded posting segments.

    Map-side combine done by hand: the (doc_id, term, tf) explosion stays
    inside this task; only (term, shard)-keyed compressed segments leave.
    """

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        doc_parts, dl_parts, term_parts, tf_parts = [], [], [], []
        for batch in batches:
            if batch.empty:
                continue
            doc_ids = batch["doc_id"].to_numpy(dtype=np.int64)
            dls = batch["dl"].to_numpy(dtype=np.int64)
            lens = batch["terms"].map(len).to_numpy(dtype=np.int64)
            if lens.sum() == 0:
                continue
            doc_parts.append(np.repeat(doc_ids, lens))
            dl_parts.append(np.repeat(dls, lens))
            term_parts.append(
                np.concatenate(
                    [np.asarray(t, dtype=object) for t in batch["terms"] if len(t)]
                )
            )
            tf_parts.append(
                np.concatenate(
                    [np.asarray(t, dtype=np.int64) for t in batch["tfs"] if len(t)]
                )
            )
        cols = (
            "term", "shard", "pid", "df", "cf", "min_doc", "max_doc",
            "doc_ids_enc", "tfs_enc", "dls_enc",
        )
        if not doc_parts:
            yield pd.DataFrame({k: [] for k in cols})
            return
        d = np.concatenate(doc_parts)
        l = np.concatenate(dl_parts)
        t = np.concatenate(term_parts)
        f = np.concatenate(tf_parts)
        shards = d // docs_per_shard
        # group by (term, shard), docs ascending inside each run; factorize
        # + lexsort keeps everything in C, the per-run loop only encodes
        codes, uniq_terms = pd.factorize(t, sort=False)
        order = np.lexsort((d, shards, codes))
        d, l, f = d[order], l[order], f[order]
        codes, shards = codes[order], shards[order]
        change = np.flatnonzero(
            (np.diff(codes) != 0) | (np.diff(shards) != 0)
        )
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [codes.size]))
        rows = {k: [] for k in cols}
        cf_all = np.add.reduceat(f, starts)
        for s, e, cf in zip(starts.tolist(), ends.tolist(), cf_all.tolist()):
            rows["term"].append(uniq_terms[codes[s]])
            rows["shard"].append(int(shards[s]))
            rows["pid"].append(pid)
            rows["df"].append(e - s)
            rows["cf"].append(int(cf))
            rows["min_doc"].append(int(d[s]))
            rows["max_doc"].append(int(d[e - 1]))
            rows["doc_ids_enc"].append(codec.encode_doc_ids(d[s:e]))
            rows["tfs_enc"].append(codec.encode_tfs(f[s:e]))
            rows["dls_enc"].append(codec.encode_tfs(l[s:e]))
        yield pd.DataFrame(rows)

    return build


def _segment_merger(avgdl: float):
    """mapInPandas fn over a partition hash-keyed by (term, shard) and
    sorted by (term, shard, min_doc): merges each run of same-key segments
    into one globally doc_id-sorted posting row with exact per-block BM25
    max impacts.

    impact(tf, dl) = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) — score =
    idf * impact, so block upper bound = idf * max_impact is tight.

    Run-scanning (with a carry buffer across Arrow batches) instead of
    per-group applyInPandas: one Python call per partition, not per term."""

    def _emit(rows_out: dict, term: str, shard: int, segs: list) -> None:
        d = np.concatenate([s[0] for s in segs])
        f = np.concatenate([s[1] for s in segs])
        l = np.concatenate([s[2] for s in segs])
        if len(segs) > 1:
            order = np.argsort(d, kind="stable")
            d, f, l = d[order], f[order], l[order]
        impact = f * (K1 + 1.0) / (f + K1 * (1.0 - B + B * l / (avgdl or 1.0)))
        blocks = []
        for s in range(0, d.size, codec.BLOCK_SIZE):
            e = min(s + codec.BLOCK_SIZE, d.size)
            blocks.append(
                {"last_doc": int(d[e - 1]), "max_impact": float(impact[s:e].max())}
            )
        rows_out["term"].append(term)
        rows_out["shard"].append(shard)
        rows_out["df"].append(int(d.size))
        rows_out["cf"].append(int(f.sum()))
        rows_out["min_doc"].append(int(d[0]))
        rows_out["max_doc"].append(int(d[-1]))
        rows_out["doc_ids_enc"].append(codec.encode_doc_ids(d))
        rows_out["tfs_enc"].append(codec.encode_tfs(f))
        rows_out["dls_enc"].append(codec.encode_tfs(l))
        rows_out["block_max"].append(blocks)

    COLS = (
        "term", "shard", "df", "cf", "min_doc", "max_doc",
        "doc_ids_enc", "tfs_enc", "dls_enc", "block_max",
    )

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        carry_key: tuple | None = None
        carry_segs: list = []
        for pdf in batches:
            if pdf.empty:
                continue
            rows_out: dict = {k: [] for k in COLS}
            terms = pdf["term"].to_numpy(dtype=object)
            shards = pdf["shard"].to_numpy(dtype=np.int64)
            d_enc = pdf["doc_ids_enc"].to_numpy(dtype=object)
            f_enc = pdf["tfs_enc"].to_numpy(dtype=object)
            l_enc = pdf["dls_enc"].to_numpy(dtype=object)
            for i in range(len(pdf)):
                key = (terms[i], int(shards[i]))
                seg = (
                    codec.decode_doc_ids(d_enc[i]),
                    codec.decode_tfs(f_enc[i]),
                    codec.decode_tfs(l_enc[i]),
                )
                if key != carry_key:
                    if carry_key is not None:
                        _emit(rows_out, carry_key[0], carry_key[1], carry_segs)
                    carry_key, carry_segs = key, [seg]
                else:
                    carry_segs.append(seg)
            if rows_out["term"]:
                yield pd.DataFrame(rows_out)
        if carry_key is not None:
            rows_out = {k: [] for k in COLS}
            _emit(rows_out, carry_key[0], carry_key[1], carry_segs)
            yield pd.DataFrame(rows_out)

    return merge


def build_index(
    spark_df: DataFrame,
    index_dir: str,
    analyzer: Analyzer | None = None,
    **kwargs,
) -> IndexCatalog:
    return IndexBuilder(analyzer=analyzer or STANDARD_ANALYZER).build(
        spark_df, index_dir, **kwargs
    )
