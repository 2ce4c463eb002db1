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
                 vectors analogue; checkpointed by DEFAULT
                 (materialize_forward=True, measured ~2x faster than
                 fusing tokenize into the segment stage — see the field
                 comment); materialize_forward=False fuses instead
  doc_lens       (doc_id, dl) — computed by the pure-JVM tokenizer
                 (identical contract to the Arrow UDF, tested)
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

from dataclasses import dataclass, field, fields
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
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
    # Lucene IndexWriterConfig.setIndexSort reverse flags: per-sort_cols
    # descending order. docIDs are assigned in (sort_cols, sort_desc)
    # order either way; recording the sort in the stored manifest lets
    # Searcher.search_sorted early-terminate a matching query sort.
    sort_desc: tuple[bool, ...] | None = None
    docs_per_shard: int = 1 << 24  # bounds any merge/scoring task
    num_partitions: int | None = None
    # Lucene FieldType(termVectors, termPositions, termOffsets) analogue
    # (/root/reference/app/org/nlp4l/lucene/Schema.scala:88-90): opt-in
    # because BM25 does not need positions; when set, a `term_vectors`
    # table (doc_id, term, tf, positions, start_offsets, end_offsets) is
    # written alongside the postings.
    store_term_vectors: bool = False
    # opt-in positions IN the posting shards (pos_postings table): the
    # phrase scale path. search_phrase joins per-term position lists from
    # term_vectors — an n-way corpus-sized join; with positions riding in
    # (term, shard) segments the adjacency check runs INSIDE the per-shard
    # task (Searcher._phrase_postings), plan = pushed In(term) scan ->
    # grouped Arrow task -> TakeOrdered. Lucene stores positions in the
    # postings the same way (FieldType.termPositions).
    store_positions: bool = False
    # parquet checkpoint of the (doc_id, terms[], tfs[], dl) forward index
    # between tokenize and segment building. Default ON: fusing the two
    # python stages into one (pandas UDF piped straight into mapInPandas)
    # measured ~2x SLOWER end-to-end — the JVM relays Arrow batches
    # between two python workers through one task pipeline and the
    # accumulate-then-emit segment builder turns that into a stop-and-go
    # pipe, leaving cores idle. Two separate stages each stream at full
    # parallelism, and the fwd table doubles as the tokenize resume
    # checkpoint.
    materialize_forward: bool = True
    # Lucene keyword fields (StringField / ES `keyword` type): each named
    # stored column is ALSO indexed as untokenized terms namespaced
    # "<field>:<lowercased value>" — ':' cannot appear in analyzed text
    # tokens ([a-z0-9]+), so the namespaces never collide. Keyword terms
    # carry tf=1 and do NOT count toward dl (they must not move BM25
    # length normalization; text stats stay exactly as without the
    # option). Values are lowercased (an ES `lowercase` normalizer;
    # Searcher.search_filtered_indexed applies the same fold at query
    # time). Nulls are simply not indexed — the ES missing-value rule.
    # Enables postings-only filter intersection (search_filtered_indexed)
    # instead of the stored-table scan.
    keyword_fields: tuple[str, ...] = ()

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
                df,
                self.sort_cols,
                num_partitions=self.num_partitions,
                sort_desc=self.sort_desc,
            )
            n = with_ids._total_rows  # known from the offsets pass
            cat.write(
                with_ids,
                "stored",
                sort_by=["doc_id"],
                counters={
                    "num_docs": n,
                    "index_sort": list(self.sort_cols),
                    "index_sort_desc": list(
                        self.sort_desc
                        or (False,) * len(self.sort_cols)
                    ),
                },
            )
            cache = getattr(with_ids, "_docid_cache", None)
            if cache is not None:
                cache.unpersist()
        self._check_fail(fail_after_stage, "stored")
        stored = cat.read(spark, "stored")

        # -- stage 2 (default): tokenize -> materialized forward index ------
        # See the materialize_forward field note: two streaming python
        # stages with a columnar checkpoint between them beat one fused
        # stage that relays Arrow batches between two python workers.
        # materialize_forward=False fuses tokenize into stage 4 instead.
        if self.materialize_forward:
            if not done("doc_terms_fwd"):
                with self._clamped_splits(spark, cat, "stored"):
                    fwd = self._tokenized(cat.read(spark, "stored"))
                    cat.write(fwd, "doc_terms_fwd", sort_by=["doc_id"])
            self._check_fail(fail_after_stage, "doc_terms_fwd")

        # -- stage 3: doc_lens + collection stats ---------------------------
        # With a materialized forward index this is a pruned scan of its dl
        # column; otherwise dl comes from the pure-JVM tokenizer
        # (regexp_extract_all inside codegen; identical contract to the
        # Arrow UDF — tests pin the equivalence).
        if not done("doc_lens"):
            if self.materialize_forward:
                lens = cat.read(spark, "doc_terms_fwd").select("doc_id", "dl")
            else:
                lens = stored.select(
                    "doc_id",
                    F.size(self.analyzer.tokens_expr(self.text_col))
                    .cast("int")
                    .alias("dl"),
                )
            stats = lens.agg(
                F.count("*").alias("num_docs"), F.sum("dl").alias("sum_dl")
            ).collect()[0]
            num_docs, sum_dl = stats["num_docs"], int(stats["sum_dl"] or 0)
            cat.write(
                lens,
                "doc_lens",
                sort_by=["doc_id"],
                counters={"num_docs": num_docs, "sum_dl": sum_dl},
            )
        self._check_fail(fail_after_stage, "doc_lens")
        lens_man = cat.manifest("doc_lens")["counters"]
        num_docs = int(lens_man["num_docs"])
        sum_dl = int(lens_man["sum_dl"])
        avgdl = (sum_dl / num_docs) if num_docs else 0.0

        # -- stage 4: tokenize + per-partition posting segments -------------
        # At small corpus sizes the input parquet is only a few hundred MB,
        # and the default 128 MB maxPartitionBytes packs it into a handful
        # of read splits — this python-heavy stage would run at parallelism
        # ~5 on a 32-core cluster. Size splits to the cluster instead
        # (files are doc_id-ranged, so packing stays doc-contiguous and
        # delta gaps stay small). At real scale the clamp is a no-op.
        if not done("segments"):
            src_table = "doc_terms_fwd" if self.materialize_forward else "stored"
            with self._clamped_splits(spark, cat, src_table):
                src = cat.read(spark, src_table)
                if not self.materialize_forward:
                    src = self._tokenized(src)  # fused: no parquet round-trip
                segs = src.sortWithinPartitions("doc_id").mapInPandas(
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
            # explicit numPartitions: AQE would coalesce this exchange by
            # BYTE size (segments are compressed, ~2 B/posting) down to a
            # couple of partitions, serializing the python-heavy merge
            n_merge = spark.sparkContext.defaultParallelism
            merged = (
                segs.repartition(n_merge, "term", "shard")
                .sortWithinPartitions("term", "shard", "min_doc")
                .mapInPandas(_segment_merger(avgdl), POSTINGS_SCHEMA)
            )
            cat.write(merged, "postings", sort_by=["term"])
        self._check_fail(fail_after_stage, "postings")
        postings = cat.read(spark, "postings")

        # -- stage 6: term dictionary ----------------------------------------
        if not done("term_stats"):
            cat.write(
                postings.groupBy("term")
                .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
                # materialized term length: fuzzy expansion pushes the exact
                # Levenshtein length bound |len - |q|| <= max_edits down to
                # the parquet scan instead of levenshtein()-scanning the
                # whole dictionary (search/engine.py::search_fuzzy)
                .withColumn("tlen", F.length("term").cast("int")),
                "term_stats",
                sort_by=["term"],
            )
        self._check_fail(fail_after_stage, "term_stats")

        # -- stage 7: field stats ---------------------------------------------
        if not done("field_stats"):
            uniq = cat.row_count("term_stats")  # parquet footers, no job
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

        # -- optional stage: positions in posting shards (phrase scale path)
        # Written SEGMENTED (one row per (term, shard, pid), disjoint doc
        # ranges) and term-sorted: the per-doc gap reset in the positions
        # codec makes segment rows concatenable at query time, so no merge
        # shuffle is needed at all — the phrase task just stacks the
        # pushed-In(term) rows it receives per shard.
        if self.store_positions and not done("pos_postings"):
            with self._clamped_splits(spark, cat, "stored"):
                src = cat.read(spark, "stored").select(
                    "doc_id", F.col(self.text_col).alias("_text")
                )
                # ONE python stage: tokenization happens inside the
                # segment builder (a tokenize-UDF -> mapInPandas chain
                # relays Arrow batches between two python workers in one
                # task pipeline — measured ~2x slower on the main build,
                # see materialize_forward)
                segs_p = src.sortWithinPartitions("doc_id").mapInPandas(
                    _pos_segment_builder(self.docs_per_shard, self.analyzer),
                    POS_POSTINGS_SCHEMA,
                )
                cat.write(segs_p, "pos_postings", sort_by=["term"])
        if self.store_positions:
            self._check_fail(fail_after_stage, "pos_postings")

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

    def _tokenized(self, stored: DataFrame) -> DataFrame:
        """(doc_id, terms[], tfs[], dl) via the Arrow tokenize UDF; with
        ``keyword_fields`` the per-doc term list also carries the
        namespaced keyword terms (tf=1, dl untouched — see the field
        note), so keyword postings ride the SAME segment build/merge
        path as text postings with zero extra passes."""
        tc = self.analyzer.term_counts_udf()
        base = stored.select(
            "doc_id",
            *self.keyword_fields,
            tc(F.col(self.text_col)).alias("_tc"),
        )
        if not self.keyword_fields:
            return base.select(
                "doc_id",
                F.col("_tc.terms").alias("terms"),
                F.col("_tc.tfs").alias("tfs"),
                F.col("_tc.dl").alias("dl"),
            )
        kw = F.filter(
            F.array(
                *[
                    F.when(
                        F.col(f).isNotNull(),
                        F.concat(
                            F.lit(f + ":"), F.lower(F.col(f).cast("string"))
                        ),
                    )
                    for f in self.keyword_fields
                ]
            ),
            lambda x: x.isNotNull(),
        )
        return base.select(
            "doc_id",
            F.concat(F.col("_tc.terms"), kw).alias("terms"),
            F.concat(
                F.col("_tc.tfs"),
                F.transform(kw, lambda _: F.lit(1).cast("int")),
            ).alias("tfs"),
            F.col("_tc.dl").alias("dl"),
        )

    @staticmethod
    def _check_fail(fail_after_stage: str | None, stage: str) -> None:
        if fail_after_stage == stage:
            raise RuntimeError(f"injected failure after stage '{stage}'")

    @staticmethod
    def _clamped_splits(spark, cat: IndexCatalog, name: str):
        """Context manager: lower spark.sql.files.maxPartitionBytes so a
        scan of table `name` yields >= ~defaultParallelism splits; restore
        on exit. Must stay OPEN across the action that scans the table —
        split planning reads the conf lazily at execution time."""
        import os as _os
        from contextlib import contextmanager

        @contextmanager
        def _cm():
            path = cat.table_path(name)
            total = sum(
                _os.path.getsize(_os.path.join(path, f))
                for f in _os.listdir(path)
                if f.endswith(".parquet")
            )
            par = max(spark.sparkContext.defaultParallelism, 1)
            key = "spark.sql.files.maxPartitionBytes"
            default = spark.conf.get(key)
            default_bytes = (
                int(default[:-1]) if default.endswith("b") else int(default)
            )
            target = max(min(total // par or 1, default_bytes), 1 << 22)
            if target >= default_bytes:
                yield
                return
            spark.conf.set(key, str(target))
            try:
                yield
            finally:
                spark.conf.set(key, default)

        return _cm()


# ---------------------------------------------------------------------- #
CHUNK_POSTINGS = 4_000_000  # flush threshold: bounds builder task memory


def _segment_builder(docs_per_shard: int):
    """mapInPandas fn: forward-index partition -> encoded posting segments.

    Map-side combine done by hand: the (doc_id, term, tf) explosion stays
    inside this task; only (term, shard)-keyed compressed segments leave.
    Postings are flushed in ~CHUNK_POSTINGS chunks (doc ranges are
    contiguous per chunk, so delta gaps stay small) — the Lucene
    per-flush-segment model; peak task memory is O(chunk), not
    O(partition), which matters both at scale and on hosts where large
    anonymous allocations trigger compaction stalls."""

    def _encode_chunk(pid, d, l, t, f):
        shards = d // docs_per_shard
        # group by (term, shard), docs ascending inside each run; factorize
        # + lexsort keeps everything in C
        codes, uniq_terms = pd.factorize(t, sort=False)
        order = np.lexsort((d, shards, codes))
        d, l, f = d[order], l[order], f[order]
        codes, shards = codes[order], shards[order]
        change = np.flatnonzero(
            (np.diff(codes) != 0) | (np.diff(shards) != 0)
        )
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [codes.size]))
        # ONE varbyte pass over the whole partition, then per-run byte
        # slicing — a per-run encode call is numpy-fixed-cost bound at
        # ~vocab_size runs per partition (measured ~3x slower stage)
        gaps = np.empty(d.size, dtype=np.uint64)
        gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
        gaps[starts] = (d[starts] + 1).astype(np.uint64)  # run-start reset
        doc_buf, doc_len = codec.varbyte_encode_with_lengths(gaps)
        tf_buf, tf_len = codec.varbyte_encode_with_lengths(f.astype(np.uint64))
        dl_buf, dl_len = codec.varbyte_encode_with_lengths(l.astype(np.uint64))
        doc_cum = np.concatenate(([0], np.cumsum(doc_len)))
        tf_cum = np.concatenate(([0], np.cumsum(tf_len)))
        dl_cum = np.concatenate(([0], np.cumsum(dl_len)))
        cf_all = np.add.reduceat(f, starts)
        s_l, e_l = starts.tolist(), ends.tolist()
        return pd.DataFrame(
            {
                "term": uniq_terms[codes[starts]],
                "shard": shards[starts],
                "pid": np.full(starts.size, pid, dtype=np.int32),
                "df": ends - starts,
                "cf": cf_all,
                "min_doc": d[starts],
                "max_doc": d[ends - 1],
                "doc_ids_enc": [
                    doc_buf[doc_cum[s] : doc_cum[e]] for s, e in zip(s_l, e_l)
                ],
                "tfs_enc": [
                    tf_buf[tf_cum[s] : tf_cum[e]] for s, e in zip(s_l, e_l)
                ],
                "dls_enc": [
                    dl_buf[dl_cum[s] : dl_cum[e]] for s, e in zip(s_l, e_l)
                ],
            }
        )

    COLS = (
        "term", "shard", "pid", "df", "cf", "min_doc", "max_doc",
        "doc_ids_enc", "tfs_enc", "dls_enc",
    )

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        doc_parts, dl_parts, term_parts, tf_parts = [], [], [], []
        pending = 0
        emitted = False

        def flush():
            d = np.concatenate(doc_parts)
            l = np.concatenate(dl_parts)
            t = np.concatenate(term_parts)
            f = np.concatenate(tf_parts)
            doc_parts.clear(); dl_parts.clear()
            term_parts.clear(); tf_parts.clear()
            return _encode_chunk(pid, d, l, t, f)

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
                    [np.asarray(x, dtype=object) for x in batch["terms"] if len(x)]
                )
            )
            tf_parts.append(
                np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in batch["tfs"] if len(x)]
                )
            )
            pending += int(lens.sum())
            if pending >= CHUNK_POSTINGS:
                emitted = True
                pending = 0
                yield flush()
        if doc_parts:
            yield flush()
        elif not emitted:
            yield pd.DataFrame({k: [] for k in COLS})

    return build


POS_POSTINGS_SCHEMA = T.StructType(
    [
        T.StructField("term", T.StringType()),
        T.StructField("shard", T.LongType()),
        T.StructField("pid", T.IntegerType()),
        T.StructField("df", T.LongType()),
        T.StructField("min_doc", T.LongType()),
        T.StructField("max_doc", T.LongType()),
        T.StructField("doc_ids_enc", T.BinaryType()),
        T.StructField("dls_enc", T.BinaryType()),
        T.StructField("pos_lens_enc", T.BinaryType()),
        T.StructField("pos_enc", T.BinaryType()),
    ]
)


def _pos_segment_builder(docs_per_shard: int, analyzer):
    """mapInPandas fn: (doc_id, _text) partition -> encoded
    position-carrying posting segments, one row per (term, shard) of the
    partition. Tokenization (token_stream: full-stream positions with
    stopword holes, the Lucene StopFilter contract) runs INSIDE this one
    python stage; dl = Σ per-term position counts = the analyzed token
    count BM25 uses. Accumulation is flat python lists + one NumPy
    conversion per partition — no per-row array churn."""

    def build(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        # flat (doc, term) rows for the whole partition; rows arrive
        # doc-sorted, so per-run doc ids stay ascending
        docs: list[int] = []
        terms: list[str] = []
        plens: list[int] = []
        flat_pos: list[int] = []
        row_off: list[int] = []  # start offset of each row's positions
        dls: list[int] = []
        for pdf in batches:
            for doc, text in zip(pdf["doc_id"], pdf["_text"]):
                acc: dict[str, list[int]] = {}
                for term, pos, _s, _e in analyzer.token_stream(text):
                    acc.setdefault(term, []).append(pos)
                dl = sum(len(v) for v in acc.values())
                for tm, ps in acc.items():
                    docs.append(int(doc))
                    terms.append(tm)
                    plens.append(len(ps))
                    row_off.append(len(flat_pos))
                    flat_pos.extend(ps)
                    dls.append(dl)
        if not docs:
            return
        d = np.asarray(docs, dtype=np.int64)
        l = np.asarray(dls, dtype=np.int64)
        pl = np.asarray(plens, dtype=np.int64)
        off = np.asarray(row_off, dtype=np.int64)
        fp = np.asarray(flat_pos, dtype=np.int64)
        shards = d // docs_per_shard
        codes, uniq_terms = pd.factorize(pd.Index(terms), sort=False)
        order = np.lexsort((d, shards, codes))
        d, l, pl, off = d[order], l[order], pl[order], off[order]
        codes, shards = codes[order], shards[order]
        change = np.flatnonzero((np.diff(codes) != 0) | (np.diff(shards) != 0))
        starts = np.concatenate(([0], change + 1))
        ends = np.concatenate((change + 1, [codes.size]))
        # gather reordered positions in ONE fancy-index pass: for each
        # (reordered) row, its pl values starting at off
        gather = np.repeat(off, pl) + (
            np.arange(int(pl.sum()), dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(pl[:-1]))), pl)
        )
        fp_sorted = fp[gather]
        pstarts = np.concatenate(([0], np.cumsum(pl)))
        rows = []
        for s, e in zip(starts.tolist(), ends.tolist()):
            run_d = d[s:e]
            run_pl = pl[s:e]
            flat = fp_sorted[pstarts[s] : pstarts[e]]
            rows.append(
                {
                    "term": uniq_terms[codes[s]],
                    "shard": int(shards[s]),
                    "pid": pid,
                    "df": e - s,
                    "min_doc": int(run_d[0]),
                    "max_doc": int(run_d[-1]),
                    "doc_ids_enc": codec.encode_doc_ids(run_d),
                    "dls_enc": codec.encode_tfs(l[s:e]),
                    "pos_lens_enc": codec.encode_tfs(run_pl),
                    "pos_enc": codec.encode_positions(flat, run_pl),
                }
            )
        yield pd.DataFrame(rows)

    return build


def _segment_merger(avgdl: float):
    """mapInPandas fn over a partition hash-keyed by (term, shard) and
    sorted by (term, shard, min_doc): merges each run of same-key segments
    into one globally doc_id-sorted posting row with exact per-block BM25
    max impacts.

    impact(tf, dl) = tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl)) — score =
    idf * impact, so block upper bound = idf * max_impact is tight.

    All numeric work is BULK per Arrow batch (one concat varbyte decode,
    one lexsort ordering every run's postings at once, one varbyte
    re-encode sliced per run) — a per-run decode/encode loop is
    numpy-fixed-cost bound at ~10^5 runs per partition. The only carry
    across batches is the last (possibly incomplete) run's decoded
    arrays, so memory stays O(batch + one posting list)."""

    COLS = (
        "term", "shard", "df", "cf", "min_doc", "max_doc",
        "doc_ids_enc", "tfs_enc", "dls_enc", "block_max",
    )

    def _process(
        terms: np.ndarray,
        shards: np.ndarray,
        d: np.ndarray,
        f: np.ndarray,
        l: np.ndarray,
        row_df: np.ndarray,
    ) -> pd.DataFrame:
        """terms/shards per ROW (segments, same-key rows adjacent); d/f/l
        flat decoded values; row_df = values per row. Emits one output row
        per (term, shard) run."""
        n_rows = terms.size
        # run boundaries over rows
        same = np.zeros(n_rows, dtype=bool)
        if n_rows > 1:
            same[1:] = (terms[1:] == terms[:-1]) & (shards[1:] == shards[:-1])
        run_starts = np.flatnonzero(~same)
        run_id_of_row = np.cumsum(~same) - 1
        # flat value -> run id, then ONE lexsort orders every run by doc_id
        run_of_val = np.repeat(run_id_of_row, row_df)
        order = np.lexsort((d, run_of_val))
        d, f, l = d[order], f[order], l[order]
        run_of_val = run_of_val[order]  # still non-decreasing
        vstarts = np.concatenate(
            ([0], 1 + np.flatnonzero(np.diff(run_of_val) != 0))
        )
        vends = np.concatenate((vstarts[1:], [d.size]))
        impact = f * (K1 + 1.0) / (f + K1 * (1.0 - B + B * l / (avgdl or 1.0)))
        # bulk re-encode with per-run gap resets
        gaps = np.empty(d.size, dtype=np.uint64)
        gaps[1:] = (d[1:] - d[:-1]).astype(np.uint64)
        gaps[vstarts] = (d[vstarts] + 1).astype(np.uint64)
        doc_buf, doc_len = codec.varbyte_encode_with_lengths(gaps)
        tf_buf, tf_len = codec.varbyte_encode_with_lengths(f.astype(np.uint64))
        dl_buf, dl_len = codec.varbyte_encode_with_lengths(l.astype(np.uint64))
        doc_cum = np.concatenate(([0], np.cumsum(doc_len)))
        tf_cum = np.concatenate(([0], np.cumsum(tf_len)))
        dl_cum = np.concatenate(([0], np.cumsum(dl_len)))
        # per-block skip metadata: global block starts never cross runs
        bsz = codec.BLOCK_SIZE
        blk_starts = np.concatenate(
            [np.arange(s, e, bsz) for s, e in zip(vstarts.tolist(), vends.tolist())]
        )
        blk_ends = np.concatenate((blk_starts[1:], [d.size]))
        blk_max = np.maximum.reduceat(impact, blk_starts)
        blk_last = d[blk_ends - 1]
        blocks_per_run = (vends - vstarts + bsz - 1) // bsz
        blk_run_cum = np.concatenate(([0], np.cumsum(blocks_per_run)))
        # one flat dict build, then per-run slicing — the nested
        # per-run/per-block loop was the stage's python hot spot
        flat = [
            {"last_doc": ld, "max_impact": mi}
            for ld, mi in zip(blk_last.tolist(), blk_max.tolist())
        ]
        cum = blk_run_cum.tolist()
        block_lists = [
            flat[a:b] for a, b in zip(cum[:-1], cum[1:])
        ]
        s_l, e_l = vstarts.tolist(), vends.tolist()
        return pd.DataFrame(
            {
                "term": terms[run_starts],
                "shard": shards[run_starts],
                "df": vends - vstarts,
                "cf": np.add.reduceat(f, vstarts),
                "min_doc": d[vstarts],
                "max_doc": d[vends - 1],
                "doc_ids_enc": [
                    doc_buf[doc_cum[s] : doc_cum[e]] for s, e in zip(s_l, e_l)
                ],
                "tfs_enc": [
                    tf_buf[tf_cum[s] : tf_cum[e]] for s, e in zip(s_l, e_l)
                ],
                "dls_enc": [
                    dl_buf[dl_cum[s] : dl_cum[e]] for s, e in zip(s_l, e_l)
                ],
                "block_max": block_lists,
            }
        )

    def merge(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # carry: decoded values of the last (term, shard) run of the batch
        carry: tuple | None = None  # (term, shard, d, f, l)
        for pdf in batches:
            if pdf.empty:
                continue
            terms = pdf["term"].to_numpy(dtype=object)
            shards = pdf["shard"].to_numpy(dtype=np.int64)
            row_df = pdf["df"].to_numpy(dtype=np.int64)
            # bulk decode: concat buffers decode in one pass (varbyte is
            # self-delimiting); per-row gap resets are undone vectorized
            d_all = codec.varbyte_decode(
                b"".join(pdf["doc_ids_enc"])
            ).astype(np.int64)
            f_all = codec.varbyte_decode(b"".join(pdf["tfs_enc"])).astype(np.int64)
            l_all = codec.varbyte_decode(b"".join(pdf["dls_enc"])).astype(np.int64)
            vstarts = np.concatenate(([0], np.cumsum(row_df[:-1])))
            c = np.cumsum(d_all)
            base = c[vstarts] - d_all[vstarts]
            d_all = c - np.repeat(base, row_df) - 1  # undo gap+1 encoding
            if carry is not None:
                ct, cs, cd, cf_, cl = carry
                terms = np.concatenate(([ct], terms))
                shards = np.concatenate(([cs], shards))
                row_df = np.concatenate(([cd.size], row_df))
                d_all = np.concatenate((cd, d_all))
                f_all = np.concatenate((cf_, f_all))
                l_all = np.concatenate((cl, l_all))
                carry = None
            # hold back the trailing run (may continue in the next batch)
            last_key_rows = (terms == terms[-1]) & (shards == shards[-1])
            # rows are key-sorted, so the trailing same-key rows are a suffix
            n_tail = int(last_key_rows[::-1].cumprod().sum())
            tail_vals = int(row_df[-n_tail:].sum())
            carry = (
                terms[-1],
                int(shards[-1]),
                d_all[-tail_vals:],
                f_all[-tail_vals:],
                l_all[-tail_vals:],
            )
            if terms.size > n_tail:
                yield _process(
                    terms[:-n_tail],
                    shards[:-n_tail],
                    d_all[:-tail_vals],
                    f_all[:-tail_vals],
                    l_all[:-tail_vals],
                    row_df[:-n_tail],
                )
        if carry is not None:
            ct, cs, cd, cf_, cl = carry
            yield _process(
                np.array([ct], dtype=object),
                np.array([cs], dtype=np.int64),
                cd,
                cf_,
                cl,
                np.array([cd.size], dtype=np.int64),
            )

    return merge


def build_index(
    spark_df: DataFrame,
    index_dir: str,
    analyzer: Analyzer | None = None,
    *,
    materialize_forward: bool = True,
    store_term_vectors: bool = False,
    **kwargs,
) -> IndexCatalog:
    """Convenience wrapper: IndexBuilder dataclass options (sort_cols,
    keyword_fields, store_positions, ...) pass straight through as
    kwargs alongside build()-call options (resume, fail_after_stage) —
    split by the dataclass field set, so GenerationLog.ingest and the
    streaming sinks can forward either kind."""
    field_names = {f.name for f in fields(IndexBuilder)}
    builder_kwargs = {k: v for k, v in kwargs.items() if k in field_names}
    build_kwargs = {k: v for k, v in kwargs.items() if k not in field_names}
    return IndexBuilder(
        analyzer=analyzer or STANDARD_ANALYZER,
        materialize_forward=materialize_forward,
        store_term_vectors=store_term_vectors,
        **builder_kwargs,
    ).build(spark_df, index_dir, **build_kwargs)


def build_index_from_schema(
    spark_df: DataFrame,
    index_dir: str,
    schema,
    field: str = "text",
    **kwargs,
) -> IndexCatalog:
    """Schema-driven build: the field's declared analyzer drives
    tokenization and its termVectors/termPositions/termOffsets flags opt
    into the term_vectors table — the rebuild of LuceneIndexingProcessor's
    cells->schema-fields mapping + IWriter's per-field analyzer dispatch
    (/root/reference/app/org/nlp4l/framework/builtin/lucene/
    LuceneIndexingProcessor.scala:79-110, Schema.perFieldAnalyzer
    Schema.scala:50-52). ``schema`` is an analysis.Schema (load_schema)."""
    ft = schema.field_type(field)
    return IndexBuilder(
        analyzer=ft.analyzer,
        text_col=field,
        store_term_vectors=(
            ft.term_vectors or ft.term_positions or ft.term_offsets
        ),
        # termPositions also rides positions INSIDE the posting shards
        # (Lucene: positions live in the postings; term vectors are the
        # separate forward index) so schema-built indexes get the
        # no-join phrase scale path too
        store_positions=ft.term_positions,
    ).build(spark_df, index_dir, **kwargs)
