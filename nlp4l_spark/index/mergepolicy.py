"""Tiered merge policy + generation compaction: log-structured index
maintenance for incremental ingestion at scale.

Reference semantics (what, not how): the reference writes through
Lucene's IndexWriter (IWriter.scala:56-72, forceMerge :66-71), whose
background maintenance is TieredMergePolicy — segments accumulate per
flush, and the policy merges roughly-equal-size tiers so the segment
count stays O(segs_per_tier * log(corpus/floor)) while merge I/O stays
amortized-linear. forceMerge(1) is the degenerate "one tier" case the
reference exposes; this module adds the general policy.

Rebuild shape: a *generation* here is a whole built index directory
(one `append`/micro-batch each — the builder's flush unit). Query-time
federation over generations is `MultiSearcher` (exact blended-stats
BM25, rank+score identical to one big index — tests/test_multisearcher).
`TieredMergePolicy.find_merges` decides which generations to compact;
`compact` rebuilds one merged index FROM THE RETAINED FORWARD INDEXES
(doc_terms_fwd), so compaction never re-tokenizes: it is one
segment-encode pass + the standard (term, shard) segment merge — the
same two stages, and the same economics, as Lucene's segment merge
(decode postings, interleave, re-encode; no analysis).

Deviation from Lucene, documented: Lucene scores candidate merge
windows by skew/size/reclaim and searches over a sorted-by-size view;
this policy deterministically groups the `max_merge_at_once` smallest
live generations (classic tiered behavior, reproducible under test).
The tier budget (`allowed_segment_count`) follows Lucene's level walk.

At 100 TB: generations are independent directories, compaction of one
group touches only that group's bytes, and the policy bounds live
generations logarithmically — ingestion never pays forceMerge(1)'s
rewrite-the-world cost, and searches fan out over a bounded dir list.
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import SparkSession, functions as F

from nlp4l_spark.index import codec
from nlp4l_spark.index.builder import (
    POS_POSTINGS_SCHEMA,
    POSTINGS_SCHEMA,
    SEGMENT_SCHEMA,
    _segment_builder,
    _segment_merger,
)
from nlp4l_spark.index.catalog import IndexCatalog


@dataclass(frozen=True)
class TieredMergePolicy:
    """Lucene-style tiered merge selection over generation sizes."""

    segs_per_tier: float = 10.0
    max_merge_at_once: int = 10
    floor_segment_bytes: int = 2 * 1024 * 1024
    max_merged_segment_bytes: int = 5 * 1024**3

    def _floored(self, b: int) -> int:
        return max(int(b), self.floor_segment_bytes)

    def allowed_segment_count(self, sizes: list[int]) -> int:
        """Lucene's tier-budget walk: each tier holds segs_per_tier
        segments of the current level size; levels grow by
        max_merge_at_once until the max merged size caps them."""
        if not sizes:
            return 0
        floored = [self._floored(b) for b in sizes]
        remaining = float(sum(floored))
        level = float(min(floored))
        allowed = 0.0
        while True:
            seg_count_level = remaining / level
            if (
                seg_count_level < self.segs_per_tier
                or level >= self.max_merged_segment_bytes
            ):
                allowed += math.ceil(seg_count_level)
                break
            allowed += self.segs_per_tier
            remaining -= self.segs_per_tier * level
            level = min(
                float(self.max_merged_segment_bytes),
                level * self.max_merge_at_once,
            )
        return max(int(allowed), 1)

    def find_merges(self, sizes: dict[str, int]) -> list[list[str]]:
        """Merge specs (each a sorted list of generation names) that
        bring the projected generation count within the tier budget.
        Greedy smallest-first groups of <= max_merge_at_once inputs,
        capped by max_merged_segment_bytes (a group may exceed the cap
        only if it would otherwise be a singleton). Deterministic:
        ties break on name."""
        live = {k: int(v) for k, v in sizes.items()}
        merges: list[list[str]] = []
        while len(live) > 1:
            allowed = self.allowed_segment_count(list(live.values()))
            if len(live) <= allowed:
                break
            cand = sorted(live.items(), key=lambda kv: (kv[1], kv[0]))
            group: list[str] = []
            acc = 0
            for name, b in cand:
                if len(group) >= self.max_merge_at_once:
                    break
                if group and acc + b > self.max_merged_segment_bytes:
                    break
                group.append(name)
                acc += b
            if len(group) < 2:
                break
            merges.append(sorted(group))
            for name in group:
                del live[name]
            live["+".join(sorted(group))] = acc
        return merges


def index_size_bytes(index_dir: str) -> int:
    """On-disk bytes of a built index directory (the policy's size
    signal — parquet bytes, manifest files included; cheap stat walk)."""
    total = 0
    for root, _dirs, files in os.walk(index_dir):
        for f in files:
            try:
                total += os.path.getsize(os.path.join(root, f))
            except OSError:
                pass
    return total


def _rebase_pos_rows(base: int, docs_per_shard: int):
    """mapInPandas fn over ONE generation's pos_postings: shift docIDs by
    the generation's docBase and recompute shard ownership, splitting the
    (rare) row whose rebased doc range crosses a shard boundary.

    This is the Lucene merge economics for positions: no re-analysis —
    only the docID gaps change. Fast path (almost every row): the rebased
    range stays in one shard, so the per-doc-reset dls/pos_lens/pos
    buffers are byte-identical and pass through untouched; only the
    docID buffer re-encodes (its first gap carries the absolute docID).
    Rows here are (term, shard, pid) segments — vocab-sized, not
    corpus-sized — and the work per row is one varbyte decode/encode."""

    cols = [f.name for f in POS_POSTINGS_SCHEMA.fields]
    return _rebase_pos_rows_masked(base, docs_per_shard, None, cols)


def _rebase_pos_rows_masked(
    base: int, docs_per_shard: int, deleted, cols=None
):
    """_rebase_pos_rows plus a live-docs mask: rows touching a
    tombstoned (generation-local) docID take the decode path and drop
    that doc's postings — Lucene's merge-expunges-deletions contract."""
    cols = cols or [f.name for f in POS_POSTINGS_SCHEMA.fields]
    dels = (
        np.asarray(sorted(deleted), dtype=np.int64)
        if deleted
        else None
    )

    def run(batches):
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}

            def emit(term, shard, pid, d, dls_enc, pl_enc, pos_enc):
                out["term"].append(term)
                out["shard"].append(int(shard))
                out["pid"].append(pid)
                out["df"].append(int(d.size))
                out["min_doc"].append(int(d[0]))
                out["max_doc"].append(int(d[-1]))
                out["doc_ids_enc"].append(codec.encode_doc_ids(d))
                out["dls_enc"].append(dls_enc)
                out["pos_lens_enc"].append(pl_enc)
                out["pos_enc"].append(pos_enc)

            for r in pdf.itertuples(index=False):
                d_local = codec.decode_doc_ids(r.doc_ids_enc)
                live = (
                    ~np.isin(d_local, dels)
                    if dels is not None
                    else None
                )
                d = d_local + base
                if live is not None and not live.all():
                    d = d[live]
                    if d.size == 0:
                        continue  # every doc in this row was deleted
                elif live is not None:
                    live = None  # no overlap: fast path still valid
                s0, s1 = d[0] // docs_per_shard, d[-1] // docs_per_shard
                if s0 == s1 and live is None:  # fast path: buffers unchanged
                    emit(r.term, s0, r.pid, d,
                         r.dls_enc, r.pos_lens_enc, r.pos_enc)
                    continue
                dls = codec.decode_tfs(r.dls_enc)
                pl = codec.decode_tfs(r.pos_lens_enc)
                flat = codec.decode_positions(r.pos_enc, pl)
                if live is not None:  # drop deleted docs' position runs
                    keep_pos = np.repeat(live, pl)
                    flat = flat[keep_pos]
                    dls, pl = dls[live], pl[live]
                pstarts = np.zeros(pl.size + 1, dtype=np.int64)
                np.cumsum(pl, out=pstarts[1:])
                s = d // docs_per_shard
                bnds = np.concatenate(
                    ([0], 1 + np.flatnonzero(np.diff(s) != 0), [d.size])
                )
                for a, b in zip(bnds[:-1].tolist(), bnds[1:].tolist()):
                    emit(
                        r.term, s[a], r.pid, d[a:b],
                        codec.encode_tfs(dls[a:b]),
                        codec.encode_tfs(pl[a:b]),
                        codec.encode_positions(
                            flat[pstarts[a]:pstarts[b]], pl[a:b]
                        ),
                    )
            yield pd.DataFrame(out)

    return run


def compact(
    spark: SparkSession,
    index_dirs: list[str],
    out_dir: str,
    *,
    docs_per_shard: int = 1 << 24,
    text_col: str = "text",
) -> IndexCatalog:
    """Merge K built index generations into ONE new index directory.

    DocIDs are rebased by each generation's docBase (cumulative
    num_docs in list order — the MultiSearcher/MultiReader numbering),
    so `Searcher(compacted)` is rank-, score- AND docID-identical to
    `MultiSearcher(index_dirs)` (tested). No re-tokenization: stored,
    doc_terms_fwd and doc_lens are rebased unions; postings are rebuilt
    from the forward index via the standard segment-encode +
    (term, shard)-merge stages. Requires the generations to have been
    built with materialize_forward=True (the default). Position shards
    (pos_postings) and term_vectors carry over WITHOUT re-analysis when
    every input generation has them: positions are doc-relative, so the
    rebase touches only docID gaps (see _rebase_pos_rows); term_vectors
    is a rebased union. If only some generations have an extra table it
    is dropped (the compacted index stays honest about its surface).

    Deletes: compaction EXPUNGES tombstoned docs and recomputes stats —
    Lucene's merge semantics (deleted docs leave; num_docs/df/avgdl
    refresh), so post-compact scores match a MultiSearcher over
    expunge_deletes'd inputs, NOT the frozen-stats pre-expunge view.
    Surviving docIDs keep their federation numbering (holes where
    deleted); no tombstones table is written to the output."""
    cats = [IndexCatalog(d) for d in index_dirs]
    for c, d in zip(cats, index_dirs):
        if not c.is_committed("doc_terms_fwd"):
            raise ValueError(
                f"compact needs a committed doc_terms_fwd in {d} "
                "(build with materialize_forward=True)"
            )
    # live-docs per generation: compaction EXPUNGES tombstoned docs
    # (Lucene merges drop deletions and recompute stats — the
    # forceMergeDeletes contract), while docBases stay the frozen
    # MultiSearcher numbering so surviving docIDs are unchanged (holes
    # where deleted — better than Lucene, which renumbers).
    tombs: list[set[int]] = []
    for c in cats:
        if c.is_committed("tombstones"):
            tombs.append(
                {
                    int(r[0])
                    for r in c.read(spark, "tombstones")
                    .select("doc_id")
                    .collect()
                }
            )
        else:
            tombs.append(set())
    bases: list[int] = []
    base = 0
    sum_dl = 0
    n_deleted = 0
    for c, t in zip(cats, tombs):
        bases.append(base)
        counters = c.manifest("doc_lens")["counters"]
        base += int(counters["num_docs"])
        sum_dl += int(counters["sum_dl"])
        n_deleted += len(t)
        if t:  # subtract the tombstoned docs' lengths (pushed-In scan)
            dropped = (
                c.read(spark, "doc_lens")
                .filter(F.col("doc_id").isin([int(x) for x in t]))
                .agg(F.sum("dl"))
                .collect()[0][0]
            )
            sum_dl -= int(dropped or 0)
    num_docs = base - n_deleted

    def _live(df, t):
        if not t:
            return df
        return df.filter(~F.col("doc_id").isin([int(x) for x in t]))

    out = IndexCatalog(out_dir)

    stored = None
    for c, b, t in zip(cats, bases, tombs):
        s = _live(c.read(spark, "stored"), t).withColumn(
            "doc_id", F.col("doc_id") + F.lit(b)
        )
        stored = s if stored is None else stored.unionByName(s)
    out.write(
        stored,
        "stored",
        sort_by=["doc_id"],
        # "expunged" declares docID holes (deleted docs keep their slot
        # number reserved) — check_index bounds instead of requiring
        # density when it is present
        counters={"num_docs": num_docs, "expunged": n_deleted},
    )

    fwd = None
    for c, b, t in zip(cats, bases, tombs):
        f_ = _live(c.read(spark, "doc_terms_fwd"), t).withColumn(
            "doc_id", F.col("doc_id") + F.lit(b)
        )
        fwd = f_ if fwd is None else fwd.unionByName(f_)
    out.write(fwd, "doc_terms_fwd", sort_by=["doc_id"])
    fwd_c = out.read(spark, "doc_terms_fwd")
    out.write(
        fwd_c.select("doc_id", "dl"),
        "doc_lens",
        sort_by=["doc_id"],
        counters={"num_docs": num_docs, "sum_dl": sum_dl},
    )

    segs = fwd_c.sortWithinPartitions("doc_id").mapInPandas(
        _segment_builder(docs_per_shard), SEGMENT_SCHEMA
    )
    out.write(segs, "segments")

    avgdl = sum_dl / num_docs if num_docs else 0.0
    merged = (
        out.read(spark, "segments")
        .repartition(spark.sparkContext.defaultParallelism, "term", "shard")
        .sortWithinPartitions("term", "shard", "min_doc")
        .mapInPandas(_segment_merger(avgdl), POSTINGS_SCHEMA)
    )
    out.write(merged, "postings", sort_by=["term"])
    postings = out.read(spark, "postings")
    out.write(
        postings.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("cf").alias("cf"))
        .withColumn("tlen", F.length("term").cast("int")),
        "term_stats",
        sort_by=["term"],
    )
    uniq = out.row_count("term_stats")
    out.write(
        spark.createDataFrame(
            [(text_col, num_docs, sum_dl, avgdl, uniq)],
            "field string, num_docs long, sum_dl long, avgdl double, "
            "uniq_terms long",
        ),
        "field_stats",
    )

    if all(c.is_committed("pos_postings") for c in cats):
        pos = None
        for c, b, t in zip(cats, bases, tombs):
            p = (
                c.read(spark, "pos_postings")
                .mapInPandas(
                    _rebase_pos_rows_masked(b, docs_per_shard, t),
                    POS_POSTINGS_SCHEMA,
                )
            )
            pos = p if pos is None else pos.unionByName(p)
        out.write(pos, "pos_postings", sort_by=["term"])

    if all(c.is_committed("term_vectors") for c in cats):
        tv = None
        for c, b, t in zip(cats, bases, tombs):
            t_ = _live(c.read(spark, "term_vectors"), t).withColumn(
                "doc_id", F.col("doc_id") + F.lit(b)
            )
            tv = t_ if tv is None else tv.unionByName(t_)
        out.write(tv, "term_vectors", sort_by=["doc_id"])
    return out


def maintain(
    spark: SparkSession,
    index_dirs: list[str],
    out_parent: str,
    policy: TieredMergePolicy | None = None,
    *,
    docs_per_shard: int = 1 << 24,
) -> list[str]:
    """One maintenance round: measure generation sizes, ask the policy,
    compact each selected group into a fresh generation under
    out_parent, and return the new live generation list (surviving
    dirs in their original order, then merged dirs). Idempotent per
    round; callers own deleting the consumed input dirs after the
    returned list is adopted (two-phase swap, like Lucene's commit
    then-delete segment files)."""
    policy = policy or TieredMergePolicy()
    sizes = {d: index_size_bytes(d) for d in index_dirs}
    merges = policy.find_merges(sizes)
    merged_members = {d for g in merges for d in g}
    result = [d for d in index_dirs if d not in merged_members]
    for i, group in enumerate(merges):
        ordered = [d for d in index_dirs if d in group]
        out_dir = os.path.join(out_parent, f"merged_{i:03d}")
        compact(spark, ordered, out_dir, docs_per_shard=docs_per_shard)
        result.append(out_dir)
    return result
