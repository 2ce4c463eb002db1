"""Deduplication suite for large-scale training-data pipelines.

Not present in the reference (its UniqueProcessor is exact key-dedup only,
FeaturedProcessors.scala:61-92); these are the standard web-scale document
dedup algorithms, each expressed so the heavy lifting stays JVM-side:

* exact       — normalize -> xxhash64 -> keep first per hash (one shuffle)
* minhash_lsh — shingle -> 64-perm minhash (array HOFs over xxhash64,
                zero Python) -> band buckets -> candidate pairs within
                buckets -> exact Jaccard verify. At 100 TB the only wide
                ops are the band-bucket exchange and the verify join,
                both on candidate pairs (<< corpus).
* simhash     — 64-bit sign-sum fingerprint from md5-derived token hashes,
                entirely JVM-side (explode + one 64-sum groupBy, zero
                Python, and SQL-oracle reproducible); near-dups = pairs
                within Hamming distance d found by piece-table join
                (Charikar/Manku-style 4-piece blocking, complete for d<=3).
* ngram_jaccard — direct shingle-set Jaccard on candidate pairs that share
                a shingle (exact, for small/medium corpora or as verifier).
* duplicate_spans — exact maximal shared token runs (Lee et al. 2022
                suffix-array dedup semantics) via n-gram anchors merged
                along alignment diagonals; all joins equality-keyed.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

from nlp4l_spark.analysis import Analyzer, WHITESPACE_ANALYZER


def _norm_text(col: str):
    """Normalization for exact dedup: lowercase + collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(F.col(col))), r"\s+", " ")


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the lowest-id document per normalized-text hash."""
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("_h", F.xxhash64(_norm_text(text_col)))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_h", "_rn")
    )


def shingles_col(text_col: str, n: int = 3, analyzer: Analyzer | None = None):
    """array<string> of word n-gram shingles (distinct), all built-ins.
    NB: Spark evaluates the nested transform/slice/concat_ws HOFs
    INTERPRETED (measured ~7 s for a 5k-doc scan) — the hot paths use
    ``shingles_udf`` below (identical output, one Arrow pass); this stays
    as the declarative/SQL-twin form."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    toks = analyzer.tokens_expr(text_col)
    # slide a window of n over the token array via transform+sequence
    return F.array_distinct(
        F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", toks)))
    )


def shingles_udf(n: int = 3, analyzer: Analyzer | None = None):
    """Arrow UDF: text -> array<string> of distinct word n-gram shingles —
    byte-identical output to ``shingles_col`` (same analyzer, same
    ' '-join), one vectorized pass instead of interpreted nested HOFs."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    tokenize = analyzer.tokenize

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _sh(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tokenize(t)
            if len(toks) >= n:
                seen = dict.fromkeys(
                    " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
                )
                out.append(list(seen))
            else:
                out.append([" ".join(toks)])
        return pd.Series(out)

    return _sh


_MERSENNE61 = (1 << 61) - 1


def _perm_params(num_hashes: int, seed: int = 42):
    """Deterministic (a, b) pairs for the universal-hash permutation family
    h_j(x) = (a_j*x + b_j) mod (2^61-1) — counter-based, platform-stable."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE61, size=num_hashes, dtype=np.int64)
    b = rng.randint(0, _MERSENNE61, size=num_hashes, dtype=np.int64)
    return a, b


def minhash_signature_udf(num_hashes: int = 64):
    """pandas UDF array<long> (xxhash64'd shingles) -> array<long> signature.

    The shingle -> 64-bit hash step stays JVM-side (one codegen'd
    ``transform``); the 64-permutation min is one NumPy broadcast per Arrow
    batch — O(num_hashes x shingles) multiplies, no interpreted nested HOFs
    (Spark evaluates nested lambda HOFs interpretively, which is ~100x
    slower than this path)."""
    a, b = _perm_params(num_hashes)
    a_u = a.astype(np.uint64)
    b_u = b.astype(np.uint64)
    mod = np.uint64(_MERSENNE61)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _sig(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(np.full(num_hashes, np.iinfo(np.int64).max).tolist())
                continue
            x = np.asarray(h, dtype=np.int64).astype(np.uint64) & mod
            # (num_hashes, n_shingles) broadcast; wraparound mul is fine for
            # a hash family (deterministic, well-mixed)
            vals = (a_u[:, None] * x[None, :] + b_u[:, None]) % mod
            out.append(vals.min(axis=1).astype(np.int64).tolist())
        return pd.Series(out)

    return _sig


def hashed_shingles_col(text_col: str, n: int = 3, analyzer: Analyzer | None = None):
    """array<long> of xxhash64'd distinct shingles (JVM-side)."""
    return F.transform(
        shingles_col(text_col, n, analyzer), lambda x: F.xxhash64(x)
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b) with exact Jaccard >= threshold,
    candidates generated by MinHash-LSH banding.

    Plan shape: per-doc signature (narrow) -> explode to (band, band_hash)
    keys (bands x rows, still narrow) -> shuffle on band buckets ->
    self-join within buckets -> distinct pairs -> Jaccard verify join.
    """
    rows = num_hashes // bands
    sig = minhash_signature_udf(num_hashes)
    # shingles once via the Arrow UDF (interpreted-HOF shingling measured
    # ~7s/5k docs); hash them with a FLAT xxhash64 transform so signature
    # inputs are bit-identical to the declarative path
    with_sh = df.select(
        F.col(id_col).alias("id"),
        shingles_udf(shingle_n)(F.col(text_col)).alias("_sh"),
    )
    with_sig = with_sh.withColumn(
        "_sig", sig(F.transform(F.col("_sh"), lambda x: F.xxhash64(x)))
    ).persist()  # referenced by banding AND verify; don't recompute the UDF
    banded = with_sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.xxhash64(
                    F.concat_ws(",", F.slice(F.col("_sig"), b * rows + 1, rows)), b
                ),
            )
        ).alias("band", "bucket"),
    )
    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    sh = with_sig.select("id", "_sh")
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "_sh": "_sha"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "_sh": "_shb"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sha", "_shb"))
            / F.size(F.array_union("_sha", "_shb")),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    # materialize the (near-dup-pair-sized) result, then release the
    # corpus-sized signature cache — repeated calls leak nothing
    verified = verified.localCheckpoint(eager=True)
    with_sig.unpersist()
    return verified


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    shingle_n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = 500,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: candidates = pairs sharing >= 1
    *discriminative* shingle (inverted-index join on shingle), then exact
    verify. SQL-expressible end-to-end -> used as the DuckDB-checkable
    oracle twin of minhash_lsh_pairs.

    ``max_shingle_df`` drops shingles appearing in more than that many docs
    from the shingle universe entirely (sets, intersection and union alike,
    so the result is a true Jaccard over the discriminative-shingle
    universe): a head shingle with df=d alone contributes O(d^2) candidate
    pairs, the classic quadratic blowup of inverted-index joins, while
    carrying no similarity signal. The oracle SQL applies the identical
    filter."""
    sh = df.select(
        F.col(id_col).alias("id"),
        shingles_udf(shingle_n)(F.col(text_col)).alias("_sh"),
    )
    # persist: the shingle explode feeds the df-filter, BOTH sides of the
    # self-join, and the per-doc counts — without a cache the shingle UDF
    # would be evaluated 4x. Released after the (near-dup-pair-sized)
    # result is materialized below — repeated calls leak nothing.
    # Shingle identity is the 64-bit xxhash64 of the shingle string: the
    # cache, the df groupBy and the self-join all move 8-byte longs
    # instead of ~25-byte strings (measured ~25% off the join stage).
    # Distinct shingles n collide with probability ~n^2/2^65 —
    # deterministic for a fixture and negligible at any realistic n.
    inv_raw = (
        sh.select("id", F.explode("_sh").alias("_s"))
        .select("id", F.xxhash64("_s").alias("shingle"))
        .persist()
    )
    inv = inv_raw
    if max_shingle_df is not None:
        rare = (
            inv.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_shingle_df)
            .select("shingle")
        )
        inv = inv.join(rare, "shingle")
    # |A ∩ B| straight off the inverted-index join — one groupBy over the
    # candidate rows; full shingle arrays are never carried or intersected
    # (array_intersect per pair is the quadratic-cost trap here).
    inter = (
        inv.alias("a")
        .join(
            inv.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("_inter"))
    )
    cnt = inv.groupBy("id").agg(F.count("*").alias("_c"))
    out = (
        inter.join(cnt.withColumnsRenamed({"id": "id_a", "_c": "_ca"}), "id_a")
        .join(cnt.withColumnsRenamed({"id": "id_b", "_c": "_cb"}), "id_b")
        .withColumn(
            "jaccard",
            F.col("_inter") / (F.col("_ca") + F.col("_cb") - F.col("_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    out = out.localCheckpoint(eager=True)
    inv_raw.unpersist()
    return out


# ---------------- SimHash ------------------------------------------------ #
def simhash_fingerprints_arrow(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """(id, fp_hi, fp_lo) — bit-identical to ``simhash_fingerprints`` (the
    declarative 64-sum groupBy), computed in one Arrow pass: tokenize,
    md5-hash unique terms (hashlib md5 == Spark/DuckDB md5), NumPy bit
    votes. No shuffle at all (the groupBy path shuffles one 64-long row
    per doc); measured ~3x faster on the fixtures."""
    import hashlib

    analyzer = analyzer or WHITESPACE_ANALYZER
    tokenize = analyzer.tokenize

    @F.pandas_udf(T.StructType([
        T.StructField("fp_hi", T.LongType()),
        T.StructField("fp_lo", T.LongType()),
    ]))
    def _fp(texts: pd.Series) -> pd.DataFrame:
        his, los = [], []
        bit_idx = np.arange(32, dtype=np.uint64)
        for t in texts:
            toks = tokenize(t)
            if not toks:
                his.append(None)
                los.append(None)
                continue
            uniq, counts = np.unique(
                np.asarray(toks, dtype=object), return_counts=True
            )
            hx = [hashlib.md5(u.encode("utf-8")).hexdigest() for u in uniq]
            h_hi = np.array([int(h[:8], 16) for h in hx], dtype=np.uint64)
            h_lo = np.array([int(h[8:16], 16) for h in hx], dtype=np.uint64)
            out = []
            for hs in (h_hi, h_lo):
                bits = ((hs[:, None] >> bit_idx[None, :]) & np.uint64(1)).astype(
                    np.int64
                )
                votes = ((bits * 2 - 1) * counts[:, None]).sum(axis=0)
                fp = 0
                for b in np.flatnonzero(votes > 0):
                    fp |= 1 << int(b)
                out.append(fp)
            his.append(out[0])
            los.append(out[1])
        return pd.DataFrame({"fp_hi": his, "fp_lo": los})

    return (
        df.select(F.col(id_col).alias("id"), _fp(F.col(text_col)).alias("_f"))
        .select("id", F.col("_f.fp_hi").alias("fp_hi"), F.col("_f.fp_lo").alias("fp_lo"))
        .filter(F.col("fp_hi").isNotNull())
    )


def simhash_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """(id, fp_hi, fp_lo) — a 64-bit simhash as two 32-bit halves, entirely
    JVM-side: token hash = first/second 8 hex chars of md5(term) (both
    engines compute md5 identically, so the DuckDB oracle reproduces the
    fingerprint bit-for-bit), fingerprint bit b = sign of the tf-weighted
    ±1 vote sum over tokens. One explode + one groupBy with 64
    partial-aggregable sums — the shuffle moves one 64-long row per
    (doc, partition), and there is no Python anywhere."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    tf = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(analyzer.tokens_expr(text_col)).alias("term"),
        )
        .groupBy("id", "term")
        .agg(F.count("*").alias("tf"))
        .select(
            "id",
            "tf",
            F.conv(F.substring(F.md5("term"), 1, 8), 16, 10)
            .cast("long")
            .alias("_hi"),
            F.conv(F.substring(F.md5("term"), 9, 8), 16, 10)
            .cast("long")
            .alias("_lo"),
        )
    )

    def vote(src: str, b: int):
        bit = F.shiftright(F.col(src), b).bitwiseAND(F.lit(1))
        return F.sum(F.col("tf") * (bit * 2 - 1))

    votes = tf.groupBy("id").agg(
        *[vote("_hi", b).alias(f"h{b}") for b in range(32)],
        *[vote("_lo", b).alias(f"l{b}") for b in range(32)],
    )

    def fp(prefix: str):
        out = F.lit(0).cast("long")
        for b in range(32):
            out = out + F.when(
                F.col(f"{prefix}{b}") > 0, F.lit(1 << b).cast("long")
            ).otherwise(F.lit(0).cast("long"))
        return out

    return votes.select("id", fp("h").alias("fp_hi"), fp("l").alias("fp_lo"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    max_hamming: int = 3,
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Near-dup pairs by simhash Hamming distance <= max_hamming using
    4-piece blocking (Manku et al., WWW'07): candidates come from equality
    joins on 16-bit fingerprint pieces, never a cross join. By pigeonhole,
    any pair within distance 3 shares at least one of the 4 pieces — so for
    max_hamming <= 3 the output is EXACTLY the brute-force hamming-<=d pair
    set (the DuckDB oracle recomputes it as a cross join); for larger d it
    is the standard piece-blocking candidate recall."""
    # persist: BOTH sides of the self-join reference the fingerprints; the
    # Arrow path has no shuffle exchange Spark could reuse, so without the
    # cache the UDF would run twice. The cache is released before return:
    # the (near-dup-pair-sized, << corpus-sized) result is eagerly
    # materialized via localCheckpoint below, after which the
    # corpus-sized fingerprint blocks are unpersisted deterministically —
    # repeated calls do not accumulate cached fingerprint blocks.
    sh = simhash_fingerprints_arrow(df, text_col, id_col, analyzer).persist()
    pieces = sh.select(
        "id",
        "fp_hi",
        "fp_lo",
        F.posexplode(
            F.array(
                F.shiftright("fp_hi", 16).bitwiseAND(F.lit(0xFFFF)),
                F.col("fp_hi").bitwiseAND(F.lit(0xFFFF)),
                F.shiftright("fp_lo", 16).bitwiseAND(F.lit(0xFFFF)),
                F.col("fp_lo").bitwiseAND(F.lit(0xFFFF)),
            )
        ).alias("piece_idx", "piece"),
    )
    cand = (
        pieces.alias("a")
        .join(
            pieces.alias("b"),
            (F.col("a.piece_idx") == F.col("b.piece_idx"))
            & (F.col("a.piece") == F.col("b.piece"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.fp_hi").alias("hi_a"),
            F.col("a.fp_lo").alias("lo_a"),
            F.col("b.fp_hi").alias("hi_b"),
            F.col("b.fp_lo").alias("lo_b"),
        )
        .distinct()
    )
    out = (
        cand.withColumn(
            "hamming",
            (
                F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b")))
                + F.bit_count(F.col("lo_a").bitwiseXOR(F.col("lo_b")))
            ).cast("int"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )
    out = out.localCheckpoint(eager=True)
    sh.unpersist()
    return out


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """Connected components over a candidate-pair graph: turn pairwise
    near-dup evidence (minhash/simhash/ngram/winnow pairs) into dedup
    CLUSTERS, so a pipeline can keep one canonical doc per group —
    pairwise output alone under-deletes (a~b, b~c but not a~c).

    Output: (doc_id, cluster_id) for every node in the pair graph, where
    cluster_id = min doc_id reachable (the canonical survivor).

    Algorithm: min-label propagation with POINTER JUMPING — each round
    updates labels through both the edge set and the current label table
    (label-of-label), so convergence is O(log diameter) rounds, not
    O(diameter): the Spark rendering of large-star/small-star
    (Kiveris et al., "Connected Components in MapReduce", SOCC'14).
    Each round is two equi-joins + one groupBy on the NODE set (<< corpus
    — only docs that appear in a candidate pair), with a driver-side
    scalar convergence check. Near-dup components are shallow in
    practice, so this terminates in a handful of rounds."""
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
    )
    edges = edges.localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
    )
    prev_sum = None
    for _ in range(max_iter):
        # min neighbor label (via edges) ...
        via_edges = (
            edges.join(labels.withColumnRenamed("id", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("lbl").alias("nlbl"))
            .withColumnRenamed("src", "id")
        )
        # ... then jump: follow my own label's label (label-of-label)
        cand = (
            labels.join(via_edges, "id", "left")
            .select("id", F.least("lbl", F.coalesce("nlbl", "lbl")).alias("lbl"))
        )
        jump = (
            cand.alias("x")
            .join(
                cand.select(
                    F.col("id").alias("lbl"), F.col("lbl").alias("jlbl")
                ).alias("y"),
                "lbl",
                "left",
            )
            .select(
                F.col("id"), F.least("lbl", F.coalesce("jlbl", "lbl")).alias("lbl")
            )
        )
        new_labels = jump.localCheckpoint(eager=True)
        # labels only ever decrease, so the fixpoint test is "sum of
        # labels unchanged" — one tiny agg instead of a join + count
        s = new_labels.agg(F.sum("lbl")).first()[0]
        labels = new_labels
        if s == prev_sum:
            break
        prev_sum = s
    return labels.select(
        F.col("id").alias("doc_id"), F.col("lbl").alias("cluster_id")
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    seed_n: int = 6,
    min_len: int = 8,
    analyzer: Analyzer | None = None,
    max_gram_df: int | None = 1000,
    materialize: bool = True,
) -> DataFrame:
    """Maximal duplicated token spans between document pairs — the
    exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499), which builds
    a suffix array to find every duplicated substring >= 50 tokens.
    A monolithic suffix array doesn't distribute; this is the
    shuffle-friendly equivalent: anchor on ``seed_n``-gram equality and
    merge anchors into maximal spans.

    Exactness: any shared token run of length L >= seed_n between two
    docs yields seed matches at every offset, all on the same alignment
    diagonal (pos_a - pos_b) with consecutive pos_a — so the run-merge
    (the classic ``pos - row_number()`` island trick) recovers exactly
    the maximal shared span of length L. Every output row is a real
    shared span and every shared span >= min_len is output (subject to
    ``max_gram_df``, below).

    Output: (id_a, id_b, start_a, start_b, span_len) — 0-based token
    offsets of the maximal shared run in each doc, id_a < id_b, one row
    per alignment (a span repeated k times in doc B yields k rows, one
    per diagonal — each is a real duplicated passage).

    Scale shape: ONE tokenize pass -> (doc, pos, gram-hash) rows (the
    corpus's only wide data); candidate pairs come from an equality
    self-join on the 8-byte gram hash — never all-pairs; the island
    merge shuffles only candidate rows, keyed (id_a, id_b, diag).
    ``max_gram_df`` drops seed grams occurring more than that many times
    corpus-wide (boilerplate n-grams would alone contribute O(df^2) join
    rows while any span they anchor is found by its rarer neighbors
    unless the whole span is boilerplate); set None for the exact
    contract. Gram identity is xxhash64 (collisions ~n^2/2^65, same
    convention as ngram_jaccard_pairs).

    ``materialize=False`` skips the persist/eager-checkpoint pair (which
    caps the gram pass at one evaluation and releases the cache
    deterministically) and returns the lazy plan — for plan inspection.
    """
    az = analyzer or WHITESPACE_ANALYZER
    tk = az.tokens_expr(text_col)
    grams = F.when(
        F.size(tk) >= seed_n,
        F.transform(
            F.sequence(F.lit(1), F.size(tk) - (seed_n - 1)),
            lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tk, i, seed_n))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    pos_grams = df.select(
        F.col(id_col).alias("id"), F.posexplode(grams).alias("pos", "g")
    )  # posexplode is 0-based -> pos is already the token offset
    if materialize:
        # both sides of the self-join (and the df cap) read the gram rows
        pos_grams = pos_grams.persist()
    seeds = pos_grams
    if max_gram_df is not None:
        rare = (
            pos_grams.groupBy("g")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") <= max_gram_df)
            .select("g")
        )
        seeds = pos_grams.join(rare, "g")
    pairs = (
        seeds.alias("a")
        .join(
            seeds.alias("b"),
            (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.pos").alias("pa"),
            (F.col("a.pos") - F.col("b.pos")).alias("diag"),
        )
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pa")
    spans = (
        pairs.withColumn("isl", F.col("pa") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "isl")
        .agg(F.min("pa").alias("start_a"), F.count("*").alias("_run"))
        .filter(F.col("_run") + (seed_n - 1) >= min_len)
        .select(
            "id_a",
            "id_b",
            F.col("start_a").cast("int").alias("start_a"),
            (F.col("start_a") - F.col("diag")).cast("int").alias("start_b"),
            (F.col("_run") + (seed_n - 1)).cast("bigint").alias("span_len"),
        )
    )
    if not materialize:
        return spans
    out = spans.localCheckpoint(eager=True)
    pos_grams.unpersist()
    return out


def excise_spans(
    df: DataFrame,
    spans: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    analyzer: Analyzer | None = None,
    broadcast_spans: bool = True,
) -> DataFrame:
    """Remove duplicated passages, keeping the earliest copy — the
    second half of Lee et al. 2022's ExactSubstr dedup (find duplicated
    spans, then cut every copy but one). ``spans`` is duplicate_spans
    output (id_a < id_b): each span is excised from the LATER doc
    (id_b side), so the id_a occurrence survives as the canonical copy.

    Output (id_col, n_tokens, n_removed, text): every doc re-emitted
    with its token stream rebuilt minus the cut positions (text is
    whitespace-normalized — the token-level contract of the paper;
    overlapping spans union naturally). Docs with no spans pass through
    with n_removed = 0.

    Scale shape: the span table aggregates to per-doc interval lists
    (≤ one row per doc with duplicates, ≪ corpus) and broadcasts onto
    the corpus (set ``broadcast_spans=False`` if most of the corpus is
    duplicated); the cut itself is a nested JVM array HOF inside the
    scan — no Python, no extra shuffle."""
    az = analyzer or WHITESPACE_ANALYZER
    iv = (
        spans.select(
            F.col("id_b").alias(id_col),
            F.struct(
                F.col("start_b").cast("int").alias("s"),
                (F.col("start_b") + F.col("span_len") - 1).cast("int").alias("e"),
            ).alias("_v"),
        )
        .groupBy(id_col)
        .agg(F.collect_list("_v").alias("_iv"))
    )
    if broadcast_spans:
        iv = F.broadcast(iv)
    tk = az.tokens_expr(text_col)
    base = df.select(id_col, tk.alias("_tk")).join(iv, id_col, "left")
    kept = F.when(F.col("_iv").isNull(), F.col("_tk")).otherwise(
        F.filter(
            "_tk",
            lambda x, i: ~F.exists(
                F.col("_iv"), lambda v: (i >= v["s"]) & (i <= v["e"])
            ),
        )
    )
    return base.select(
        id_col,
        F.size("_tk").cast("bigint").alias("n_tokens"),
        (F.size("_tk") - F.size(kept)).cast("bigint").alias("n_removed"),
        F.concat_ws(" ", kept).alias("text"),
    )


def keep_best(
    scored: DataFrame,
    clusters: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    *,
    broadcast_clusters: bool = True,
) -> DataFrame:
    """Canonical-survivor selection: given per-doc scores and dedup
    clusters (dedup_clusters output), keep the highest-scoring member
    of each cluster — the FineWeb/RefinedWeb refinement of
    keep-lowest-id dedup (drop duplicates, but keep the *best* copy,
    e.g. by quality score). Ties break on lowest id.

    Output: (id_col, cluster_id, score_col, keep) for EVERY input doc —
    docs outside any cluster are their own cluster and always kept, so
    ``filter(keep)`` is the deduplicated corpus.

    Scale shape: the cluster table covers only docs with near-dup
    evidence (≪ corpus) and broadcasts for both the membership join and
    the anti-join, so the corpus is NEVER shuffled; the pick-best window
    runs on clustered rows only and compiles to WindowGroupLimit-style
    O(1)-per-cluster state. Set ``broadcast_clusters=False`` if most of
    the corpus is duplicated."""
    cl = clusters.select(
        F.col(id_col), F.col("cluster_id")
    )
    if broadcast_clusters:
        cl = F.broadcast(cl)
    base = scored.select(id_col, score_col)
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc(score_col), F.asc(id_col)
    )
    in_cl = (
        base.join(cl, id_col)
        .withColumn("keep", F.row_number().over(w) == 1)
        .select(id_col, "cluster_id", score_col, "keep")
    )
    rest = base.join(cl.select(id_col), id_col, "left_anti").select(
        id_col,
        F.col(id_col).alias("cluster_id"),
        score_col,
        F.lit(True).alias("keep"),
    )
    return in_cl.unionByName(rest)
