"""Similarity search over embedding columns (array<float>).

Training-data-pipeline extension (not in the reference; its nearest
analogue is the TF-IDF vector surface, TFIDF.scala:37-124):

* brute_force_cosine_topk — exact top-k by cosine vs a query vector.
  The dot product is a JVM-side array HOF (zip_with + aggregate), so the
  scan is codegen'd; top-k is TakeOrderedAndProject. At 100 TB this is one
  embarrassing-parallel scan, no shuffle.
* pairwise_topk_cosine — per-probe top-k for a batch of probe vectors
  (broadcast probes x corpus scan).
* lsh_cosine_topk / ivf_cosine_topk — random-hyperplane LSH bucketing /
  coarse quantization as FULL-SCAN twins for oracle and identity tests;
  the scale paths (same geometry, partition-pruned probes over a
  materialized layout) live in ops/ann_index.py.
* lsh_buckets_arrow / ivf_cells_arrow — the Arrow/NumPy matmul engines
  behind the index build and near-dup blocking.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F


def _as_lit_array(vec) -> "F.Column":
    return F.array(*[F.lit(float(x)) for x in vec])


def cosine_col(vec_col, query_vec) -> "F.Column":
    """cosine(embedding, query) as pure SQL expressions (no UDF)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0
    qlit = _as_lit_array(q)
    dot = F.aggregate(
        F.zip_with(vec_col, qlit, lambda x, y: x.cast("double") * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(vec_col, lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return dot / (norm * F.lit(qn))


def brute_force_cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where=None,
) -> DataFrame:
    """Exact cosine top-k, ties broken by id asc. ``where`` pre-filters
    candidates (Lucene KnnFloatVectorQuery-with-filter semantics: the
    filter bounds the visited set, top-k comes from survivors only);
    here it folds into the single codegen scan as a pushed predicate."""
    if where is not None:
        df = df.filter(where)
    return (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), query_vec), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def mmr_rerank(
    df: DataFrame,
    query_vec,
    k: int = 10,
    c: int = 20,
    lam: float = 0.7,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein,
    SIGIR 1998) — the RAG/search result-diversification pass: take the
    exact-cosine top-``c`` candidates, then greedily select ``k`` of them
    maximizing ``lam * rel(d) - (1 - lam) * max_{s in selected}
    sim(d, s)``; the first pick is pure relevance. Ties (on the 6-dp
    rounded objective) break to the lower id; both rel and pairwise sims
    are rounded to 6 dp BEFORE comparison so the greedy choices are
    cross-engine deterministic (the RM3/MLT rounded-selection-key trick).

    Returns (rank, vec_id, rel): the MMR order plus each pick's
    engine-rounded relevance.

    Scale shape: the relevance pass is the distributed brute-force cosine
    scan (one codegen pass + TakeOrderedAndProject); only the ``c``
    candidate rows (ids + vectors) are collected, so the greedy loop is
    O(c^2 * dim) driver work bounded by the requested result size, never
    corpus-proportional. Pairwise sims use sequential-sum cosine to match
    the SQL oracle's fold order exactly.
    """
    cand = (
        df.select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), query_vec), 6).alias("rel"),
            F.col(vec_col).alias("_v"),
        )
        .orderBy(F.desc("rel"), F.asc("vec_id"))
        .limit(c)
        .collect()
    )
    rel = {r["vec_id"]: float(r["rel"]) for r in cand}
    vec = {r["vec_id"]: [float(x) for x in r["_v"]] for r in cand}

    import math

    def _cos(a: list[float], b: list[float]) -> float:
        dot = na = nb = 0.0
        for x, y in zip(a, b):
            dot += x * y
            na += x * x
            nb += y * y
        return dot / (math.sqrt(na) * math.sqrt(nb))

    selected: list[int] = []
    remaining = set(rel)
    out = []
    while remaining and len(selected) < k:
        best_id, best_m = None, None
        for vid in sorted(remaining):
            pen = (
                max(round(_cos(vec[vid], vec[s]), 6) for s in selected)
                if selected
                else 0.0
            )
            m = round(lam * rel[vid] - (1.0 - lam) * pen, 6)
            if best_m is None or m > best_m:
                best_id, best_m = vid, m
        selected.append(best_id)
        remaining.discard(best_id)
        out.append((len(selected), best_id, rel[best_id]))
    spark = df.sparkSession
    return spark.createDataFrame(out, "rank int, vec_id long, rel double")


def _hyperplanes(dim: int, bits: int, tables: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    return rng.standard_normal((tables, bits, dim))


def _signature_cols(vec_col, planes: np.ndarray):
    """Per-table LSH bucket ids: sign-bit pattern of `bits` hyperplane dots.
    Everything is lit arrays + zip_with/aggregate — JVM-side."""
    tables, bits, _ = planes.shape
    sigs = []
    for t in range(tables):
        bucket = F.lit(0).cast("long")
        for b in range(bits):
            dot = F.aggregate(
                F.zip_with(
                    vec_col, _as_lit_array(planes[t, b]), lambda x, y: x.cast("double") * y
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bucket = bucket * 2 + F.when(dot > 0, 1).otherwise(0)
        sigs.append(bucket)
    return sigs


def lsh_buckets_arrow(
    df: DataFrame,
    planes: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """(id, v, buckets array<long>[tables]) via ONE Arrow pass: a NumPy
    matmul of the batch's vectors against all hyperplanes at once,
    replacing the interpreted zip_with/aggregate HOF chain of
    ``_signature_cols`` (the declarative twin) — same sign-bit buckets,
    ~10x less driver-measured wall on signature-heavy paths. Sign
    agreement with the sequential-sum HOF form holds unless a dot sits
    within float rounding of zero; callers that feed oracle-checked
    queries re-verify end-result identity at two SFs (see
    entry_queries._ann_index docstring).

    ``meta_cols`` ride through the pass unchanged (same Arrow batch, no
    extra scan or join) so the materialized index can serve filtered
    ANN queries (Lucene KnnFloatVectorQuery-with-filter / FAISS
    IDSelector shape) with the predicate pushed into the bucket scan."""
    import pandas as pd

    from pyspark.sql import types as T

    meta_cols = meta_cols or []
    tables, bits, dim = planes.shape
    flat = planes.reshape(tables * bits, dim).T  # (dim, tables*bits)
    weights = (1 << np.arange(bits - 1, -1, -1, dtype=np.int64))

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
            T.StructField("buckets", T.ArrayType(T.LongType())),
        ]
        + [df.schema[c] for c in meta_cols]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            bits_m = (mat @ flat) > 0  # (n, tables*bits)
            bits_m = bits_m.reshape(len(pdf), tables, bits)
            buckets = (bits_m * weights).sum(axis=2)  # (n, tables)
            out = {
                "id": pdf["id"],
                "v": pdf["v"],
                "buckets": list(buckets),
            }
            for c in meta_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        *[F.col(c) for c in meta_cols],
    )
    return base.mapInPandas(run, schema)


def ivf_cells_arrow(
    df: DataFrame,
    centroids: list,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    meta_cols: list[str] | None = None,
) -> DataFrame:
    """(id, v, cell) via one Arrow pass: batch cosine against all
    centroids as a NumPy matmul + argmax (ties -> lower index, matching
    the (cosine, -idx) struct-max of the declarative twin). ``meta_cols``
    ride through unchanged (see lsh_buckets_arrow)."""
    import pandas as pd

    from pyspark.sql import types as T

    meta_cols = meta_cols or []
    C = np.asarray(
        [np.asarray(c, dtype=np.float64) for c in centroids]
    )  # (k, dim)
    Cn = np.linalg.norm(C, axis=1)
    Cn[Cn == 0] = 1.0
    CT = (C / Cn[:, None]).T  # (dim, k)

    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.ArrayType(T.FloatType())),
            T.StructField("cell", T.IntegerType()),
        ]
        + [df.schema[c] for c in meta_cols]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            nrm = np.linalg.norm(mat, axis=1)
            nrm[nrm == 0] = 1.0
            cos = (mat / nrm[:, None]) @ CT  # (n, k)
            cells = np.argmax(cos, axis=1).astype(np.int32)  # first max wins
            out = {"id": pdf["id"], "v": pdf["v"], "cell": cells}
            for c in meta_cols:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        *[F.col(c) for c in meta_cols],
    )
    return base.mapInPandas(run, schema)


def lsh_cosine_topk(
    df: DataFrame,
    query_vec,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    bits: int = 8,
    tables: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: score only vectors sharing >= 1 LSH bucket
    with the query — the FULL-SCAN twin kept for oracle/identity testing.
    The scale path is the materialized bucket index
    (ops/ann_index.build_ann_index + lsh_topk_indexed): identical
    geometry, but the probe reads only its (tbl, bucket) partitions."""
    q = np.asarray(query_vec, dtype=np.float64)
    planes = _hyperplanes(len(q), bits, tables, seed)
    q_buckets = []
    for t in range(tables):
        bucket = 0
        for b in range(bits):
            bucket = bucket * 2 + (1 if float(planes[t, b] @ q) > 0 else 0)
        q_buckets.append(bucket)
    sigs = _signature_cols(F.col(vec_col), planes)
    match = F.lit(False)
    for sig, qb in zip(sigs, q_buckets):
        match = match | (sig == F.lit(qb))
    return (
        df.filter(match)
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_cosine_topk(
    df: DataFrame,
    query_vec,
    centroids,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest centroid
    cell (ties -> lower centroid index), then score exact cosine only inside
    the ``nprobe`` cells nearest the query. ``centroids`` is a caller-
    supplied list of vectors — deterministic here (so the DuckDB oracle can
    re-derive the identical partition). This is the FULL-SCAN twin kept
    for oracle/identity testing; the scale path is the materialized cell
    index (ops/ann_index.build_ann_index + ivf_topk_indexed, centroids
    from a seeded k-means fit or caller-supplied), where the probe reads
    ~nprobe/C of the data via directory-level partition pruning.

    Everything is JVM expressions: per-centroid cosine is a zip_with/
    aggregate HOF, the argmax is array_max over (cosine, -index) structs."""
    cents = [np.asarray(c, dtype=np.float64) for c in centroids]
    structs = F.array(
        *[
            F.struct(
                cosine_col(F.col(vec_col), c).alias("c"),
                F.lit(-i).alias("ni"),
            )
            for i, c in enumerate(cents)
        ]
    )
    cell = (-F.array_max(structs)["ni"]).cast("int")

    q = np.asarray(query_vec, dtype=np.float64)
    qn = float(np.linalg.norm(q)) or 1.0
    by_query = sorted(
        range(len(cents)),
        key=lambda i: (
            -float(cents[i] @ q) / ((float(np.linalg.norm(cents[i])) or 1.0) * qn),
            i,
        ),
    )
    probe = by_query[:nprobe]
    return (
        df.withColumn("_cell", cell)
        .filter(F.col("_cell").isin(probe))
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def exact_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact embedding-cosine near-duplicate pairs: all-pairs self-join with
    cosine >= threshold, id_a < id_b. This is the CORRECTNESS baseline
    (O(n^2) compare — fine for validation corpora); at 100 TB use
    `embedding_neardup_pairs` (LSH blocking) so candidates are bounded
    per bucket instead of quadratic."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    nrm = F.sqrt(
        F.aggregate(
            F.transform("v", lambda x: x.cast("double") * x),
            F.lit(0.0),
            lambda a, x: a + x,
        )
    )
    base = base.withColumn("nm", nrm)
    pairs = base.alias("a").join(
        base.alias("b"), F.col("a.id") < F.col("b.id")
    )
    dot = F.aggregate(
        F.zip_with(
            F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )
    return (
        pairs.withColumn("cosine", dot / (F.col("a.nm") * F.col("b.nm")))
        .filter(F.col("cosine") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("cosine", 6).alias("cosine"),
        )
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    bits: int = 10,
    tables: int = 6,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH blocking + exact
    cosine verify on candidates (the embedding flavor of dedup)."""
    sample = df.select(vec_col).first()
    dim = len(sample[0])
    planes = _hyperplanes(dim, bits, tables, seed)
    # signatures via the Arrow matmul pass (lsh_buckets_arrow; the
    # interpreted-HOF _signature_cols chain measured ~4x slower here);
    # persisted because BOTH sides of the self-join read them, released
    # after the (small) candidate-pair result is materialized
    sh = lsh_buckets_arrow(df, planes, vec_col, id_col).persist()
    base = sh.select(
        "id", "v", F.posexplode("buckets").alias("tbl", "bucket")
    )
    cand = (
        base.alias("a")
        .join(
            base.alias("b"),
            (F.col("a.tbl") == F.col("b.tbl"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, x: a + x,
    )

    def norm(c):
        return F.sqrt(
            F.aggregate(
                F.transform(c, lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )

    out = (
        cand.withColumn("cosine", dot / (norm(F.col("va")) * norm(F.col("vb"))))
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))
    )
    out = out.localCheckpoint(eager=True)  # near-dup pairs << corpus
    sh.unpersist()
    return out


def semantic_dedup(
    df: DataFrame,
    centroids,
    threshold: float = 0.5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    *,
    materialize: bool = True,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): coarse-cluster the embeddings, compare cosine only
    WITHIN each cluster, and flag for removal every vector that has a
    lower-id near-duplicate (cosine >= ``threshold``) in its cluster —
    the deterministic keep-lowest-id variant of the paper's keep rule, so
    a SQL oracle can recompute the exact keep set.

    ``centroids`` is a caller-supplied list of vectors (seeded k-means
    from ops/ann_index.fit_centroids, or any deterministic choice).
    Returns (vec_id, cell, keep) for every input vector.

    Scale shape: one Arrow matmul pass assigns cells (no shuffle), the
    pairwise compare is a self-join ON the cell key — candidate pairs are
    bounded per cluster, never corpus-quadratic. With C clusters over n
    docs the compare is ~n^2/C cosines spread across C independent join
    partitions; skew only appears if one cluster dominates, which the
    k-means fit (balanced seeding) keeps in check. The assignment output
    is persisted because both sides of the self-join read it, and
    released once the (small) dropped-id set is materialized.
    ``materialize=False`` skips the persist/checkpoint steps and returns
    the fully lazy plan (used by the plan-shape regression tests; the
    Arrow assignment then runs once per downstream action).

    The within-cell compare runs as SemDeDup does it: one NumPy
    ``sims = M @ M.T`` per cell inside an Arrow task (cells bound the
    matrix; at extreme cell sizes sub-block the matmul). The matmul only
    nominates CANDIDATES at ``threshold - 1e-9`` (slack ≫ the ~1e-15
    float-association drift vs the sequential fold); the exact decision
    re-computes each candidate's cosine with the same HOF arithmetic the
    SQL oracle uses — matmul prunes, exact math decides. (The candidate
    equi-join formulation this replaced spent ~50 µs per interpreted-HOF
    pair; the matmul path measured ~30x faster on the sf0.1 fixture.)"""
    import pandas as pd

    from pyspark.sql import types as T

    cells = ivf_cells_arrow(df, centroids, vec_col, id_col)
    if materialize:
        cells = cells.persist()

    cand_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
        ]
    )
    slack = 1e-9

    def per_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("id")
        ids = pdf["id"].to_numpy()
        mat = np.asarray([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        nrm = np.linalg.norm(mat, axis=1)
        nrm[nrm == 0] = 1.0
        sims = (mat / nrm[:, None]) @ (mat / nrm[:, None]).T
        ia, ib = np.triu_indices(len(ids), 1)
        keep = sims[ia, ib] >= threshold - slack
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]]})

    cand = cells.groupBy("cell").applyInPandas(per_cell, cand_schema)

    dot = F.aggregate(
        F.zip_with(
            F.col("a.v"), F.col("b.v"), lambda x, y: x.cast("double") * y.cast("double")
        ),
        F.lit(0.0),
        lambda a, x: a + x,
    )

    def norm(side):
        return F.sqrt(
            F.aggregate(
                F.transform(F.col(side), lambda x: x.cast("double") * x),
                F.lit(0.0),
                lambda a, x: a + x,
            )
        )

    dropped = (
        cand.join(cells.alias("a"), cand["id_a"] == F.col("a.id"))
        .join(cells.alias("b"), cand["id_b"] == F.col("b.id"))
        .filter(dot / (norm("a.v") * norm("b.v")) >= threshold)
        .select(F.col("b.id").alias("id"))
        .distinct()
    )
    if materialize:
        dropped = dropped.localCheckpoint(eager=True)  # dropped ids << corpus
    out = cells.join(dropped.withColumn("_drop", F.lit(True)), "id", "left").select(
        F.col("id").alias("vec_id"),
        F.col("cell"),
        F.coalesce(~F.col("_drop"), F.lit(True)).alias("keep"),
    )
    if materialize:
        out = out.localCheckpoint(eager=True)
        cells.unpersist()
    return out


# --------------------------------------------------------------------- #
# Distributed PCA over the embedding column.
#
# The classic Spark shape: the Gram/covariance matrix is dim×dim (64×64
# here) regardless of corpus size, so each partition folds its vectors
# into ONE dim×dim partial (a NumPy x^T·x per Arrow batch), partials
# sum in a bounded groupBy, and the eigendecomposition runs driver-side
# on the 64×64 result (RowMatrix.computePrincipalComponents does exactly
# this in Spark MLlib's JVM code). Nothing ∝ data ever reaches the
# driver, and vectors are never shuffled.
#
# Determinism contract for the DuckDB oracle: values are QUANTIZED to
# integers (round(x·2^quant_bits)) before any accumulation, so the fold
# is exact int64 arithmetic — order-independent — and the covariance is
# then a fixed IEEE formula over identical integers in both engines.
# |x| < 1 and n ≤ ~2^20 keep s_ij ≤ 2^(2·quant_bits+20) < 2^63 at test
# scale; at 10^12 rows the same pipeline runs un-quantized (float sums,
# approximation-tolerant like every PCA) — the quantization exists for
# exact external verification, not as the scale path.
# --------------------------------------------------------------------- #
def embedding_gram_partials(
    df: DataFrame,
    vec_col: str = "embedding",
    quant_bits: int = 20,
) -> DataFrame:
    """(i, j, s) int64 sums: j >= 0 → sum of q_i·q_j over the upper
    triangle i <= j; j = -1 → the linear sum of q_i; (-1, -1) → n.
    One Arrow pass; output is ≤ (dim·(dim+1)/2 + dim + 1) rows per
    partition, summed by a bounded groupBy."""
    import pandas as pd

    from pyspark.sql import types as T

    scale = float(1 << quant_bits)
    schema = T.StructType(
        [
            T.StructField("i", T.IntegerType()),
            T.StructField("j", T.IntegerType()),
            T.StructField("s", T.LongType()),
        ]
    )

    def run(batches):
        acc_g = None
        acc_s = None
        n = 0
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf["v"]]
            )
            # floor, not rint: round-half-even vs round-half-away can
            # disagree with SQL round() on exact .5 fractions; floor is
            # identical everywhere (the oracle floors too)
            q = np.floor(mat * scale).astype(np.int64)
            g = q.T @ q
            acc_g = g if acc_g is None else acc_g + g
            acc_s = q.sum(axis=0) if acc_s is None else acc_s + q.sum(axis=0)
            n += len(pdf)
        if acc_g is None:
            return
        dim = acc_g.shape[0]
        iu, ju = np.triu_indices(dim)
        yield pd.DataFrame(
            {
                "i": np.concatenate([iu, np.arange(dim), [-1]]).astype("int32"),
                "j": np.concatenate(
                    [ju, np.full(dim, -1), [-1]]
                ).astype("int32"),
                "s": np.concatenate(
                    [acc_g[iu, ju], acc_s, [n]]
                ).astype("int64"),
            }
        )

    base = df.select(F.col(vec_col).alias("v"))
    return base.mapInPandas(run, schema).groupBy("i", "j").agg(
        F.sum("s").alias("s")
    )


def embedding_covariance(
    df: DataFrame,
    vec_col: str = "embedding",
    quant_bits: int = 20,
) -> DataFrame:
    """(i, j, cov) for the upper triangle i <= j of the covariance
    matrix of the quantized embeddings, un-quantized back to value
    scale. cov = (S_ij/n − (S_i/n)·(S_j/n)) / 2^(2·quant_bits) — a
    fixed IEEE-double formula over exact int64 sums, so any engine
    computing the same formula over the same integers produces the
    identical double (the DuckDB oracle does). All joins here are over
    ≤ dim²-row tables."""
    parts = embedding_gram_partials(df, vec_col, quant_bits)
    n_row = parts.filter((F.col("i") == -1) & (F.col("j") == -1)).select(
        F.col("s").alias("_n")
    )
    lin = parts.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        F.col("i").alias("_d"), F.col("s").alias("_ls")
    )
    quad = parts.filter(F.col("j") >= 0)
    denom = float(1 << (2 * quant_bits))
    return (
        quad.crossJoin(F.broadcast(n_row))
        .join(F.broadcast(lin).withColumnRenamed("_ls", "_li"), F.col("i") == F.col("_d"))
        .drop("_d")
        .join(F.broadcast(lin).withColumnRenamed("_ls", "_lj"), F.col("j") == F.col("_d"))
        .drop("_d")
        .select(
            "i",
            "j",
            (
                (
                    F.col("s").cast("double") / F.col("_n").cast("double")
                    - (F.col("_li").cast("double") / F.col("_n").cast("double"))
                    * (F.col("_lj").cast("double") / F.col("_n").cast("double"))
                )
                / F.lit(denom)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )


def pca_fit(cov_df: DataFrame, k: int = 2):
    """Driver-side eigendecomposition of the collected dim×dim
    covariance (2080 rows for dim=64 — bounded by the sketch, never the
    data). Returns (components (k, dim) ndarray, eigenvalues (k,)),
    eigenvalues descending; each component's sign is fixed so its
    largest-|value| coordinate is positive (eigh's sign is otherwise
    arbitrary — this makes projections deterministic)."""
    rows = cov_df.collect()
    dim = max(int(r["i"]) for r in rows) + 1
    C = np.zeros((dim, dim))
    for r in rows:
        C[r["i"], r["j"]] = r["cov"]
        C[r["j"], r["i"]] = r["cov"]
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, vals[order]


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, pc1..pcK) — each projection is a JVM zip_with/aggregate dot
    against the literal component (codegen scan, no Python, no shuffle);
    means are NOT re-subtracted (PCA of the covariance is
    translation-invariant up to a constant offset per component, and
    top-k / ordering consumers are offset-immune; subtract the mean
    projection downstream if absolute coordinates matter)."""
    cols = [F.col(id_col)]
    for ci, comp in enumerate(components):
        lit = _as_lit_array(comp)
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        cols.append(dot.alias(f"pc{ci + 1}"))
    return df.select(*cols)
