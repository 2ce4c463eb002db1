"""Mergeable distributed sketches: HyperLogLog cardinality, Count-Min
frequency, and KMV/theta set overlap.

These are the fixed-size summaries a 100-TB pipeline aggregates instead
of exact distinct/count shuffles (the scale path behind the exact
registry twins `cardinality_by_source` / `wordcount_cf` /
`jaccard_topk`). Every sketch here is

* built with ONE map-side-combinable groupBy whose key space is bounded
  by the sketch size (2^p registers / depth*width counters / k minima),
  never by the data, and
* mergeable by the same max / sum / min-k operation that builds it —
  per-partition sketches union into the global sketch without ever
  shuffling the raw keys (``hll_merge`` + tests/test_sketches.py prove
  the merge is lossless).

Determinism contract (the DuckDB registry oracles rely on it): the hash
is the first 8 hex chars of md5 rendered identically in both engines
(Spark ``conv(substring(md5(x),1,8),16,10)`` == DuckDB
``('0x'||substr(md5(x),1,8))::bigint``); the HLL harmonic sum adds
2^-M over at most 33-p distinct exponents, which is EXACT in IEEE
double regardless of order; CMS counters are integer sums; KMV is a
rank selection. No order-dependent float accumulation anywhere.

Reference parity: the reference exposes only exact counting
(WordCounts.count, RawReader stats — /root/reference/app/org/nlp4l/
lucene/stats); the sketches are the beyond-reference scale surface, the
same role ES `cardinality` (HLL++) and `significant_terms` background
sampling play in the systems the reference deploys into.
"""

from __future__ import annotations

import hashlib
from typing import Iterable, Sequence

from pyspark.sql import DataFrame, Window, functions as F

TWO32 = 1 << 32


def _hash32(col):
    """First 8 md5 hex chars as a non-negative 32-bit integer; the exact
    twin of DuckDB's ('0x' || substr(md5(x),1,8))::bigint."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


def hash32_sql(expr: str) -> str:
    """DuckDB rendering of the same 32-bit hash."""
    return f"('0x' || substr(md5({expr}), 1, 8))::bigint"


# --------------------------------------------------------------------- #
# HyperLogLog (Flajolet et al. 2007), 32-bit-hash variant with the
# linear-counting small-range correction.
# --------------------------------------------------------------------- #
def _hll_alpha_m2(p: int) -> float:
    m = float(1 << p)
    return (0.7213 / (1.0 + 1.079 / m)) * m * m


def hll_registers(
    df: DataFrame, key_col, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """Register table (group_cols..., bucket, m): bucket = top p hash
    bits, m = max(rank of first 1-bit in the remaining 32-p bits).
    Duplicate keys are free — max() absorbs them, so no pre-distinct
    shuffle. Output size <= groups * 2^p rows, independent of |df|."""
    if p < 7:
        raise ValueError("p >= 7 required (alpha constant assumes m >= 128)")
    wmax = 1 << (32 - p)
    maxrank = 33 - p
    h = _hash32(key_col)
    w = h % wmax
    rank = F.when(w == 0, maxrank).otherwise(
        F.lit(maxrank) - F.length(F.bin(w))
    )
    return (
        df.select(
            *group_cols,
            F.floor(h / wmax).cast("long").alias("bucket"),
            rank.cast("int").alias("rank"),
        )
        .groupBy(*group_cols, "bucket")
        .agg(F.max("rank").alias("m"))
    )


def hll_merge(regs_a: DataFrame, regs_b: DataFrame) -> DataFrame:
    """Union two register tables: per-bucket max. Lossless — merging
    per-partition sketches gives bit-identical registers to one pass."""
    keys = [c for c in regs_a.columns if c != "m"]
    return (
        regs_a.unionByName(regs_b)
        .groupBy(*keys)
        .agg(F.max("m").alias("m"))
    )


def hll_estimate_registers(
    regs: DataFrame, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """Fold a register table to (group_cols..., registers_used,
    hll_est). Missing buckets contribute 2^0 = 1 to the harmonic sum;
    linear counting kicks in below 2.5m when zero registers exist."""
    m = 1 << p
    agg = regs.groupBy(*group_cols).agg(
        F.count("*").cast("long").alias("registers_used"),
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("_zp"),
    )
    v = (F.lit(m) - F.col("registers_used")).cast("double")
    z = F.col("_zp") + v
    e_raw = F.lit(_hll_alpha_m2(p)) / z
    est = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(e_raw)
    return agg.select(
        *group_cols, "registers_used", F.round(est, 4).alias("hll_est")
    )


def hll_estimate(
    df: DataFrame, key_col, group_cols: Sequence[str], p: int = 8
) -> DataFrame:
    """One-shot distinct-count estimate of key_col per group."""
    return hll_estimate_registers(
        hll_registers(df, key_col, group_cols, p), group_cols, p
    )


def hll_sql(
    key_expr: str, from_clause: str, group_cols: Sequence[str], p: int = 8
) -> str:
    """The DuckDB oracle for hll_estimate — the SAME register and
    estimator arithmetic rendered as SQL, so the approximation itself
    (not just some exact answer) is externally verified."""
    m = 1 << p
    wmax = 1 << (32 - p)
    maxrank = 33 - p
    g = ", ".join(group_cols)
    alpha_m2 = f"(0.7213 / (1 + 1.079 / {m}.0)) * {m}.0 * {m}.0"
    return f"""
WITH hsrc AS (SELECT {g}, {hash32_sql(key_expr)} AS h FROM {from_clause}),
hranks AS (SELECT {g}, h // {wmax} AS bucket,
            CASE WHEN h % {wmax} = 0 THEN {maxrank}
                 ELSE {maxrank} - length(bin(h % {wmax})) END AS rank
           FROM hsrc),
regs AS (SELECT {g}, bucket, max(rank) AS m FROM hranks GROUP BY ALL),
agg AS (SELECT {g}, count(*)::bigint AS registers_used,
               sum(pow(2.0, -m)) AS zp FROM regs GROUP BY ALL),
est AS (SELECT {g}, registers_used,
               ({m} - registers_used)::double AS v,
               ({alpha_m2}) / (zp + ({m} - registers_used)) AS e_raw
        FROM agg)
SELECT {g}, registers_used,
       round(CASE WHEN e_raw <= {2.5 * m} AND v > 0
                  THEN {m}.0 * ln({m}.0 / v) ELSE e_raw END, 4) AS hll_est
FROM est
"""


# --------------------------------------------------------------------- #
# Count-Min sketch (Cormode & Muthukrishnan 2005): depth rows of width
# counters; point estimate = min over rows. Always >= truth.
# --------------------------------------------------------------------- #
def cms_build(
    df: DataFrame, key_col, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Counter table (row, col, cnt): each input row increments one
    counter per hash row. One groupBy on a key space of depth*width —
    the full sketch is <= 4096 rows no matter the corpus size."""
    cells = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("row"),
                    (_hash32(F.concat(F.lit(f"{r}:"), key_col)) % width)
                    .cast("long")
                    .alias("col"),
                )
                for r in range(depth)
            ]
        )
    )
    return (
        df.select(cells.alias("c"))
        .select("c.row", "c.col")
        .groupBy("row", "col")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def cms_cells(key: str, depth: int = 4, width: int = 1024):
    """Driver-side (row, col) cells for a literal key — hashlib md5 is
    byte-identical to the engines' md5, so lookups agree with the
    counters built JVM-side."""
    return [
        (r, int(hashlib.md5(f"{r}:{key}".encode()).hexdigest()[:8], 16) % width)
        for r in range(depth)
    ]


def cms_query(
    counters: DataFrame,
    keys: Iterable[str],
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-estimate each key: min over its depth counters (absent
    counter = 0). The probe joins a keys*depth-row literal table against
    the bounded counter table — broadcastable on both sides."""
    spark = counters.sparkSession
    rows = [
        (key, r, c) for key in keys for (r, c) in cms_cells(key, depth, width)
    ]
    probe = spark.createDataFrame(rows, "key string, row int, col long")
    return (
        probe.join(F.broadcast(counters), ["row", "col"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )


# --------------------------------------------------------------------- #
# KMV / theta sketch (Beyer et al. 2007): the k smallest distinct hash
# values of a set; intersections/unions of sketches estimate overlap.
# --------------------------------------------------------------------- #
def kmv_sketch(
    df: DataFrame, key_col, group_col: str, k: int = 64
) -> DataFrame:
    """(group, h, rn): the k smallest DISTINCT 32-bit hashes per group.
    The distinct + rank shuffle carries (group, hash) pairs only; the
    retained sketch is <= groups*k rows."""
    h = _hash32(key_col)
    w = Window.partitionBy("g").orderBy("h")
    return (
        df.select(F.col(group_col).alias("g"), h.alias("h"))
        .distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def kmv_pair_overlap(sketch: DataFrame, k: int = 64) -> DataFrame:
    """Pairwise overlap estimates between every two groups' sketches:
    theta = min of the two kth-minima (2^32 = exact regime when a group
    holds fewer than k hashes); elements strictly below theta form the
    combined sample. est_* = count / (theta/2^32); jaccard_est is the
    integer ratio |A∩B| / |A∪B| inside the sample (theta cancels).

    The sketch table is bounded (groups*k rows) so this merges it on
    the coordinator — exactly how sketch libraries (DataSketches) union
    set sketches — giving ONE distributed pass over the data instead of
    the 4x sketch recomputation a join-dag formulation costs. The set
    counts are exact integers computed driver-side; the float scaling
    and rounding run IN-ENGINE so the DuckDB oracle arithmetic matches
    bit-for-bit."""
    rows = sketch.select("g", "h").collect()  # bounded: groups * k
    by_g: dict = {}
    for r in rows:
        by_g.setdefault(r["g"], []).append(r["h"])
    out = []
    groups = sorted(by_g)
    for i, ga in enumerate(groups):
        for gb in groups[i + 1 :]:
            ha, hb = by_g[ga], by_g[gb]
            theta = min(
                TWO32 if len(ha) < k else max(ha),
                TWO32 if len(hb) < k else max(hb),
            )
            a = {h for h in ha if h < theta}
            b = {h for h in hb if h < theta}
            out.append((ga, gb, theta, len(a), len(b), len(a & b)))
    spark = sketch.sparkSession
    raw = spark.createDataFrame(
        out, "ga string, gb string, theta long, na long, nb long, ni long"
    )
    scale = F.lit(float(TWO32)) / F.col("theta").cast("double")
    return raw.select(
        "ga",
        "gb",
        F.round(F.col("na") * scale, 4).alias("est_card_a"),
        F.round(F.col("nb") * scale, 4).alias("est_card_b"),
        F.round(F.col("ni") * scale, 4).alias("est_inter"),
        F.round(
            F.col("ni").cast("double")
            / F.greatest(F.col("na") + F.col("nb") - F.col("ni"), F.lit(1)),
            6,
        ).alias("jaccard_est"),
    )


# --------------------------------------------------------------------- #
# DDSketch (Masson, Rim & Lee, VLDB 2019): relative-error-bounded
# quantiles from exponentially-spaced buckets — the mergeable sketch
# behind ES `percentiles` (hdr mode) / Datadog distributions. Bucket
# index = ceil(ln(v)/ln(gamma)) with gamma = (1+alpha)/(1-alpha), so any
# quantile estimate is within alpha relative error of the true value;
# sketches merge by bucket-count ADDITION (same op that builds them).
#
# Determinism contract: inputs are positive integers (cents), ln runs on
# exactly-representable doubles, and the bucket ratio is rounded to 6 dp
# before ceil (the repo's round-before-select rule, absorbing the <=1ulp
# libm difference between the JVM and DuckDB); gamma and ln(gamma) are
# Python-computed literals injected into BOTH engines.
# --------------------------------------------------------------------- #
import math as _math

DD_ALPHA = 0.02


def dd_gamma(alpha: float = DD_ALPHA) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def dd_bucket_expr(col, alpha: float = DD_ALPHA):
    """Bucket index for a POSITIVE value column (JVM expression)."""
    lg = _math.log(dd_gamma(alpha))
    return F.ceil(F.round(F.log(col.cast("double")) / F.lit(lg), 6)).cast(
        "long"
    )


def dd_sketch(
    df: DataFrame,
    value_col: str,
    alpha: float = DD_ALPHA,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group_cols..., bucket, cnt) — ONE map-side-combinable groupBy
    whose key space is the bucket count (~log-range/alpha), never the
    data size."""
    b = dd_bucket_expr(F.col(value_col), alpha)
    return (
        df.groupBy(*group_cols, b.alias("bucket"))
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def dd_merge(*sketches: DataFrame, group_cols: Sequence[str] = ()) -> DataFrame:
    """Union partial sketches into one: bucket counts add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return (
        out.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )


def dd_quantiles(
    sketch: DataFrame,
    qs: Sequence[float],
    alpha: float = DD_ALPHA,
    scale: float = 1.0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """(group_cols..., pct, bucket, estimate) per requested quantile:
    the first bucket whose cumulative count reaches ceil(q*n),
    estimated at the bucket's midpoint 2*gamma^b/(gamma+1), divided by
    ``scale`` (e.g. 100 when the sketch was built over cents). All
    windows and joins run over the bucket-count-sized sketch table —
    nothing is ∝ data; with ``group_cols`` the cumulative window
    partitions by group (per-group state stays bucket-bounded)."""
    gamma = dd_gamma(alpha)
    lg = _math.log(gamma)
    spark = sketch.sparkSession
    g = list(group_cols)
    cum = sketch.select(
        *g,
        "bucket",
        F.sum("cnt").over(Window.partitionBy(*g).orderBy("bucket")).alias("cum"),
        F.sum("cnt").over(Window.partitionBy(*g)).alias("n"),
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "pct double")
    est = F.round(
        2.0 * F.exp(F.col("bucket") * F.lit(lg)) / F.lit(gamma + 1.0)
        / F.lit(float(scale)),
        6,
    )
    return (
        cum.join(F.broadcast(qdf), F.col("cum") >= F.ceil(F.col("pct") * F.col("n")))
        .groupBy(*g, "pct")
        .agg(F.min("bucket").alias("bucket"))
        .select(*g, "pct", "bucket", est.alias("estimate"))
        .orderBy(*g, "pct")
    )


# --------------------------------------------------------------------- #
# Bloom filter (Bloom 1970) — the runtime semi-join prefilter.
#
# Spark's own engine builds exactly this shape for runtime filtering
# (InjectRuntimeFilter inserts a BloomFilterAggregate on the small join
# side and a might_contain probe on the big side), but the aggregate is
# not registered as a public SQL function, so this is the same design
# from public primitives: k = num_hashes positions per key via seeded
# xxhash64, a bitset bounded by num_bits (NEVER by the data), and a
# pure-JVM probe expression (element_at + shiftright + bit-and over a
# literal long[] — whole-stage-codegen friendly, no Python anywhere).
#
# Exactness contract: a Bloom filter admits false positives, so callers
# that need exact results MUST verify survivors with the real join —
# the filter's job is only to keep the big side's shuffle ∝ matching
# rows instead of ∝ the corpus. No false negatives ever
# (tests/test_sketches.py proves both properties).
# --------------------------------------------------------------------- #
def bloom_build(
    df: DataFrame,
    col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> list:
    """Build the bitset over ``df[col]`` (cast to string) and return it
    as ``num_bits/64`` python ints. The only shuffle is a distinct over
    set-bit positions — bounded by num_bits; the driver collect is
    bounded by num_bits/64 words. At 10^12 rows the build side of a
    semi-join prefilter is the SMALL side (dim keys), so this stays a
    dim-sized job; the bitset itself is fixed-size either way."""
    if num_bits % 64:
        raise ValueError("num_bits must be a multiple of 64")
    key = F.col(col).cast("string")
    pos = df.select(
        F.explode(
            F.array(
                *[
                    F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits))
                    for s in range(num_hashes)
                ]
            )
        ).alias("pos")
    ).distinct()
    words = [0] * (num_bits // 64)
    for r in pos.collect():
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed int64 range for the JVM literal
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(col, words: list, num_bits: int, num_hashes: int = 4):
    """The probe predicate: ALL k seeded-hash bit positions set. A pure
    column expression over a literal long[] — lands inside the scan's
    codegen stage, so the fact table is pruned BEFORE any exchange."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in words])
    key = col.cast("string")
    cond = None
    for s in range(num_hashes):
        p = F.pmod(F.xxhash64(key, F.lit(s)), F.lit(num_bits))
        word = F.element_at(arr, (p / 64).cast("int") + 1)
        bit = F.call_function("bit_get", word, (p % 64).cast("int")) == 1
        cond = bit if cond is None else (cond & bit)
    return cond
