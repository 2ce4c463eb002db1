"""Sketch-family properties the DuckDB oracle can't express: merge
losslessness, the CMS over-estimate guarantee, and accuracy vs exact."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.ops import sketches

SF = "/root/testdata/sf0.001"


def _user_days(spark):
    ev = spark.read.parquet(os.path.join(SF, "events.parquet"))
    sec = F.col("ts").cast("timestamp").cast("long")
    return ev.select(
        "event_type",
        F.concat_ws(
            ":",
            F.col("user_id").cast("string"),
            F.floor(sec / 86400).cast("long").cast("string"),
        ).alias("ud"),
    )


def test_hll_merge_is_lossless(spark):
    """Per-partition register tables union into the global sketch with
    bit-identical estimates — the mergeability claim behind running HLL
    map-side at 100 TB."""
    ud = _user_days(spark)
    half_a = ud.filter(F.crc32(F.col("ud")) % 2 == 0)
    half_b = ud.filter(F.crc32(F.col("ud")) % 2 == 1)
    merged = sketches.hll_merge(
        sketches.hll_registers(half_a, F.col("ud"), ["event_type"]),
        sketches.hll_registers(half_b, F.col("ud"), ["event_type"]),
    )
    one_pass = sketches.hll_estimate(ud, F.col("ud"), ["event_type"])
    via_merge = sketches.hll_estimate_registers(merged, ["event_type"])
    a = {r["event_type"]: r["hll_est"] for r in one_pass.collect()}
    b = {r["event_type"]: r["hll_est"] for r in via_merge.collect()}
    assert a == b and len(a) == 5


def test_hll_accuracy_vs_exact(spark):
    """m=256 HLL has ~6.5% relative standard error; assert < 15% on the
    real fixture (deterministic, so this can never flake)."""
    ud = _user_days(spark)
    est = {
        r["event_type"]: r["hll_est"]
        for r in sketches.hll_estimate(ud, F.col("ud"), ["event_type"]).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in ud.groupBy("event_type")
        .agg(F.countDistinct("ud").alias("n"))
        .collect()
    }
    for t, n in exact.items():
        assert abs(est[t] - n) / n < 0.15, (t, est[t], n)


def test_hll_duplicate_insensitive(spark):
    """Feeding each key twice must not move a cardinality sketch."""
    ud = _user_days(spark)
    doubled = ud.unionByName(ud)
    a = sketches.hll_estimate(ud, F.col("ud"), ["event_type"]).collect()
    b = sketches.hll_estimate(doubled, F.col("ud"), ["event_type"]).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_cms_never_underestimates(spark):
    """CMS point estimates are >= truth by construction; with 1024
    columns on this corpus the overshoot should also stay tiny."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    toks = docs.select(
        F.explode(STANDARD_ANALYZER.tokens_expr("text")).alias("term")
    )
    counters = sketches.cms_build(toks, F.col("term"))
    truth = {
        r["term"]: r["cf"]
        for r in toks.groupBy("term").agg(F.count("*").alias("cf")).collect()
    }
    probe_keys = list(truth)[:10] + ["never-seen-term"]
    est = {
        r["key"]: r["est"]
        for r in sketches.cms_query(counters, probe_keys).collect()
    }
    assert est["never-seen-term"] >= 0
    for k in probe_keys[:-1]:
        assert est[k] >= truth[k], (k, est[k], truth[k])
        assert est[k] <= truth[k] * 2, (k, est[k], truth[k])


def test_cms_cells_match_engine_hash(spark):
    """Driver-side hashlib md5 cells must agree with the JVM md5 used
    to build the counters — probe a key that exists and confirm the
    exact counter values are found (non-zero) for every row."""
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    toks = docs.select(
        F.explode(STANDARD_ANALYZER.tokens_expr("text")).alias("term")
    )
    counters = sketches.cms_build(toks, F.col("term"))
    some_term = toks.limit(1).collect()[0]["term"]
    cond = None
    for r, c in sketches.cms_cells(some_term):
        leg = (F.col("row") == r) & (F.col("col") == c)
        cond = leg if cond is None else (cond | leg)
    assert counters.filter(cond).count() == 4


def test_kmv_jaccard_accuracy(spark):
    """k=64 theta-sketch Jaccard vs the exact set Jaccard on the
    user-day sets: deterministic fixture, assert absolute error < 0.2
    on every pair (RSE ~ 1/sqrt(k) = 12.5%)."""
    ud = _user_days(spark)
    sk = sketches.kmv_sketch(ud, F.col("ud"), "event_type", k=64)
    est = {
        (r["ga"], r["gb"]): r["jaccard_est"]
        for r in sketches.kmv_pair_overlap(sk, k=64).collect()
    }
    sets = {
        r["event_type"]: set(r["uds"])
        for r in ud.groupBy("event_type")
        .agg(F.collect_set("ud").alias("uds"))
        .collect()
    }
    types = sorted(sets)
    assert len(est) == len(types) * (len(types) - 1) // 2
    for i, a in enumerate(types):
        for b in types[i + 1 :]:
            exact = len(sets[a] & sets[b]) / len(sets[a] | sets[b])
            assert abs(est[(a, b)] - exact) < 0.2, (a, b, est[(a, b)], exact)


# --------------------------------------------------------------------- #
# DDSketch quantiles
# --------------------------------------------------------------------- #
def _values(spark):
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    return (
        spark.read.parquet(os.path.join(sf, "events.parquet"))
        .select(F.round(F.col("value") * 100).cast("long").alias("c"))
    )


def test_dds_relative_error_bound(spark):
    """Every DDSketch quantile estimate is within the alpha=2% relative
    error of the EXACT quantile — the sketch's contract (Masson 2019,
    Thm. 1) on the real fixture distribution."""
    v = _values(spark)
    sk = sketches.dd_sketch(v, "c")
    qs = [0.25, 0.5, 0.75, 0.9, 0.99]
    est = {
        r["pct"]: r["estimate"]
        for r in sketches.dd_quantiles(sk, qs, scale=100.0).collect()
    }
    exact = v.agg(
        F.expr(
            "percentile(c, array(" + ",".join(str(q) for q in qs) + "))"
        ).alias("p")
    ).collect()[0]["p"]
    for q, ex in zip(qs, exact):
        ex /= 100.0
        assert abs(est[q] - ex) <= 0.021 * ex + 1e-9, (q, est[q], ex)


def test_dds_merge_is_lossless(spark):
    """Per-partition (here: per-event_type) sketches merged by count
    addition equal the sketch built over the whole data — bucket for
    bucket, and therefore quantile for quantile."""
    import os

    sf = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    e = spark.read.parquet(os.path.join(sf, "events.parquet")).select(
        "event_type", F.round(F.col("value") * 100).cast("long").alias("c")
    )
    whole = sketches.dd_sketch(e, "c")
    parts = [
        sketches.dd_sketch(e.filter(F.col("event_type") == t), "c")
        for t in ["click", "error", "purchase", "signup", "view"]
    ]
    merged = sketches.dd_merge(*parts)
    a = {r["bucket"]: r["cnt"] for r in whole.collect()}
    b = {r["bucket"]: r["cnt"] for r in merged.collect()}
    assert a == b and sum(a.values()) == e.count()


def test_dds_bucket_keyspace_is_bounded(spark):
    """The sketch's key space is the bucket count (log-range / alpha),
    not the value cardinality: cents span ~5 decades -> well under 600
    buckets at alpha=2%."""
    v = _values(spark)
    sk = sketches.dd_sketch(v, "c")
    n_buckets = sk.count()
    n_distinct = v.distinct().count()
    assert n_buckets < 600 and n_buckets < n_distinct


# --------------------------------------------------------------------- #
# Bloom filter: no false negatives ever, fp rate within theory, and the
# prefilter+verify composition is EXACT (the runtime semi-join contract).
# --------------------------------------------------------------------- #
def test_bloom_no_false_negatives(spark):
    keys = spark.range(0, 3000, 3).select(F.col("id").alias("k"))
    words = sketches.bloom_build(keys, "k", num_bits=1 << 13, num_hashes=4)
    probe = spark.range(3000).select(F.col("id").alias("x"))
    passed = probe.filter(
        sketches.bloom_might_contain(F.col("x"), words, 1 << 13, 4)
    )
    missed = keys.join(passed, F.col("k") == F.col("x"), "left_anti").count()
    assert missed == 0


def test_bloom_fp_rate_within_theory(spark):
    """n=500 keys in m=2^12 bits with k=4 hashes: theoretical fp
    (1-e^{-kn/m})^k ≈ 2.5%; assert under 4× of that on a disjoint
    probe set (hash determinism makes this exact-repeatable)."""
    keys = spark.range(0, 5000, 10).select(F.col("id").alias("k"))  # 500
    m, k = 1 << 12, 4
    words = sketches.bloom_build(keys, "k", num_bits=m, num_hashes=k)
    probe = spark.range(10000, 30000).select(F.col("id").alias("x"))
    fp = probe.filter(
        sketches.bloom_might_contain(F.col("x"), words, m, k)
    ).count()
    assert fp / 20000 < 0.10


def test_bloom_prefilter_verify_is_exact(spark):
    """bloom prefilter -> exact verify join == plain semi-join. The
    composition the bloom_semijoin registry query ships."""
    keys = spark.range(0, 2000, 7).select(F.col("id").alias("k"))
    words = sketches.bloom_build(keys, "k", num_bits=1 << 12, num_hashes=4)
    probe = spark.range(4000).select(F.col("id").alias("x"))
    via_bloom = (
        probe.filter(sketches.bloom_might_contain(F.col("x"), words, 1 << 12, 4))
        .join(F.broadcast(keys), F.col("x") == F.col("k"), "left_semi")
        .count()
    )
    plain = probe.join(keys, F.col("x") == F.col("k"), "left_semi").count()
    assert via_bloom == plain


def test_bloom_no_false_negatives_property(spark):
    """Hypothesis: for ANY key set and probe set, every true key passes
    the filter (no false negatives, the Bloom invariant)."""
    try:
        from hypothesis import given, settings, strategies as st
    except ImportError:
        pytest.skip("hypothesis not installed")

    built = {}

    @settings(max_examples=10, deadline=None)
    @given(
        keys=st.lists(
            st.integers(min_value=-(10**9), max_value=10**9),
            min_size=1,
            max_size=50,
            unique=True,
        )
    )
    def check(keys):
        kt = tuple(sorted(keys))
        if kt not in built:
            kdf = spark.createDataFrame([(k,) for k in keys], "k long")
            built[kt] = sketches.bloom_build(
                kdf, "k", num_bits=1 << 10, num_hashes=3
            )
        words = built[kt]
        kdf = spark.createDataFrame([(k,) for k in keys], "k long")
        passed = kdf.filter(
            sketches.bloom_might_contain(F.col("k"), words, 1 << 10, 3)
        ).count()
        assert passed == len(keys)

    check()
