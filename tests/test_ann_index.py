"""Materialized ANN index (ops/ann_index.py): layout, probe identity with
the full-scan paths, k-means centroid fit, and meta round-trip."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from nlp4l_spark.ops import similarity
from nlp4l_spark.ops.ann_index import (
    build_ann_index,
    fit_centroids,
    ivf_topk_indexed,
    lsh_topk_indexed,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(os.path.join(SF, "embeddings.parquet"))


def test_ivf_indexed_identical_to_full_scan(spark, tmp_path):
    emb = _emb(spark)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cents = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    d = str(tmp_path / "ann")
    build_ann_index(emb, d, bits=4, tables=8, centroids=cents)
    indexed = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_indexed(spark, d, qvec, k=10, nprobe=2).collect()
    ]
    full = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_cosine_topk(
            emb, qvec, cents, k=10, nprobe=2
        ).collect()
    ]
    assert indexed == full


def test_lsh_indexed_matches_full_scan_lsh(spark, tmp_path):
    emb = _emb(spark)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cents = [emb.select("embedding").first()[0]]
    d = str(tmp_path / "ann")
    build_ann_index(emb, d, bits=4, tables=8, seed=7, centroids=cents)
    indexed = [
        (r["vec_id"], r["cosine"])
        for r in lsh_topk_indexed(spark, d, qvec, k=10).collect()
    ]
    full = [
        (r["vec_id"], r["cosine"])
        for r in similarity.lsh_cosine_topk(
            emb, qvec, k=10, bits=4, tables=8, seed=7
        ).collect()
    ]
    # same geometry (seed/bits/tables) -> identical candidate set, so the
    # indexed probe must reproduce the full-scan LSH result exactly
    assert indexed == full


def test_lsh_layout_partitioned_by_table_and_bucket(spark, tmp_path):
    emb = _emb(spark)
    d = str(tmp_path / "ann")
    build_ann_index(
        emb, d, bits=2, tables=2, centroids=[emb.select("embedding").first()[0]]
    )
    tbl_dirs = [
        p for p in os.listdir(os.path.join(d, "lsh")) if p.startswith("tbl=")
    ]
    assert sorted(tbl_dirs) == ["tbl=0", "tbl=1"]
    buckets = os.listdir(os.path.join(d, "lsh", "tbl=0"))
    assert all(b.startswith("bucket=") for b in buckets)
    meta = json.load(open(os.path.join(d, "meta.json")))
    assert meta["bits"] == 2 and meta["tables"] == 2 and meta["dim"] == 64


def test_append_extends_index_without_rebuild(spark, tmp_path):
    """append_ann_index signs/quantizes new vectors with the PERSISTED
    geometry: after an append, probes over the grown index equal a fresh
    build over the union."""
    from pyspark.sql import functions as F

    from nlp4l_spark.ops.ann_index import append_ann_index

    emb = _emb(spark)
    old = emb.filter(F.col("vec_id") < 300)
    new = emb.filter(F.col("vec_id") >= 300)
    cents = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]

    grown = str(tmp_path / "grown")
    build_ann_index(old, grown, bits=3, tables=8, centroids=cents)
    append_ann_index(new, grown)

    fresh = str(tmp_path / "fresh")
    build_ann_index(emb, fresh, bits=3, tables=8, centroids=cents)

    for fn, kw in [(lsh_topk_indexed, {}), (ivf_topk_indexed, {"nprobe": 3})]:
        a = [(r["vec_id"], r["cosine"]) for r in fn(spark, grown, qvec, k=10, **kw).collect()]
        b = [(r["vec_id"], r["cosine"]) for r in fn(spark, fresh, qvec, k=10, **kw).collect()]
        assert a == b, fn.__name__


def test_kmeans_centroid_fit_is_deterministic_and_probeable(spark, tmp_path):
    emb = _emb(spark).limit(200)
    c1 = fit_centroids(emb, n_cells=4, seed=11)
    c2 = fit_centroids(emb, n_cells=4, seed=11)
    assert c1 == c2
    qvec = emb.select("embedding").first()[0]
    d = str(tmp_path / "ann")
    build_ann_index(emb, d, bits=2, tables=2, centroids=None, n_cells=4)
    rows = ivf_topk_indexed(spark, d, qvec, k=5, nprobe=4).collect()
    # nprobe = all cells -> exact brute force
    exact = similarity.brute_force_cosine_topk(emb, qvec, k=5).collect()
    assert [r["vec_id"] for r in rows] == [r["vec_id"] for r in exact]


# ---------------- product quantization ------------------------------------- #
def test_pq_codebooks_deterministic_and_shaped(spark):
    from nlp4l_spark.ops.ann_index import fit_pq

    emb = _emb(spark)
    a = fit_pq(emb, m=8, ksub=16, seed=42)
    b = fit_pq(emb.repartition(7), m=8, ksub=16, seed=42)
    assert a.shape == (8, 16, 8)
    assert (a == b).all()  # partitioning-independent (sample by sorted id)


def test_pq_encode_codes_in_range(spark):
    from nlp4l_spark.ops.ann_index import fit_pq, pq_encode

    emb = _emb(spark)
    books = fit_pq(emb, m=8, ksub=16)
    rows = pq_encode(emb, books).select("codes").collect()
    for r in rows:
        assert len(r["codes"]) == 8
        assert all(0 <= c < 16 for c in r["codes"])


def test_pq_rerank_equals_exact(spark):
    from nlp4l_spark.ops.ann_index import fit_pq, pq_topk

    emb = _emb(spark)
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    books = fit_pq(emb, m=32, ksub=16)
    got = [
        (r["vec_id"], r["cosine"])
        for r in pq_topk(emb, qvec, books, k=10, rerank=128).collect()
    ]
    exp = [
        (r["vec_id"], r["cosine"])
        for r in similarity.brute_force_cosine_topk(emb, qvec, k=10).collect()
    ]
    assert got == exp
    # the query vector itself ranks first in ADC (it quantizes to itself)
    adc = pq_topk(emb, qvec, books, k=3, rerank=0).collect()
    assert adc[0]["vec_id"] == 7


def test_sq_encode_codes_in_range_and_python_free(spark):
    from nlp4l_spark.ops.ann_index import fit_sq, sq_encode

    emb = _emb(spark)
    mins, scales = fit_sq(emb)
    assert len(mins) == len(scales) == 64
    enc = sq_encode(emb, mins, scales)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # pure JVM encode
    for r in enc.select("codes").collect():
        assert len(r["codes"]) == 64
        assert all(0 <= c <= 255 for c in r["codes"])


def test_sq_rerank_equals_exact(spark):
    from nlp4l_spark.ops.ann_index import fit_sq, sq_topk

    emb = _emb(spark)
    qvec = emb.filter(F.col("vec_id") == 7).select("embedding").first()[0]
    mins, scales = fit_sq(emb)
    got = [
        (r["vec_id"], r["cosine"])
        for r in sq_topk(emb, qvec, mins, scales, k=10, rerank=64).collect()
    ]
    exp = [
        (r["vec_id"], r["cosine"])
        for r in similarity.brute_force_cosine_topk(emb, qvec, k=10).collect()
    ]
    assert got == exp
    # a constant dimension (scale 0) must not break encode or scoring
    import numpy as np

    emb2 = emb.withColumn(
        "embedding",
        F.concat(F.col("embedding"), F.array(F.lit(0.0).cast("float"))),
    )
    q2 = list(qvec) + [0.0]
    mins2, scales2 = fit_sq(emb2)
    assert scales2[-1] == 0.0
    top = sq_topk(emb2, q2, mins2, scales2, k=3, rerank=16).collect()
    assert top[0]["vec_id"] == 7  # self still first
    # an all-zero vector in the corpus must not poison the per-dim fit
    # with NaN (norm guarded to 1.0, like the NumPy paths)
    import numpy as np

    zero_row = emb.sparkSession.createDataFrame(
        [(99999, [0.0] * 64)], "vec_id long, embedding array<float>"
    )
    emb3 = emb.select("vec_id", "embedding").unionByName(zero_row)
    mins3, scales3 = fit_sq(emb3)
    assert not np.isnan(mins3).any() and not np.isnan(scales3).any()
    top3 = sq_topk(emb3, qvec, mins3, scales3, k=3, rerank=16).collect()
    assert top3[0]["vec_id"] == 7


def test_ivfpq_probe_matches_ivf_probe(spark, tmp_path):
    from nlp4l_spark.ops.ann_index import build_ann_index, ivfpq_topk_indexed

    emb = _emb(spark)
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    cents = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    d = str(tmp_path / "annpq")
    build_ann_index(emb, d, bits=4, tables=8, centroids=cents, pq=True, pq_m=32)
    # rerank >> k: IVF-PQ must reproduce the exact-scoring IVF probe
    got = [
        (r["vec_id"], r["cosine"])
        for r in ivfpq_topk_indexed(spark, d, qvec, k=10, nprobe=2, rerank=256).collect()
    ]
    exp = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_indexed(spark, d, qvec, k=10, nprobe=2).collect()
    ]
    assert got == exp
    # codes persisted in the layout + codebooks in meta
    import json as _json
    meta = _json.load(open(os.path.join(d, "meta.json")))
    assert len(meta["pq_codebooks"]) == 32
    rows = spark.read.parquet(os.path.join(d, "ivf")).select("codes").head(3)
    assert all(len(r["codes"]) == 32 for r in rows)
    # append path encodes codes too (meta fixes the codebooks)
    from nlp4l_spark.ops.ann_index import append_ann_index

    extra = emb.filter(F.col("vec_id") < 2).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "embedding"
    )
    append_ann_index(extra, d)
    appended = spark.read.parquet(os.path.join(d, "ivf")).filter(
        F.col("id") >= 100000
    )
    assert appended.count() == 2
    assert all(len(r["codes"]) == 32 for r in appended.select("codes").collect())
    # the appended clone of vec 0 (identical vector) now ranks with it
    got2 = [r["vec_id"] for r in ivfpq_topk_indexed(spark, d, qvec, k=3, nprobe=2, rerank=256).collect()]
    assert 100000 in got2

    # probe without pq metadata raises
    d2 = str(tmp_path / "annplain")
    build_ann_index(emb, d2, bits=4, tables=8, centroids=cents)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        ivfpq_topk_indexed(spark, d2, qvec)


def test_sq_in_layout_probe_matches_per_call_sq_and_appends(spark, tmp_path):
    """build_ann_index(sq=True) persists mins/scales in meta and d-byte
    codes in the cell rows; sq_topk_indexed must equal the per-call
    fit+encode path (flat) and the IVF probe (nprobe), and an append must
    encode new rows with the PERSISTED fit so a grown index probes
    identically to a fresh build."""
    from nlp4l_spark.ops.ann_index import (
        append_ann_index,
        fit_sq,
        sq_topk,
        sq_topk_indexed,
    )

    emb = _emb(spark)
    cents = [
        r["embedding"]
        for r in emb.filter(F.col("vec_id") < 8).orderBy("vec_id").collect()
    ]
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]

    idx = str(tmp_path / "sqidx")
    build_ann_index(emb, idx, bits=3, tables=8, centroids=cents, sq=True)
    meta = json.load(open(os.path.join(idx, "meta.json")))
    assert len(meta["sq_mins"]) == meta["dim"]

    # flat probe == the per-call fit+encode path (same fit: exact min/max)
    mins, scales = fit_sq(emb)
    a = [
        (r["vec_id"], r["cosine"])
        for r in sq_topk_indexed(spark, idx, qvec, k=10, rerank=64).collect()
    ]
    b = [
        (r["vec_id"], r["cosine"])
        for r in sq_topk(emb, qvec, mins, scales, k=10, rerank=64).collect()
    ]
    assert a == b

    # nprobe probe == the plain IVF probe (exact re-rank inside same cells)
    c = [
        (r["vec_id"], r["cosine"])
        for r in sq_topk_indexed(spark, idx, qvec, k=10, rerank=64, nprobe=3).collect()
    ]
    d = [
        (r["vec_id"], r["cosine"])
        for r in ivf_topk_indexed(spark, idx, qvec, k=10, nprobe=3).collect()
    ]
    assert c == d

    # append encodes with the persisted fit (NOT a refit over the union —
    # mins/scales stay frozen, like LSH planes/centroids)
    grown = str(tmp_path / "sqgrown")
    build_ann_index(
        emb.filter(F.col("vec_id") < 300), grown,
        bits=3, tables=8, centroids=cents, sq=True,
    )
    append_ann_index(emb.filter(F.col("vec_id") >= 300), grown)
    g = [
        (r["vec_id"], r["cosine"])
        for r in sq_topk_indexed(spark, grown, qvec, k=10, rerank=64).collect()
    ]
    meta_g = json.load(open(os.path.join(grown, "meta.json")))
    # probed result must still be the exact top-k over the full corpus
    # (rerank margin absorbs the subset-fit quantization difference)
    assert g == a
    # and the frozen fit is the subset's, not the union's
    sub_mins, _ = fit_sq(emb.filter(F.col("vec_id") < 300))
    assert meta_g["sq_mins"] == [float(x) for x in sub_mins]
