"""Streaming ANN ingest: a writeStream foreachBatch hook appending each
micro-batch of embeddings into the materialized ANN index
(ops/ann_index.append_ann_index), with probes seeing every adopted batch
immediately and pruning/meta-column behavior preserved — the streaming
counterpart the append_ann_index docstring promises."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from nlp4l_spark.ops.ann_index import (
    append_ann_index,
    build_ann_index,
    ivf_topk_indexed,
    lsh_topk_indexed,
)
from nlp4l_spark.ops.similarity import brute_force_cosine_topk

DIM = 16
SCHEMA = "vec_id long, embedding array<float>, label int"


def _vecs(spark, ids):
    rng_rows = []
    for i in ids:
        rng = np.random.default_rng(i)
        rng_rows.append(
            (i, [float(x) for x in rng.normal(size=DIM)], int(i % 3))
        )
    return spark.createDataFrame(rng_rows, SCHEMA)


def test_foreachbatch_append_keeps_probes_exact(spark, tmp_path):
    idx = str(tmp_path / "annidx")
    in_dir = str(tmp_path / "in")
    chk = str(tmp_path / "chk")

    base = _vecs(spark, range(0, 40))
    cents = [
        r["embedding"]
        for r in base.filter("vec_id < 4").orderBy("vec_id").collect()
    ]
    # recall-heavy geometry (the registry trick) so indexed == exact
    build_ann_index(
        base, idx, bits=1, tables=12, centroids=cents, meta_cols=["label"]
    )

    # stream two micro-batches of NEW vectors through foreachBatch
    _vecs(spark, range(40, 60)).coalesce(1).write.mode("append").parquet(
        os.path.join(in_dir, "b1")
    )
    _vecs(spark, range(60, 80)).coalesce(1).write.mode("append").parquet(
        os.path.join(in_dir, "b2")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("recursiveFileLookup", "true")
        .parquet(in_dir)
    )
    q = (
        stream.writeStream.foreachBatch(
            lambda bdf, _bid: append_ann_index(bdf, idx)
        )
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    allv = _vecs(spark, range(0, 80))
    qvec = allv.filter("vec_id = 0").select("embedding").first()[0]

    got = [tuple(r) for r in lsh_topk_indexed(spark, idx, qvec, k=5).collect()]
    want = [
        tuple(r) for r in brute_force_cosine_topk(allv, qvec, k=5).collect()
    ]
    assert got == want
    # appended rows must be visible to the top-k (ids >= 40 can win)
    ids = {
        r["vec_id"]
        for r in lsh_topk_indexed(spark, idx, qvec, k=80).collect()
    }
    assert ids & set(range(40, 80)), "streamed batches invisible to probes"

    # meta column (label) survived the append: filtered probes work on
    # streamed rows too
    flt = F.col("label") == 1
    gotf = [
        tuple(r)
        for r in lsh_topk_indexed(spark, idx, qvec, k=5, where=flt).collect()
    ]
    wantf = [
        tuple(r)
        for r in brute_force_cosine_topk(allv, qvec, k=5, where=flt).collect()
    ]
    assert gotf == wantf

    # IVF layout received the appends as well
    got_ivf = {
        r["vec_id"]
        for r in ivf_topk_indexed(spark, idx, qvec, k=80, nprobe=4).collect()
    }
    assert got_ivf & set(range(40, 80))
