"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schema, batching, partition sizing, UDF
signatures) is real and tested; the actual media decode is STUBBED — the
sandbox has no image/audio libraries — behind ``decoder=`` hooks. The
default ``deterministic_fake_features`` derives features from a hash of
the bytes so tests have exact expectations; ``strict_decoder`` raises
NotImplementedError to mark the integration point.

Design for 100 TB of media: binary payloads ride in their own column so
Parquet column pruning means metadata-only queries never read the bytes;
``mapInPandas`` with ``spark.sql.files.maxPartitionBytes`` sized so one
Arrow batch of payloads fits executor memory; feature outputs are compact
fixed-width arrays.
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def strict_decoder(payload: bytes, kind: str) -> np.ndarray:
    """The real decode integration point. Plug in PIL/librosa/pyav here."""
    raise NotImplementedError(
        "media decode requires image/audio libs not present in this "
        "environment; use deterministic_fake_features for plumbing tests"
    )


def deterministic_fake_features(payload: bytes, kind: str) -> np.ndarray:
    """Deterministic FEATURE_DIM-vector from the payload bytes (blake2b
    seeded), standing in for a real embedding so plumbing is testable."""
    import hashlib

    h = hashlib.blake2b(payload or b"", digest_size=FEATURE_DIM * 4).digest()
    return (
        np.frombuffer(h, dtype=np.uint32).astype(np.float32)
        / np.float32(2**32)
    )


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, str], np.ndarray] = deterministic_fake_features,
) -> DataFrame:
    """media table -> (media_id, kind, n_bytes, features[FEATURE_DIM]).

    One Arrow pass over payload batches; the decoder sees raw bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                decoder(p if p is not None else b"", k).tolist()
                for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "features": feats,
                }
            )

    return df.select("media_id", "kind", "payload").mapInPandas(
        run, FEATURES_SCHEMA
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows laid out
    without decoding — the explode is metadata-only (duration_ms), so the
    payload column is pruned from the scan entirely."""
    return df.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    import hashlib

    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.blake2b(
            f"{seed}:{i}".encode(), digest_size=32
        ).digest() * (1 + i % 4)
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 512 if kind != "audio" else None,
                64 + (i * 7) % 512 if kind != "audio" else None,
                (i % 30) * 1000 if kind != "image" else None,
                payload,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
