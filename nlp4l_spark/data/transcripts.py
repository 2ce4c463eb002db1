"""Deterministic synthetic transcripts generator (FIXTURES.md §1b).

Generates the exact input shape mandated by BASELINE.json input_hint:
(conv_id string, turn_idx int, role string, text string, tool string,
ts timestamp). Fully distributed (mapInPandas over spark.range) and
*parallelism-independent*: every value is a pure function of the global
row id via a counter-based hash (splitmix64), so local[8] and local[32]
produce byte-identical tables — required for the two-cluster-size scaling
evidence (north_rule).

Properties (seed=42 defaults):
* ~N/8 conversations, 8 turns each.
* Vocabulary of ``vocab_size`` terms with Zipfian frequencies (s=1.07) —
  exercises head-term skew in the groupBy(term) build shuffle.
* Turn lengths 1..200 tokens.
* Rare "needle" terms with exactly known postings: doc i gets token
  ``needle{j}`` iff i % needle_every == j * 17 % needle_every … kept
  simple: i % needle_every == 0 -> needle{(i // needle_every) % n_needles}.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from nlp4l_spark.data.fixtures import ROLES, TOOLS, TRANSCRIPTS_SCHEMA_DDL

_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 — a counter-based RNG (public domain algo)."""
    z = (x + np.uint64(0x9E3779B97F4A7C15)) & _MASK
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _MASK
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _MASK
    return z ^ (z >> np.uint64(31))


def _hash2(a: np.ndarray, b: np.ndarray | int, seed: int) -> np.ndarray:
    return _splitmix64(
        (a.astype(np.uint64) * np.uint64(0x2545F4914F6CDD1D))
        ^ (np.uint64(b) if np.isscalar(b) else b.astype(np.uint64))
        ^ np.uint64(seed)
    )


class _ZipfVocab:
    """Per-executor cached Zipf CDF + vocabulary strings."""

    _cache: dict[tuple[int, float], tuple[np.ndarray, np.ndarray]] = {}

    @classmethod
    def get(cls, vocab_size: int, s: float = 1.07):
        key = (vocab_size, s)
        if key not in cls._cache:
            ranks = np.arange(1, vocab_size + 1, dtype=np.float64)
            w = 1.0 / np.power(ranks, s)
            cdf = np.cumsum(w) / w.sum()
            vocab = np.array([f"w{i:05d}" for i in range(vocab_size)], dtype=object)
            cls._cache[key] = (cdf, vocab)
        return cls._cache[key]


def synth_transcripts(
    spark: SparkSession,
    n_turns: int,
    *,
    seed: int = 42,
    vocab_size: int = 50_000,
    turns_per_conv: int = 8,
    max_len: int = 200,
    needle_every: int = 997,
    n_needles: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    base_ts = _dt.datetime(2026, 1, 1).timestamp()
    roles = np.array(ROLES, dtype=object)
    tools = np.array(TOOLS, dtype=object)

    def gen(batches):
        cdf, vocab = _ZipfVocab.get(vocab_size)
        for pdf in batches:
            ids = pdf["id"].to_numpy(dtype=np.int64)
            if ids.size == 0:
                continue
            u_ids = ids.astype(np.uint64)
            lens = 1 + (_hash2(u_ids, 0, seed) % np.uint64(max_len)).astype(np.int64)
            total = int(lens.sum())
            owner = np.repeat(np.arange(ids.size), lens)
            pos = np.arange(total) - np.repeat(np.cumsum(lens) - lens, lens)
            h = _hash2(u_ids[owner], pos.astype(np.uint64) + np.uint64(1), seed)
            u = (h >> np.uint64(11)).astype(np.float64) / float(1 << 53)
            tok_idx = np.searchsorted(cdf, u, side="right")
            toks = vocab[np.minimum(tok_idx, vocab_size - 1)]
            # needles: doc i (global) gets an extra trailing needle token
            starts = np.cumsum(lens) - lens
            texts = []
            for r in range(ids.size):
                words = toks[starts[r] : starts[r] + lens[r]]
                t = " ".join(words)
                i = ids[r]
                if i % needle_every == 0:
                    t += f" needle{(i // needle_every) % n_needles:02d}"
                texts.append(t)
            conv = np.char.mod("conv-%08d", (ids // turns_per_conv)).astype(object)
            out = pd.DataFrame(
                {
                    "conv_id": conv,
                    "turn_idx": (ids % turns_per_conv).astype(np.int32),
                    "role": roles[ids % len(roles)],
                    "text": texts,
                    "tool": tools[(ids // 3) % len(tools)],
                    "ts": pd.to_datetime(base_ts + ids * 7.0, unit="s"),
                }
            )
            yield out

    rng = spark.range(n_turns, numPartitions=num_partitions)
    return rng.mapInPandas(gen, TRANSCRIPTS_SCHEMA_DDL)


def synth_queries(n_queries: int = 20, *, vocab_size: int = 50_000, seed: int = 7):
    """Deterministic query mix per FIXTURES.md §2: rare terms, head terms,
    2-4 term OR queries, stopword-only, unknown terms."""
    rng = np.random.RandomState(seed)
    queries: list[tuple[int, str, int]] = []
    qid = 0
    kinds = ["head", "rare", "or2", "or4", "needle", "stop", "unknown"]
    for qid in range(n_queries):
        kind = kinds[qid % len(kinds)]
        if kind == "head":
            q = f"w{rng.randint(0, 20):05d}"
        elif kind == "rare":
            q = f"w{rng.randint(vocab_size // 2, vocab_size):05d}"
        elif kind == "or2":
            q = f"w{rng.randint(0, 100):05d} w{rng.randint(100, 5000):05d}"
        elif kind == "or4":
            q = " ".join(f"w{rng.randint(0, vocab_size):05d}" for _ in range(4))
        elif kind == "needle":
            q = f"needle{rng.randint(0, 20):02d}"
        elif kind == "stop":
            q = "the is of and"
        else:
            q = "zzzznotaterm"
        queries.append((qid, q, 10))
    return queries
