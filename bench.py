#!/usr/bin/env python
"""Benchmark harness: headline queries + index-build throughput + scaling.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...,
   "build": {"turns": N, "turns_per_sec": ...},
   "scaling": {"local8_turns_per_sec": ..., "local32_turns_per_sec": ...,
               "efficiency": ...}}

Env knobs:
  SPARK_GRAFT_SF_DIR   data dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     cores for the main run (default 32)
  SPARK_GRAFT_BENCH_TURNS  synthetic corpus size for the build benchmark
                           (default 100000)
  SPARK_GRAFT_SCALING  "1" to run the N-vs-4N-core scaling evidence
                       (default 1; the same job at local[8] and local[32]
                       on the same input — the sandbox proxy for the
                       north_rule's two-cluster-size run)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "100000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
# Scaling evidence corpus is sized ADAPTIVELY: a calibration build at
# local[32] estimates throughput, then the corpus is scaled so the
# 32-core run takes ~TARGET_T32 seconds — large enough that per-build
# fixed overhead (~10-15s of job launches, python worker spin-up, parquet
# commits) doesn't dominate the N-vs-4N ratio, and self-adjusting to this
# sandbox VM's multi-x machine-speed swings (CPU steal + khugepaged
# compaction stalls). Best-of-N repeats per level filters residual noise.
SCALING_MIN_TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_TURNS", "300000"))
SCALING_MAX_TURNS = int(os.environ.get("SPARK_GRAFT_SCALING_MAX_TURNS", "3000000"))
SCALING_TARGET_T32 = float(os.environ.get("SPARK_GRAFT_SCALING_TARGET_T32", "75"))
SCALING_REPEATS = int(os.environ.get("SPARK_GRAFT_SCALING_REPEATS", "2"))

BENCH_QUERIES = [
    "wordcount_cf",
    "bm25_topk",
    "index_bm25_topk",
    "tfidf_weights",
    "dedup_exact",
    "dedup_ngram_pairs",
    "dedup_minhash",
    "ann_cosine_topk",
    "quality_score",
    "token_count",
]


def make_session(cores: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"nlp4l-bench-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(cores, 8)))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )


def warmup(spark):
    """Pay JVM JIT + python-worker startup before any timing."""
    from nlp4l_spark.data.transcripts import synth_transcripts
    from nlp4l_spark.index import build_index

    tmp = "/tmp/nlp4l_bench_warm"
    shutil.rmtree(tmp, ignore_errors=True)
    build_index(synth_transcripts(spark, 2000), tmp)
    shutil.rmtree(tmp, ignore_errors=True)


def timed_build(spark, n_turns: int, out_dir: str) -> float:
    from nlp4l_spark.data.transcripts import synth_transcripts
    from nlp4l_spark.index import build_index

    shutil.rmtree(out_dir, ignore_errors=True)
    df = synth_transcripts(spark, n_turns)
    t0 = time.time()
    build_index(df, out_dir)
    return time.time() - t0


def run_queries(spark) -> dict[str, float]:
    from nlp4l_spark import entry_queries as eq

    # fresh index cache so index_bm25_topk measures a real build+search
    shutil.rmtree(eq._index_cache_dir(SF_DIR), ignore_errors=True)
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        fn = eq.REGISTRY[name][0]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        out[name] = round(time.time() - t0, 3)
        print(f"  {name}: {out[name]}s ({n} rows)", file=sys.stderr)
    return out


def main():
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    result: dict = {"metric": "headline_queries_total", "unit": "sec", "sf": sf}

    scaling = {}
    if RUN_SCALING:
        # calibrate on local[32], then measure both levels on the SAME
        # deterministic input (synth generator is parallelism-independent)
        spark = make_session(32)
        warmup(spark)
        cal_secs = timed_build(
            spark, SCALING_MIN_TURNS, "/tmp/nlp4l_bench_idx_cal"
        )
        rate = SCALING_MIN_TURNS / cal_secs
        n_turns = int(min(max(rate * SCALING_TARGET_T32, SCALING_MIN_TURNS),
                          SCALING_MAX_TURNS) // 100_000 * 100_000) or SCALING_MIN_TURNS
        print(
            f"  scaling calibration: {cal_secs:.1f}s @ {SCALING_MIN_TURNS} "
            f"-> corpus {n_turns}",
            file=sys.stderr,
        )
        spark.stop()
        for cores, key in ((8, "local8"), (32, "local32")):
            spark = make_session(cores)
            warmup(spark)
            best = None
            for rep in range(SCALING_REPEATS):
                secs = timed_build(
                    spark, n_turns, f"/tmp/nlp4l_bench_idx_{cores}"
                )
                print(
                    f"  build@local[{cores}] rep{rep}: {secs:.1f}s",
                    file=sys.stderr,
                )
                best = secs if best is None else min(best, secs)
            scaling[f"{key}_turns_per_sec"] = round(n_turns / best, 1)
            scaling[f"{key}_sec"] = round(best, 2)
            spark.stop()
        scaling["turns"] = n_turns
        scaling["repeats"] = SCALING_REPEATS
        scaling["efficiency"] = round(
            (scaling["local32_turns_per_sec"] / scaling["local8_turns_per_sec"]) / 4.0,
            3,
        )

    spark = make_session(CPUS)
    warmup(spark)
    build_secs = timed_build(spark, BENCH_TURNS, "/tmp/nlp4l_bench_idx_main")
    queries = run_queries(spark)
    spark.stop()

    result["queries"] = queries
    result["value"] = round(sum(queries.values()) + build_secs, 3)
    result["build"] = {
        "turns": BENCH_TURNS,
        "sec": round(build_secs, 2),
        "turns_per_sec": round(BENCH_TURNS / build_secs, 1),
    }
    if scaling:
        result["scaling"] = scaling
    print(json.dumps(result))


if __name__ == "__main__":
    main()
