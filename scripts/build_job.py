#!/usr/bin/env python
"""spark-submit entrypoint: build the inverted index (and optionally run a
query) on a cluster, with the library shipped via --py-files.

The north_rule requires the build to "run via spark-submit --py-files on a
multi-executor cluster" (BASELINE.json:14). This script contains NO logic of
its own — it only parses args and calls the library, so it works identically
under `python` (driver-local dev) and `spark-submit --py-files
dist/nlp4l_spark.zip` (cluster: the zip is what executors import from).

Usage:
    python scripts/make_pyfiles.py              # -> dist/nlp4l_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/nlp4l_spark.zip scripts/build_job.py \
        --input  /path/to/transcripts_parquet   # or --synth N
        --out    /path/to/index_dir \
        [--query "terms ..." --k 10]

Prints one JSON line: build stats (+ top-k hits if --query given).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main() -> int:
    p = argparse.ArgumentParser()
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="parquet dir with the transcripts table")
    src.add_argument(
        "--synth", type=int, help="generate N deterministic synthetic turns"
    )
    p.add_argument("--out", required=True, help="index output directory")
    p.add_argument("--query", help="after building, run this query")
    p.add_argument("--k", type=int, default=10)
    p.add_argument(
        "--docs-per-shard",
        type=int,
        default=None,
        help="doc-range shard width for posting lists (default: builder's)",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # master/executors/memory come from spark-submit; only app-level conf here
    spark = (
        SparkSession.builder.appName("nlp4l-index-build")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from nlp4l_spark.index import build_index

    if args.input:
        df = spark.read.parquet(args.input)
    else:
        from nlp4l_spark.data.transcripts import synth_transcripts

        df = synth_transcripts(spark, args.synth)

    t0 = time.time()
    if args.docs_per_shard is not None:
        from nlp4l_spark.index.builder import IndexBuilder

        cat = IndexBuilder(docs_per_shard=args.docs_per_shard).build(
            df, args.out
        )
    else:
        cat = build_index(df, args.out)
    build_secs = time.time() - t0

    n_docs = int(cat.read(spark, "field_stats").collect()[0]["num_docs"])
    out = {
        "index_dir": args.out,
        "num_docs": n_docs,
        "build_sec": round(build_secs, 2),
        "turns_per_sec": round(n_docs / build_secs, 1),
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
    }

    if args.query:
        from nlp4l_spark.search import Searcher

        hits = Searcher(spark, args.out).search(args.query, k=args.k).collect()
        out["query"] = args.query
        out["hits"] = [
            {"doc_id": r["doc_id"], "score": round(r["score"], 6)} for r in hits
        ]

    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
