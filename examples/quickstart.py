#!/usr/bin/env python
"""nlp4l_spark in five minutes: build an inverted index over transcript
turns, search it six ways, dedup a corpus, and probe an ANN index.

Run driver-local:   python examples/quickstart.py
Run on a cluster:   python scripts/make_pyfiles.py &&
                    spark-submit --py-files dist/nlp4l_spark.zip \
                        examples/quickstart.py

Everything here is the public library surface (no test helpers);
tests/test_quickstart.py executes this file end-to-end so it can never
rot. Swap `synth_transcripts` for `spark.read.parquet(...)` of any table
shaped (conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp).
"""

import shutil
import tempfile

from pyspark.sql import SparkSession, functions as F


def main(spark: SparkSession) -> None:
    from nlp4l_spark.data.transcripts import synth_transcripts
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.ops import dedup, similarity, textqc
    from nlp4l_spark.search import Searcher

    work = tempfile.mkdtemp(prefix="nlp4l_quickstart_")
    idx = f"{work}/idx"

    # 1. Build: transcripts -> postings/term_stats/doc_lens/stored tables.
    #    store_term_vectors enables phrase/span/highlight paths.
    turns = synth_transcripts(spark, 20_000, num_partitions=8)
    IndexBuilder(store_term_vectors=True).build(turns, idx)

    # 2. Search the index.
    s = Searcher(spark, idx)
    print("BM25 top-3:")
    s.search("w00001 w00454 needle03", k=3).show()
    print('Boolean "+must -not should":')
    s.search_lucene("+w00001 -w00999 w00454^2", k=3).show()
    print("Exact phrase:")
    s.search_phrase("w00001 w00002", k=3).show()
    print('Sloppy 3-term phrase "...":')
    s.search_sloppy_phrase_multi("w00001 w00002 w00003", slop=4, k=3).show()
    print("Collapsed (one hit per conversation):")
    s.search_collapse("w00001 w00454", k=3).show()
    print("Highlight from the forward index:")
    s.highlight_indexed("w00001 w00002", k=2).show(truncate=60)

    # 3. Training-data ops over a documents table.
    docs = (
        turns.limit(2000)
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.col("text"),
        )
    )
    print("Exact dedup survivors:", dedup.exact_dedup(docs).count())
    print(
        "MinHash-LSH candidate pairs:",
        dedup.minhash_lsh_pairs(docs).count(),
    )
    print("Quality scores:")
    textqc.quality_score(docs).orderBy(F.desc("quality")).show(3)

    # 4. ANN over an embedding column (here: synthetic 8-dim vectors).
    emb = docs.limit(500).select(
        F.col("doc_id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(8)),
            lambda i: (F.pmod(F.xxhash64("text", i), F.lit(1000)) / 500.0)
            - 1.0,
        ).cast("array<float>").alias("embedding"),
    )
    qvec = emb.first()["embedding"]
    print("Brute-force cosine top-3:")
    similarity.brute_force_cosine_topk(emb, qvec, k=3).show()

    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main(
        SparkSession.builder.master("local[*]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("nlp4l_spark-quickstart")
        .getOrCreate()
    )
