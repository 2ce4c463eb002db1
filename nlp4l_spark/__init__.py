"""nlp4l_spark — a PySpark-native inverted-index build + BM25 query engine.

A from-scratch rebuild of the query/data-processing capabilities of
NLP4L/nlp4l (reference: /root/reference, Scala/Lucene 7.2.1), re-expressed
Spark-first: DataFrame/SQL plans, Arrow-vectorized pandas UDFs for the
analyzer and posting codec, explicit salted shuffles for head-term skew,
and broadcast stats for BM25 scoring.

Layout:
  analysis/  tokenizer pipelines (Lucene-analyzer-equivalent contract)
  index/     docID assignment, varbyte posting codec, index builder, catalog
  search/    BM25 scoring: DataFrame path + block-max WAND path
  stats/     WordCounts / TFIDF / Stats parity surface
  ops/       processors (unique/merge/replay/...), dedup, ANN, text QC
  data/      deterministic fixtures + synthetic transcripts generator
"""

__version__ = "0.1.0"
