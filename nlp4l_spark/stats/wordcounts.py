"""WordCounts parity surface (reference: /root/reference/app/org/nlp4l/
lucene/stats/WordCounts.scala and RawReader.scala stats accessors).

All functions return DataFrames with explicitly aliased columns so they are
directly comparable to ANSI-SQL oracles. Every aggregation is a single
map-side-combinable groupBy — Catalyst plans partial_sum/final_sum, so the
shuffle moves one row per (partition, term), not per posting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nlp4l_spark.stats.corpus import Corpus


def count_whole_index(corpus: Corpus) -> DataFrame:
    """cf per term (WordCounts.countWholeIndex, :93-102) -> (term, cf)."""
    return corpus.doc_terms().groupBy("term").agg(F.sum("tf").alias("cf"))


def count_df(corpus: Corpus) -> DataFrame:
    """df per term (WordCounts.countDF, :113-122) -> (term, df).
    (doc_id, term) is unique in doc_terms, so count(*) == countDistinct(doc)."""
    return corpus.doc_terms().groupBy("term").agg(F.count("*").alias("df"))


def count_docset(corpus: Corpus, doc_ids: list[int]) -> DataFrame:
    """Σ tf per term over a docID set (WordCounts.count, :40-91)."""
    return (
        corpus.doc_terms()
        .filter(F.col("doc_id").isin([int(d) for d in doc_ids]))
        .groupBy("term")
        .agg(F.sum("tf").alias("cnt"))
    )


def top_terms_by_doc_freq(corpus: Corpus, n: int) -> DataFrame:
    """(RawReader.topTermsByDocFreq, :186-200). Deterministic tie-break by
    term asc so results are comparable; plans as TakeOrderedAndProject."""
    return (
        count_df(corpus).orderBy(F.desc("df"), F.asc("term")).limit(n)
    )


def top_terms_by_total_term_freq(corpus: Corpus, n: int) -> DataFrame:
    """(RawReader.topTermsByTotalTermFreq, :205-219)."""
    return (
        count_whole_index(corpus).orderBy(F.desc("cf"), F.asc("term")).limit(n)
    )


def count_prefix(corpus: Corpus, prefix: str) -> DataFrame:
    """# distinct terms with prefix (WordCounts.countPrefix, :124-126;
    term-dictionary range scan in RawWordCounts.java:29-60) -> 1 row.
    On a built index this is a range predicate on the sorted term column
    (parquet min/max pruning); here computed from the corpus."""
    return (
        corpus.doc_terms()
        .filter(F.col("term").startswith(prefix))
        .agg(F.countDistinct("term").alias("cnt"))
    )


def total_count(corpus: Corpus) -> DataFrame:
    """Σ all term freqs ≈ total tokens (WordCounts.totalCount, :136-151)."""
    return corpus.doc_lens().agg(F.sum("dl").cast("long").alias("total"))


def field_stats(corpus: Corpus, field_name: str = "text") -> DataFrame:
    """numDocs/sumDl/avgdl/uniqTerms (RawReader.numDocs/sumTotalTermFreq/
    docCount, RawReader.scala:95-160)."""
    lens = corpus.doc_lens().agg(
        F.count("*").alias("num_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    uniq = corpus.doc_terms().agg(F.countDistinct("term").alias("uniq_terms"))
    return lens.crossJoin(uniq).select(
        F.lit(field_name).alias("field"),
        "num_docs",
        "sum_dl",
        (F.col("sum_dl") / F.col("num_docs")).alias("avgdl"),
        "uniq_terms",
    )


def count_words(spark, text: str, analyzer=None) -> DataFrame:
    """Analyze a raw string and count its tokens — the query-side TF
    (WordCounts.countWords, WordCounts.scala:153-158). One literal row,
    tokenized by the same JVM-side analyzer expression as the corpus."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    analyzer = analyzer or STANDARD_ANALYZER
    one = spark.createDataFrame([(text,)], "text string")
    return (
        one.select(F.explode(analyzer.tokens_expr("text")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def zipf_fit(corpus: Corpus, top_n: int = 1000) -> DataFrame:
    """Zipf's-law fit over the term rank-frequency curve: OLS of
    ln(cf) on ln(rank) for the ``top_n`` most frequent terms — the
    one-row corpus diagnostic (slope ≈ -1 for natural language; a flat
    slope flags synthetic/templated text, a cliff flags boilerplate).
    Rank ties break on term asc so the fit is engine-independent.

    Output (one row): n_terms, slope, intercept, r2 — rounded to 6.

    Scale shape: one map-side-combinable cf aggregation (the corpus's
    only shuffle) -> TakeOrdered top_n -> the ranking window and the
    moment sums run on ≤ top_n rows (vocab-capped by construction, so
    the single-partition window is bounded, not corpus-sized)."""
    from pyspark.sql import Window

    cf = (
        corpus.doc_terms()
        .groupBy("term")
        .agg(F.sum("tf").cast("double").alias("cf"))
    )
    order = [F.desc("cf"), F.asc("term")]
    top = cf.orderBy(*order).limit(top_n)
    xy = top.select(
        F.log(F.row_number().over(Window.orderBy(*order)).cast("double")).alias("x"),
        F.log("cf").alias("y"),
    )
    s = xy.agg(
        F.count("*").cast("double").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sx2"),
        F.sum(F.col("y") * F.col("y")).alias("sy2"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sx2, sy2 = F.col("sxy"), F.col("sx2"), F.col("sy2")
    num = n * sxy - sx * sy
    denx = n * sx2 - sx * sx
    deny = n * sy2 - sy * sy
    return s.select(
        n.cast("long").alias("n_terms"),
        F.round(num / denx, 6).alias("slope"),
        F.round((sy - (num / denx) * sx) / n, 6).alias("intercept"),
        F.round((num * num) / (denx * deny), 6).alias("r2"),
    )
