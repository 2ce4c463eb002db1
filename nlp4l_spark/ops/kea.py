"""KEA keyphrase candidate generation + features.

Reference semantics (what, not how):
* KEAStandardAnalyzer: standard tokenize -> lowercase -> n-gram shingles
  (n = 1..3) (/root/reference/app/org/nlp4l/framework/builtin/kea/
  KEAStandardAnalyzer.java:35-90). NOTE: no stopword *removal* before
  shingling — stop filtering applies to the assembled phrase.
* KEAStopFilter: n=1 drops stopwords / single chars / pure numbers;
  n>=2 drops phrases that begin with a begin-stopword or end with an
  end-stopword (KEAStopFilter.java:29-62).
* Features per (doc, phrase): tfidf = tf/docSize * -log2(df/N),
  first_occurrence = first_pos/docSize (CommonProcessor.scala:132-142).

Rebuild: shingles are a JVM-side ``transform(sequence(...))`` over the
token array (no Python); candidate counting is one groupBy. ``docSize``
is the full (pre-stop) token count of the doc; phrase positions index the
full token stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nlp4l_spark.analysis import (
    Analyzer,
    LUCENE_ENGLISH_STOPWORDS,
    WHITESPACE_ANALYZER,
)


def shingles_expr(tokens: Column, n: int) -> Column:
    """array<string> of n-token phrases (space-joined), JVM-side."""
    if n == 1:
        return tokens
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(tokens) - n, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]
        ),
    )


def phrase_filter(phrase: Column, n: int, stopwords: frozenset[str]) -> Column:
    """KEAStopFilter.accept as a boolean Column."""
    stop_arr = F.array(*[F.lit(w) for w in sorted(stopwords)])
    if n == 1:
        return (
            (~F.array_contains(stop_arr, phrase))
            & (F.length(phrase) > 1)
            & (~phrase.rlike(r"^\d+$"))
        )
    first = F.element_at(F.split(phrase, " "), 1)
    last = F.element_at(F.split(phrase, " "), -1)
    return (~F.array_contains(stop_arr, first)) & (
        ~F.array_contains(stop_arr, last)
    )


def candidate_counts(
    df: DataFrame,
    n: int,
    *,
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
    stopwords: frozenset[str] = LUCENE_ENGLISH_STOPWORDS,
) -> DataFrame:
    """(phrase, cnt) — corpus-wide counts of accepted n-gram candidates."""
    toks = analyzer.tokens_expr(text_col)
    exploded = df.select(
        F.explode(shingles_expr(toks, n)).alias("phrase")
    ).filter(phrase_filter(F.col("phrase"), n, stopwords))
    return exploded.groupBy("phrase").agg(F.count("*").alias("cnt"))


def kea_features(
    df: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
) -> DataFrame:
    """(doc_id, term, kea_tfidf, first_occ) for unigram candidates.

    tfidf = tf/docSize * -log2(df/N); first_occ = first_position/docSize,
    positions over the full token stream (CommonProcessor.scala:132-142).
    """
    n_docs = df.count()
    toks = analyzer.tokens_expr(text_col)
    pos = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .select(
            "doc_id",
            F.size("_t").alias("doc_size"),
            F.posexplode("_t").alias("pos", "term"),
        )
        .filter(F.col("term").isin(terms))
    )
    per_doc = pos.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"),
        F.min("pos").alias("first_pos"),
        F.first("doc_size").alias("doc_size"),
    )
    dfm = per_doc.groupBy("term").agg(F.count("*").alias("df"))
    return (
        per_doc.join(F.broadcast(dfm), "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                / F.col("doc_size")
                * -(F.log2(F.col("df") / F.lit(float(n_docs))))
            ).alias("kea_tfidf"),
            (F.col("first_pos") / F.col("doc_size")).alias("first_occ"),
        )
    )
