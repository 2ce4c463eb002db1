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
    """array<string> of n-token phrases (space-joined), JVM-side.
    Docs with fewer than n tokens yield an empty array (``sequence(0,-1)``
    would count DOWN and drive element_at out of bounds in ANSI mode)."""
    if n == 1:
        return tokens
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


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


def keyphrase_scores(
    df: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
    stopwords: frozenset[str] = LUCENE_ENGLISH_STOPWORDS,
) -> DataFrame:
    """(phrase, n, cf, df, score) for accepted n-gram candidates;
    score = cf * -log2(df/N) (KEA tfidf shape at corpus level)."""
    n_docs = df.count()
    toks = analyzer.tokens_expr(text_col)
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_expr(toks, n)).alias("phrase"),
    ).filter(phrase_filter(F.col("phrase"), n, stopwords))
    return exploded.groupBy("phrase").agg(
        F.lit(n).alias("n"),
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    ).withColumn(
        "score",
        F.col("cf") * -(F.log2(F.col("df") / F.lit(float(n_docs)))),
    )


def top_keyphrases(
    df: DataFrame,
    k: int = 15,
    **kwargs,
) -> DataFrame:
    """KEA keyphrase ranking (KeyphraseExtractionProcessor.scala:144-158
    semantics, corpus-level): rank uni+bigram candidates by
    (score desc, phrase asc), drop any unigram that is a word of a
    higher-ranked bigram (subphrase dedup), take top k."""
    from pyspark.sql import Window

    cand = keyphrase_scores(df, 1, **kwargs).unionByName(
        keyphrase_scores(df, 2, **kwargs)
    )
    # pre-prune to top k*50 by the rank key (TakeOrderedAndProject, no
    # global sort) before the single-partition ranking window: a dropped
    # unigram's dominating bigram always ranks above it, so the top-M
    # prefix is closed under the dedup rule and results are unchanged
    # while the window input stays k-bounded at any vocabulary size.
    m = k * 50
    cand = cand.orderBy(F.desc("score"), F.asc("phrase")).limit(m)
    w = Window.orderBy(F.desc("score"), F.asc("phrase"))
    ranked = cand.withColumn("rank", F.row_number().over(w))
    bigrams = ranked.filter("n = 2").select(
        F.col("rank").alias("b_rank"),
        F.split("phrase", " ")[0].alias("w1"),
        F.split("phrase", " ")[1].alias("w2"),
    )
    sub = (
        ranked.filter("n = 1")
        .join(
            bigrams,
            (
                (F.col("phrase") == F.col("w1"))
                | (F.col("phrase") == F.col("w2"))
            )
            & (F.col("b_rank") < F.col("rank")),
            "left_semi",
        )
        .select("phrase")
    )
    return (
        ranked.join(sub, "phrase", "left_anti")
        .orderBy("rank")
        .limit(k)
        .select("phrase", "n", "cf", "df", F.round("score", 6).alias("score"))
    )


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
