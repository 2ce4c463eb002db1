"""Spellcheck: char-ngram candidate retrieval + ranking.

Reference semantics (what, not how): LuceneSpellcheckIndexingProcessor
builds a char-ngram index over a dictionary of terms and suggests
corrections by ngram-overlap retrieval (/root/reference/app/org/nlp4l/
framework/builtin/lucene/LuceneSpellcheckIndexingProcessor.scala:38-74,
Lucene's SpellChecker gram-index design).

Rebuild: the "ngram index" is just the term dictionary DataFrame with a
derived char-bigram array column; suggestion = overlap count (JVM-side
``array_intersect`` — no Python in the hot path), ranked by
(overlap desc, levenshtein asc, term asc). At scale the term dictionary
is orders of magnitude smaller than the corpus; the query side is a
broadcast literal, so this is a single narrow scan + TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def char_ngrams(col: Column | str, n: int = 2) -> Column:
    """array<string> of distinct char n-grams of a string column."""
    c = F.col(col) if isinstance(col, str) else col
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c) - (n - 1), F.lit(1))),
        lambda i: c.substr(i, F.lit(n)),
    )
    return F.array_distinct(grams)


def suggest(
    terms_df: DataFrame,
    word: str,
    k: int = 10,
    *,
    term_col: str = "term",
    n: int = 2,
) -> DataFrame:
    """Top-k correction candidates for ``word`` from a term dictionary.

    Returns (term, overlap, distance) — overlap = shared distinct char
    n-grams with the query word, distance = levenshtein. Candidates must
    share >= 1 gram (the gram-index retrieval contract).
    """
    w = word.lower()
    q_grams = sorted({w[i : i + n] for i in range(max(len(w) - n + 1, 1))})
    grams = char_ngrams(term_col, n)
    return (
        terms_df.select(
            F.col(term_col).alias("term"),
            F.size(
                F.array_intersect(grams, F.array(*[F.lit(g) for g in q_grams]))
            ).cast("long").alias("overlap"),
            F.levenshtein(F.col(term_col), F.lit(w)).cast("long").alias("distance"),
        )
        .filter(F.col("overlap") >= 1)
        .orderBy(F.desc("overlap"), F.asc("distance"), F.asc("term"))
        .limit(k)
    )
