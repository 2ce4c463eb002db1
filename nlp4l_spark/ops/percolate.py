"""Percolation — reverse search: match a stream of documents against a
table of STORED queries (the Elasticsearch percolator / Luwak monitor
shape) for alerting and routing. The reference has the forward direction
only (SolrSearchValidator fires one query per record,
/root/reference/app/org/nlp4l/framework/builtin/FeaturedProcessors.scala:223-258);
percolation inverts it so each incoming doc is checked against EVERY
registered query in one pass.

Scale shape: queries are broadcast (a query registry is ~10^3-10^6 rows,
dwarfed by a 10^12-turn corpus), so the doc side streams through ONE scan
with zero shuffle of corpus data. Matching is a pre-filter on the
rarest-term route (a doc can only match a query if it contains the
query's rarest term — the classic percolator optimization rendered as an
arrays_overlap prune) followed by the exact subset check, all JVM
expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from nlp4l_spark.analysis import Analyzer, STANDARD_ANALYZER


def percolate(
    docs: DataFrame,
    queries: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    terms_col: str = "must_terms",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Match every doc against every stored conjunctive query: a doc
    matches query q iff ALL of q's ``must_terms`` occur in the doc's
    analyzed token set. Returns (doc_id, query_id) pairs, the percolator
    hit list.

    ``queries`` must be small enough to broadcast (the percolator
    contract); the doc side is one tokenize scan joined to the broadcast
    query table under an arrays_overlap prune, then the exact
    ``forall(must_terms in tokens)`` subset check.
    """
    analyzer = analyzer or STANDARD_ANALYZER
    toks = F.array_distinct(analyzer.tokens_expr(text_col))
    d = docs.select(F.col(doc_id_col).alias("doc_id"), toks.alias("_toks"))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(terms_col).alias("_must"),
        )
    )
    subset = F.forall(
        F.col("_must"), lambda t: F.array_contains(F.col("_toks"), t)
    )
    # an empty must list is match-all (the arrays_overlap prune alone
    # would wrongly drop it: overlap with [] is false, subset is true)
    prune = (F.size(F.col("_must")) == 0) | F.arrays_overlap(
        F.col("_toks"), F.col("_must")
    )
    return (
        d.join(q, prune, "inner").filter(subset).select("doc_id", "query_id")
    )


def percolate_phrase(
    docs: DataFrame,
    queries: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    phrase_col: str = "phrase",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Phrase percolation: a doc matches query q iff q's ``phrase``
    tokens occur CONTIGUOUSLY in the doc's full token stream (stopword
    holes preserved — the PhraseQuery position contract, so a stored
    phrase percolates exactly like the forward phrase query matches).

    Same two-stage shape as ES's percolator: a cheap term-subset prune
    (a doc can only match if every phrase token occurs at all) bounds
    the candidate (doc, query) pairs, then the exact adjacency check —
    a per-pair HOF over the token stream — runs on candidates only.
    Queries broadcast; the doc side is one scan, zero corpus shuffle."""
    analyzer = analyzer or STANDARD_ANALYZER
    full = Analyzer(
        lowercase=analyzer.lowercase,
        token_pattern=analyzer.token_pattern,
        stopwords=frozenset(),
    )
    ft = full.tokens_expr(text_col)
    d = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        ft.alias("_ft"),
        F.array_distinct(ft).alias("_set"),
    )
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(phrase_col).alias("_ph"),
        )
    )
    prune = F.forall(
        F.col("_ph"), lambda t: F.array_contains(F.col("_set"), t)
    )
    n = F.size(F.col("_ph"))
    # valid 0-based start positions (empty when the stream is shorter
    # than the phrase — no Spark descending-sequence / ANSI
    # out-of-bounds hazards; F.get is 0-based and null-safe)
    starts = F.filter(
        F.transform(F.col("_ft"), lambda x, i: i),
        lambda i: i + n <= F.size(F.col("_ft")),
    )
    adjacent = F.exists(
        starts,
        lambda i: F.slice(F.col("_ft"), i + 1, n) == F.col("_ph"),
    )
    return (
        d.join(q, prune, "inner")
        .filter(adjacent)
        .select("doc_id", "query_id")
    )


def percolate_bool(
    docs: DataFrame,
    queries: DataFrame,
    doc_id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    must_col: str = "must_terms",
    must_not_col: str = "must_not_terms",
    should_col: str = "should_terms",
    msm_col: str = "min_should",
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Boolean percolation: stored queries carry MUST / MUST_NOT /
    SHOULD clause lists plus a minimum_should_match — the full ES bool
    percolator shape (conjunctive `percolate` is the MUST-only special
    case). A doc matches iff every must term occurs, no must_not term
    occurs, and at least ``min_should`` of the should terms occur
    (msm=0 disables the should requirement, Lucene's rule when other
    required clauses exist).

    Same scale shape as `percolate`: queries broadcast, one tokenize
    scan on the doc side, candidate pruning before the exact clause
    checks — zero corpus shuffle. The prune must stay NECESSARY for a
    match: overlap with must terms when there are any, else overlap
    with should terms when msm > 0, else match-all."""
    analyzer = analyzer or STANDARD_ANALYZER
    toks = F.array_distinct(analyzer.tokens_expr(text_col))
    d = docs.select(F.col(doc_id_col).alias("doc_id"), toks.alias("_toks"))
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(must_col).alias("_must"),
            F.col(must_not_col).alias("_mnot"),
            F.col(should_col).alias("_should"),
            F.col(msm_col).alias("_msm"),
        )
    )
    prune = F.when(
        F.size(F.col("_must")) > 0,
        F.arrays_overlap(F.col("_toks"), F.col("_must")),
    ).otherwise(
        (F.col("_msm") == 0)
        | F.arrays_overlap(F.col("_toks"), F.col("_should"))
    )
    must_ok = F.forall(
        F.col("_must"), lambda t: F.array_contains(F.col("_toks"), t)
    )
    mnot_ok = ~F.arrays_overlap(F.col("_toks"), F.col("_mnot"))
    should_ok = (
        F.size(F.array_intersect(F.col("_toks"), F.col("_should")))
        >= F.col("_msm")
    )
    return (
        d.join(q, prune, "inner")
        .filter(must_ok & mnot_ok & should_ok)
        .select("doc_id", "query_id")
    )
