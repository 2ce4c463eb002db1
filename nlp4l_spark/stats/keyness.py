"""Corpus keyness: per-stratum significant terms via Dunning's G².

The log-likelihood-ratio keyword statistic (Dunning 1993, "Accurate
Methods for the Statistics of Surprise and Coincidence") over a
foreground stratum vs the rest of the corpus — the corpus-comparison
analysis the reference's term-stats stack (WordCounts + Stats.chiSquare,
/root/reference/app/org/nlp4l/lucene/stats/Stats.scala:81-106) serves,
and the Elasticsearch ``significant_terms`` aggregation surface. G² is
the standard keyness score in corpus linguistics (Rayson & Garside 2000)
and is better-behaved than χ² at the low expected counts a long-tail
vocabulary produces.

Scale shape: ONE corpus shuffle (tokenize → groupBy(group, term)); every
derived table is vocabulary- or group-sized; the term-total and
group-total joins broadcast back onto the (group, term) rows; a single
per-group window compiles to WindowGroupLimit so only k rows per group
survive the final sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from nlp4l_spark.analysis import Analyzer


def significant_terms(
    df: DataFrame,
    group_col: str,
    text_col: str = "text",
    *,
    analyzer: Analyzer | None = None,
    k: int = 10,
    min_count: int = 1,
    broadcast_totals: bool = True,
    exclude: tuple[str, ...] = (),
) -> DataFrame:
    """Top-k overrepresented terms per group by Dunning G².

    For each (group g, term t) build the 2×2 contingency table
    ``a`` = occurrences of t in g, ``b`` = occurrences of t elsewhere,
    ``c`` = other tokens in g, ``d`` = other tokens elsewhere, and score
    ``G² = 2·Σ k·ln(k/E)`` over the four cells (zero cells contribute 0;
    ``E`` is the independence expectation row·col/N). Only terms
    *over*-represented in the group (foreground rate > background rate,
    the significant_terms contract) are ranked; ties break on rounded G²
    then term ascending, so the top-k set is engine-independent.

    Output: (group_col, term, fg_count, bg_count, g2) — g2 in rounded
    to 6 decimals, ≤ k rows per group.

    Set ``broadcast_totals=False`` at 10⁹-term vocabularies to fall back
    to a term-keyed shuffle join for the term totals. Only the corpus
    token total N is collected (one scalar). ``exclude`` drops the named
    terms BEFORE ranking (significant_text excludes the query's own
    terms this way, so the top-k is over co-occurring vocabulary).
    """
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    gt = (
        df.select(F.col(group_col).alias("_g"), az.tokens_expr(text_col).alias("_tk"))
        .select("_g", F.explode("_tk").alias("term"))
        .groupBy("_g", "term")
        .agg(F.count("*").cast("double").alias("_a"))
    )
    term_tot = gt.groupBy("term").agg(F.sum("_a").alias("_rowt"))
    grp_tot = gt.groupBy("_g").agg(F.sum("_a").alias("_colt"))
    n = float(gt.agg(F.sum("_a")).collect()[0][0] or 0.0)
    if n == 0.0:
        raise ValueError("significant_terms: the corpus tokenized to nothing")
    if broadcast_totals:
        term_tot = F.broadcast(term_tot)
    grp_tot = F.broadcast(grp_tot)

    a = F.col("_a")
    rowt, colt = F.col("_rowt"), F.col("_colt")
    b = rowt - a
    c = colt - a
    d = F.lit(n) - rowt - colt + a

    def ll(kcol, e):
        return F.when(kcol > 0, kcol * F.log(kcol / e)).otherwise(F.lit(0.0))

    g2 = F.round(
        2.0
        * (
            ll(a, (rowt * colt) / F.lit(n))
            + ll(b, (rowt * (F.lit(n) - colt)) / F.lit(n))
            + ll(c, ((F.lit(n) - rowt) * colt) / F.lit(n))
            + ll(d, ((F.lit(n) - rowt) * (F.lit(n) - colt)) / F.lit(n))
        ),
        6,
    )
    scored = (
        gt.join(term_tot, "term")
        .join(grp_tot, "_g")
        .filter((a >= float(min_count)) & (a * (F.lit(n) - colt) > b * colt))
        .filter(
            ~F.col("term").isin(list(exclude)) if exclude else F.lit(True)
        )
        .select(
            "_g",
            "term",
            a.cast("long").alias("fg_count"),
            b.cast("long").alias("bg_count"),
            g2.alias("g2"),
        )
    )
    w = Window.partitionBy("_g").orderBy(F.desc("g2"), F.asc("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(F.col("_g").alias(group_col), "term", "fg_count", "bg_count", "g2")
    )


def collocations(
    df: DataFrame,
    text_col: str = "text",
    *,
    analyzer: Analyzer | None = None,
    k: int = 20,
    min_count: int = 5,
    broadcast_unigrams: bool = True,
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) by pointwise mutual
    information — the classic corpus-linguistics association measure
    (Church & Hanks 1990) behind the reference domain's loanword/term
    extraction, and the statistics KEA's bigram candidates feed on.

    PMI = ln( p(w1,w2) / (p(w1)·p(w2)) ) with the joint estimated over
    the corpus's bigram total and the marginals over the token total;
    pairs rarer than ``min_count`` are dropped first (PMI's low-count
    pathology). Ties break on rounded PMI desc then (w1, w2) asc, so
    the top-k set is engine-independent.

    Output: (w1, w2, pair_count, pmi), ≤ k rows.

    Scale shape: one tokenize pass feeds two aggregations — bigram
    counts (the corpus's only wide shuffle, keyed (w1, w2)) and unigram
    counts (vocab-sized, broadcast back onto the surviving ≥ min_count
    pairs — a bigram-vocab-sized table); the final top-k is a
    TakeOrderedAndProject, never a full sort."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    n = F.size(F.col("_tk"))
    pair = lambda i: F.struct(
        F.element_at(F.col("_tk"), i).alias("w1"),
        F.element_at(F.col("_tk"), i + 1).alias("w2"),
    )
    pairs_arr = F.when(
        n >= 2, F.transform(F.sequence(F.lit(1), n - 1), pair)
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    base = df.select(az.tokens_expr(text_col).alias("_tk"))
    c12 = (
        base.select(F.explode(pairs_arr).alias("_p"))
        .select("_p.w1", "_p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("_c12"))
        .filter(F.col("_c12") >= float(min_count))
    )
    uni = (
        base.select(F.explode("_tk").alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("double").alias("_c"))
    )
    totals = base.agg(
        F.sum(F.size("_tk")).alias("_n1"),
        F.sum(F.greatest(F.size("_tk") - 1, F.lit(0))).alias("_n2"),
    ).collect()[0]
    n1, n2 = float(totals["_n1"] or 0.0), float(totals["_n2"] or 0.0)
    if n2 == 0.0:
        raise ValueError("collocations: no bigrams in the corpus")
    if broadcast_unigrams:
        uni = F.broadcast(uni)
    pmi = F.round(
        F.log(
            (F.col("_c12") / F.lit(n2))
            / ((F.col("_c1") / F.lit(n1)) * (F.col("_c2") / F.lit(n1)))
        ),
        6,
    )
    return (
        c12.join(uni.select(F.col("w").alias("w1"), F.col("_c").alias("_c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("_c").alias("_c2")), "w2")
        .select(
            "w1",
            "w2",
            F.col("_c12").cast("long").alias("pair_count"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(k)
    )


def textrank_terms(
    df: DataFrame,
    text_col: str = "text",
    *,
    analyzer: Analyzer | None = None,
    k: int = 20,
    damping: float = 0.85,
    iterations: int = 10,
    broadcast_scores: bool = True,
    materialize: bool = True,
    max_broadcast_terms: int = 2_000_000,
) -> DataFrame:
    """Corpus-level TextRank keywords (Mihalcea & Tarau 2004): PageRank
    over the term co-occurrence graph (adjacent-token edges, undirected,
    count-weighted, no self-loops), a FIXED number of power iterations
    from uniform scores — deterministic, so the result is exactly
    reproducible (and SQL-oracle-checkable by unrolling the iterations):

        s_{i+1}(v) = (1-d) + d * Σ_u  (w_uv / wdeg(u)) · s_i(u)

    Output: (term, score) — top-k by rounded score desc, term asc.

    Scale shape: the corpus is touched ONCE (tokenize → bigram counts);
    the graph is edge-vocabulary-sized, its normalized form persisted;
    each of the ``iterations`` rounds is one broadcast join + one
    vocab-sized aggregation (set ``broadcast_scores=False`` at 10⁹-term
    vocabularies for a shuffle join). Nothing corpus-sized is ever
    iterated. ``materialize=False`` skips the persist/eager-checkpoint
    pair and returns the lazy plan (for plan inspection)."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    n = F.size(F.col("_tk"))
    pair = lambda i: F.struct(
        F.element_at(F.col("_tk"), i).alias("w1"),
        F.element_at(F.col("_tk"), i + 1).alias("w2"),
    )
    pairs_arr = F.when(
        n >= 2, F.transform(F.sequence(F.lit(1), n - 1), pair)
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    cnt = (
        df.select(az.tokens_expr(text_col).alias("_tk"))
        .select(F.explode(pairs_arr).alias("_p"))
        .select("_p.w1", "_p.w2")
        .filter(F.col("w1") != F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").cast("double").alias("_c"))
    )
    edges = (
        cnt.select(F.col("w1").alias("src"), F.col("w2").alias("dst"), "_c")
        .unionByName(
            cnt.select(F.col("w2").alias("src"), F.col("w1").alias("dst"), "_c")
        )
        .groupBy("src", "dst")
        .agg(F.sum("_c").alias("_w"))
    )
    deg = edges.groupBy("src").agg(F.sum("_w").alias("_wd"))
    en = edges.join(deg, "src").select(
        "src", "dst", (F.col("_w") / F.col("_wd")).alias("_nw")
    )
    if materialize:
        en = en.persist()
        en.count()  # materialize once; every iteration reads the cache
        if broadcast_scores:
            # executable precondition: the per-iteration broadcast of
            # `scores` is vocab-sized; past the cap the caller must use
            # broadcast_scores=False (shuffle join) — plans/caps.py.
            # One cheap distinct on the persisted normalized edges.
            from nlp4l_spark.plans.caps import assert_driver_cap

            assert_driver_cap(
                en.select("src").distinct().count(),
                max_broadcast_terms,
                "textrank_terms broadcast scores",
            )
    base = F.lit(1.0 - damping)
    scores = deg.select(F.col("src").alias("term"), F.lit(1.0).alias("score"))
    for _ in range(iterations):
        s = F.broadcast(scores) if broadcast_scores else scores
        scores = (
            en.join(s, en["src"] == s["term"])
            .groupBy(F.col("dst").alias("term2"))
            .agg(
                (base + F.lit(damping) * F.sum(F.col("_nw") * F.col("score"))).alias(
                    "score2"
                )
            )
            .select(F.col("term2").alias("term"), F.col("score2").alias("score"))
        )
    out = (
        scores.select("term", F.round("score", 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("term"))
        .limit(k)
    )
    if not materialize:
        return out
    out = out.localCheckpoint(eager=True)
    en.unpersist()
    return out
