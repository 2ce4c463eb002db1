# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    BM25_K, BM25_QUERY, BM25_TERMS, F, STANDARD_ANALYZER, TOKS_CTE, TOK_SQL,
    Window, _corpus, _docs, math,
)
# BM25 search (SURVEY §2.6 ranking semantics)
# --------------------------------------------------------------------- #
_BM25_ORACLE = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_filtered_bm25_topk(spark, sf_dir):
    """Metadata-filtered BM25 top-k with Solr fq semantics: the filter
    (lang = 'en') restricts the CANDIDATES but not the collection
    statistics — idf/avgdl stay whole-corpus, exactly like a Lucene
    filtered query / Solr fq. Index path: semi-join the candidate docID
    set against the stored-metadata predicate (the searchDocIdSet
    surface, ISearcher.scala:45-49) before the top-k merge. Same
    one-tokenize-pass shape as bm25_topk plus a pushable lang predicate."""
    tc = STANDARD_ANALYZER.term_counts_udf()
    per_doc = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", tc(F.col("text")).alias("_tc"))
        .select(
            "doc_id",
            "lang",
            F.col("_tc.dl").cast("double").alias("dl"),
            F.map_from_arrays("_tc.terms", "_tc.tfs").alias("m"),
        )
    )
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    return (
        per_doc.filter(F.col("lang") == "en")
        .withColumn("s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs))
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_FILTERED_BM25 = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT sc.doc_id, round(s, 6) AS score
FROM sc JOIN documents d ON d.doc_id = sc.doc_id
WHERE d.lang = 'en'
ORDER BY s DESC, sc.doc_id ASC LIMIT {BM25_K}
"""


MLT_DOC, MLT_TERMS = 7, 10


def q_more_like_this(spark, sf_dir):
    """MoreLikeThis, corpus path (Lucene MoreLikeThisQuery shape, index
    twin Searcher.more_like_this): the source doc's top-10 terms by
    tf·idf (rounded rank key, term-asc ties) become an OR BM25 query;
    the source doc is excluded. Term selection is driver-side (one doc,
    bounded distinct terms); scoring is the one-pass corpus BM25."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    row = per_doc.filter(F.col("doc_id") == MLT_DOC).select("m").collect()
    tfs = {t: int(v) for t, v in dict(row[0]["m"]).items()}
    terms = sorted(tfs)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, terms)
    ranked = sorted(
        (
            -round(tfs[t] * math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)), 6),
            t,
        )
        for t in terms
    )[:MLT_TERMS]
    qterms = [t for _, t in ranked]
    return (
        per_doc.filter(F.col("doc_id") != MLT_DOC)
        .withColumn("s", _bm25_score_col(qterms, n, avgdl, dfs))
        .filter(F.greatest(*[F.col("m")[t] for t in qterms]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_MORE_LIKE_THIS = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
dfall AS (SELECT term, count(*)::double AS df FROM dt GROUP BY 1),
ranked AS (SELECT s.term
           FROM dt s JOIN dfall USING (term) CROSS JOIN st
           WHERE s.doc_id = {MLT_DOC}
           ORDER BY round(s.tf * ln(1 + (n - df + 0.5) / (df + 0.5)), 6)
                    DESC, s.term ASC
           LIMIT {MLT_TERMS}),
dfm AS (SELECT term, df FROM dfall JOIN ranked USING (term)),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc WHERE doc_id <> {MLT_DOC}
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


RM3_FB_DOCS, RM3_FB_TERMS, RM3_ALPHA = 10, 10, 0.5


def _bm25_score_col(terms, n, avgdl, dfs, weights=None):
    """Weighted-OR BM25 score column over the per-doc tf map (shared by
    the plain/filtered/MLT/RM3 corpus queries)."""
    score = None
    for t in terms:
        idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        if weights is not None:
            idf_w = weights[t] * idf_w
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            F.lit(idf_w)
            * tf
            * F.lit(2.2)
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
    return score


def q_rm3_topk(spark, sf_dir):
    """BM25 + RM3 pseudo-relevance feedback, corpus path (index twin
    Searcher.search_rm3, Lavrenko & Croft 2001 / Anserini recipe):
    initial BM25 top-10 (rounded-score selection so both engines pick
    the same feedback set), RM1(w) = Σ_d P(d|q)·tf/dl over those docs,
    top-10 expansion terms (rounded rank key, term-asc ties), weights =
    α·RM1 + (1-α)/|q| on originals, zero weights dropped, weighted OR
    BM25 re-search. Feedback math is driver-side over 10 collected doc
    maps — never corpus data."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    initial = (
        per_doc.withColumn("s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6))
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(RM3_FB_DOCS)
        .select("doc_id", "s", "m", "dl")
        .collect()
    )
    total = sum(r["s"] for r in initial) or 1.0
    rm1: dict[str, float] = {}
    for r in initial:
        w_d = r["s"] / total
        dl = float(r["dl"])
        if not dl or not w_d:
            continue
        for t, tf in dict(r["m"]).items():
            rm1[t] = rm1.get(t, 0.0) + w_d * (float(tf) / dl)
    top = sorted(rm1.items(), key=lambda kv: (-round(kv[1], 6), kv[0]))[:RM3_FB_TERMS]
    weights = {t: RM3_ALPHA * w for t, w in top}
    for t in BM25_TERMS:
        weights[t] = weights.get(t, 0.0) + (1.0 - RM3_ALPHA) / len(BM25_TERMS)
    weights = {t: w for t, w in sorted(weights.items()) if w > 0.0}
    qterms = list(weights)
    n2, avgdl2, dfs2 = _bm25_corpus_stats(per_doc, qterms)
    score = _bm25_score_col(qterms, n2, avgdl2, dfs2, weights)
    return (
        per_doc.withColumn("s", score)
        .filter(F.greatest(*[F.col("m")[t] for t in qterms]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_RM3_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
init AS (SELECT doc_id, round(s, 6) AS s FROM sc
         ORDER BY round(s, 6) DESC, doc_id ASC LIMIT {RM3_FB_DOCS}),
tot AS (SELECT sum(s) AS ts FROM init),
rm1 AS (SELECT dt.term, sum((init.s / ts) * dt.tf / dl.dl) AS r
        FROM dt JOIN init USING (doc_id) JOIN dl USING (doc_id) CROSS JOIN tot
        GROUP BY 1),
fb AS (SELECT term, r FROM rm1
       ORDER BY round(r, 6) DESC, term ASC LIMIT {RM3_FB_TERMS}),
wts AS (SELECT term, sum(w) AS w FROM (
          SELECT term, {RM3_ALPHA!r} * r AS w FROM fb
          UNION ALL
          SELECT term, (1 - {RM3_ALPHA!r}) / {len(BM25_TERMS)} AS w FROM qt)
        GROUP BY term HAVING sum(w) > 0),
dfm2 AS (SELECT dt.term, count(*)::double AS df
         FROM dt JOIN wts USING (term) GROUP BY 1),
sc2 AS (SELECT dt.doc_id,
               sum(wts.w * ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
        FROM dt JOIN wts USING (term) JOIN dfm2 USING (term)
                JOIN dl USING (doc_id) CROSS JOIN st
        GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc2
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


ROCCHIO_ALPHA, ROCCHIO_BETA = 1.0, 0.75
ROCCHIO_FB_DOCS, ROCCHIO_FB_TERMS = 10, 10


def q_rocchio_topk(spark, sf_dir):
    """Rocchio pseudo-relevance feedback (Rocchio 1971, the vector-space
    sibling of rm3_topk): initial BM25 top-{ROCCHIO_FB_DOCS} (rounded-
    score selection), feedback centroid = mean tf·idf vector of those
    docs (tf length-normalized, BM25 idf), new query weights
    w(t) = α·1[t∈q] + β·centroid(t) with the top-{ROCCHIO_FB_TERMS}
    non-query expansion terms kept (rounded rank key, term-asc ties),
    weighted OR BM25 re-search. Centroid math is driver-side over the
    {ROCCHIO_FB_DOCS} collected doc maps; the expansion terms' dfs come
    from one vocabulary-sized exploded-keys aggregate — never a corpus
    re-tokenize."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    initial = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(ROCCHIO_FB_DOCS)
        .select("doc_id", "m", "dl")
        .collect()
    )
    cands = sorted({t for r in initial for t in dict(r["m"])})
    cdf = {
        r["t"]: r["df"]
        for r in per_doc.select(
            F.explode(F.map_keys("m")).alias("t")
        )
        .filter(F.col("t").isin(cands))
        .groupBy("t")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    nr = float(len(initial))
    cen: dict[str, float] = {}
    for r in initial:
        dl = float(r["dl"])
        if not dl:
            continue
        for t, tf in dict(r["m"]).items():
            idf_t = math.log(1.0 + (n - cdf[t] + 0.5) / (cdf[t] + 0.5))
            cen[t] = cen.get(t, 0.0) + (float(tf) / dl) * idf_t / nr
    expansion = sorted(
        ((t, ROCCHIO_BETA * c) for t, c in cen.items() if t not in BM25_TERMS),
        key=lambda kv: (-round(kv[1], 6), kv[0]),
    )[:ROCCHIO_FB_TERMS]
    weights = dict(expansion)
    for t in BM25_TERMS:
        weights[t] = ROCCHIO_ALPHA + ROCCHIO_BETA * cen.get(t, 0.0)
    weights = {t: w for t, w in sorted(weights.items()) if w > 0.0}
    qterms = list(weights)
    n2, avgdl2, dfs2 = _bm25_corpus_stats(per_doc, qterms)
    score = _bm25_score_col(qterms, n2, avgdl2, dfs2, weights)
    return (
        per_doc.withColumn("s", score)
        .filter(F.greatest(*[F.col("m")[t] for t in qterms]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_ROCCHIO_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
init AS (SELECT doc_id FROM (SELECT doc_id, round(s, 6) AS s FROM sc)
         ORDER BY s DESC, doc_id ASC LIMIT {ROCCHIO_FB_DOCS}),
nr AS (SELECT count(*)::double AS nr FROM init),
dfa AS (SELECT term, count(*)::double AS df FROM dt GROUP BY 1),
cen AS (SELECT dt.term,
               sum((dt.tf / dl.dl)
                   * ln(1 + (st.n - dfa.df + 0.5) / (dfa.df + 0.5))) / max(nr.nr)
                 AS c
        FROM dt JOIN init USING (doc_id) JOIN dl USING (doc_id)
                JOIN dfa ON dfa.term = dt.term
                CROSS JOIN st CROSS JOIN nr
        GROUP BY dt.term),
fb AS (SELECT term, {ROCCHIO_BETA!r} * c AS w FROM cen
       WHERE term NOT IN (SELECT term FROM qt)
       ORDER BY round({ROCCHIO_BETA!r} * c, 6) DESC, term ASC
       LIMIT {ROCCHIO_FB_TERMS}),
wts AS (SELECT term, w FROM fb
        UNION ALL
        SELECT qt.term, {ROCCHIO_ALPHA!r} + {ROCCHIO_BETA!r} * coalesce(cen.c, 0)
        FROM qt LEFT JOIN cen USING (term)),
wpos AS (SELECT term, w FROM wts WHERE w > 0),
dfm2 AS (SELECT dt.term, count(*)::double AS df
         FROM dt JOIN wpos USING (term) GROUP BY 1),
sc2 AS (SELECT dt.doc_id,
               sum(wpos.w * ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
        FROM dt JOIN wpos USING (term) JOIN dfm2 USING (term)
                JOIN dl USING (doc_id) CROSS JOIN st
        GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc2
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_facet_counts(spark, sf_dir):
    """Facet counts over a query's matching docs (the Solr facet.field
    surface; index twin Searcher.facets): docs containing >= 1 query
    term, grouped by the stored lang column, count desc / lang asc."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    qarr = F.array(*[F.lit(t) for t in BM25_TERMS])
    return (
        _docs(spark, sf_dir)
        .filter(F.arrays_overlap(toks, qarr))
        .groupBy("lang")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lang"))
    )


O_FACET_COUNTS = f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks
      WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}))
SELECT d.lang, count(*)::bigint AS cnt
FROM documents d JOIN m USING (doc_id)
GROUP BY 1 ORDER BY cnt DESC, d.lang ASC
"""


def q_facet_ranges(spark, sf_dir):
    """Numeric range faceting over a query's matching docs (Lucene facet
    module's LongRangeFacetCounts with uniform buckets; index twin
    Searcher.facet_ranges): docs containing >= 1 query term, histogram
    over n_chars with width-200 buckets. One scan + one bucket-keyed
    groupBy."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    qarr = F.array(*[F.lit(t) for t in BM25_TERMS])
    bucket = (F.floor(F.col("n_chars") / 200) * 200).cast("long")
    return (
        _docs(spark, sf_dir)
        .filter(F.arrays_overlap(toks, qarr))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.asc("bucket"))
    )


O_FACET_RANGES = f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks
      WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}))
SELECT (d.n_chars // 200) * 200 AS bucket, count(*)::bigint AS cnt
FROM documents d JOIN m USING (doc_id)
GROUP BY 1 ORDER BY bucket ASC
"""


def _bm25_per_doc(spark, sf_dir):
    """(doc_id, dl, m[term -> tf]) — ONE tokenize pass per job. The
    earlier form derived doc_terms, doc_lens and per-term dfs from
    separate tokenize passes (3-4 corpus scans per query); everything a
    corpus-path BM25 needs comes out of a single term_counts pass."""
    tc = STANDARD_ANALYZER.term_counts_udf()
    return (
        _docs(spark, sf_dir)
        .select("doc_id", tc(F.col("text")).alias("_tc"))
        .select(
            "doc_id",
            F.col("_tc.dl").cast("double").alias("dl"),
            F.map_from_arrays("_tc.terms", "_tc.tfs").alias("m"),
        )
    )


def _bm25_corpus_stats(per_doc, terms):
    """(n, avgdl, {term: df}) in ONE aggregation job."""
    aggs = [F.count("*").alias("n"), F.sum("dl").alias("sum_dl")] + [
        F.count(F.col("m")[t]).cast("double").alias(f"_df_{i}")
        for i, t in enumerate(terms)
    ]
    row = per_doc.agg(*aggs).collect()[0]
    n = row["n"]
    return (
        n,
        row["sum_dl"] / n,
        {t: float(row[f"_df_{i}"]) for i, t in enumerate(terms)},
    )


def q_bm25_topk(spark, sf_dir):
    """Pure-DataFrame BM25 over the raw corpus (no prebuilt index): the
    oracle-comparable scoring path. Two corpus passes total — one
    aggregation for (n, avgdl, per-term df), one scan scoring every doc
    from the per-doc tf map with idfs folded in as literals; no join, no
    shuffle, top-k is TakeOrderedAndProject."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    return (
        per_doc.withColumn("s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs))
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


_BM25_AND_ORACLE = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id
       HAVING count(DISTINCT dt.term) = {len(BM25_TERMS)})
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_bm25_and_topk(spark, sf_dir):
    """Conjunctive (Lucene BooleanQuery MUST) BM25 top-k: docs must contain
    EVERY query term; scoring is the same BM25 sum (MUST only changes the
    candidate set). Index path: Searcher.search(..., operator='and'),
    identity-tested in tests/test_boolean.py. Same two-pass one-tokenize
    shape as q_bm25_topk; MUST = every per-doc map lookup non-null."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    score = None
    for t in BM25_TERMS:
        idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = F.col("m")[t].cast("double")
        s_t = (
            F.lit(idf_w)
            * tf
            * F.lit(2.2)
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl)))
        )
        score = s_t if score is None else score + s_t
    must = [F.col("m")[t].isNotNull() for t in BM25_TERMS]
    cond = must[0]
    for c in must[1:]:
        cond = cond & c
    return (
        per_doc.filter(cond)
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


BM25_MSM = 2

_BM25_MSM_ORACLE = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id
       HAVING count(DISTINCT dt.term) >= {BM25_MSM})
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_bm25_msm_topk(spark, sf_dir):
    """Lucene BooleanQuery.setMinimumNumberShouldMatch: SHOULD scoring, but
    a doc must match >= BM25_MSM distinct query terms to be a candidate.
    Index path: Searcher.search_boolean(min_should_match=...), identity-
    tested in tests/test_boolean.py. Same one-tokenize two-pass shape as
    q_bm25_topk; the match count is the number of non-null map lookups."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    score = None
    for t in BM25_TERMS:
        idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            F.lit(idf_w)
            * tf
            * F.lit(2.2)
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
    n_matched = sum(
        (F.col("m")[t].isNotNull().cast("int") for t in BM25_TERMS), F.lit(0)
    )
    return (
        per_doc.filter(n_matched >= BM25_MSM)
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


DISMAX_TIE = 0.3

_DISMAX_ORACLE = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              max(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
              + {DISMAX_TIE} *
              (sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                   * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
               - max(ln(1 + (n - df + 0.5) / (df + 0.5))
                     * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))))
                  AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_dismax_topk(spark, sf_dir):
    """Lucene DisjunctionMaxQuery over the standard 3-term query:
    score = best single-term BM25 + tie_breaker * (the rest) — dismax
    suppresses the OR-sum's double counting so a doc strong on ONE term
    beats a doc weak on all three. Index path: Searcher.search_dismax
    (identity-tested in tests/test_boolean.py). Same one-tokenize
    per-doc-map shape as q_bm25_topk — no scoring joins."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    parts = []
    for t in BM25_TERMS:
        idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        tf = F.col("m")[t].cast("double")
        parts.append(
            F.when(
                tf.isNotNull(),
                F.lit(idf_w)
                * tf
                * F.lit(2.2)
                / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
            ).otherwise(F.lit(0.0))
        )
    smax = F.greatest(*parts)
    ssum = sum(parts[1:], parts[0])
    n_matched = sum(
        (F.col("m")[t].isNotNull().cast("int") for t in BM25_TERMS), F.lit(0)
    )
    return (
        per_doc.filter(n_matched >= 1)
        .withColumn("s", smax + F.lit(DISMAX_TIE) * (ssum - smax))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


# --------------------------------------------------------------------- #
# Hybrid retrieval: RRF fusion of the BM25 ranking with the phrase
# ranking (Cormack et al. 2009; k=60) — the standard lexical+second-
# signal merge, rank-based so the incomparable score scales never mix.
# --------------------------------------------------------------------- #
def q_hybrid_rrf(spark, sf_dir):
    from pyspark.sql import Window

    from nlp4l_spark.search.fusion import rrf_fuse

    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    a = q_bm25_topk(spark, sf_dir).withColumn("rank", F.row_number().over(w))
    b = q_phrase_bm25_topk(spark, sf_dir).withColumn(
        "rank", F.row_number().over(w)
    )
    return rrf_fuse([a, b], k=60, topk=BM25_K)


O_HYBRID_RRF = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sca AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
        FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
        GROUP BY dt.doc_id),
ra AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rnk
       FROM sca ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}),
t2 AS (SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
         {TOK_SQL} AS at FROM documents),
base2 AS (SELECT doc_id,
            CASE WHEN len(ft) >= 2 THEN len(list_filter(range(1, len(ft)),
                 i -> ft[i] = 'merge' AND ft[i+1] = 'join')) ELSE 0 END AS tf,
            len(at) AS dl
          FROM t2),
n2 AS (SELECT count(*)::double AS n,
              sum(dl)::double / count(*) AS avgdl FROM base2),
d2m AS (SELECT
        (SELECT count(*) FROM t2 WHERE list_contains(at, 'merge')) AS dfm,
        (SELECT count(*) FROM t2 WHERE list_contains(at, 'join')) AS dfj),
scb AS (SELECT doc_id,
          (ln(1 + (n2.n - d2m.dfm + 0.5) / (d2m.dfm + 0.5))
           + ln(1 + (n2.n - d2m.dfj + 0.5) / (d2m.dfj + 0.5)))
          * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / n2.avgdl)) AS s
        FROM base2, n2, d2m WHERE tf > 0),
rb AS (SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rnk
       FROM scb ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}),
u AS (SELECT doc_id, 1.0 / (60 + rnk) AS c FROM ra
      UNION ALL SELECT doc_id, 1.0 / (60 + rnk) FROM rb),
fz AS (SELECT doc_id, sum(c) AS s FROM u GROUP BY doc_id
       ORDER BY s DESC, doc_id ASC LIMIT {BM25_K})
SELECT doc_id, round(s, 6) AS rrf_score,
       row_number() OVER (ORDER BY s DESC, doc_id ASC)::int AS rank
FROM fz ORDER BY s DESC, doc_id ASC
"""


# --------------------------------------------------------------------- #
# IR evaluation: nDCG@k / MRR / P@k / AP@k of the BM25 ranking against
# graded synthetic qrels (rel = matched-distinct-terms - 1, so results
# contain both relevant and non-relevant docs).
# --------------------------------------------------------------------- #
RANKEVAL_QUERIES: dict[int, list[str]] = {
    0: BM25_TERMS,
    1: ["hash", "scan"],
}


def q_rank_eval(spark, sf_dir):
    from pyspark.sql import Window

    from nlp4l_spark.ops.ltr import rank_metrics

    per_doc = _bm25_per_doc(spark, sf_dir)
    res_parts, qrel_parts = [], []
    for qid, terms in sorted(RANKEVAL_QUERIES.items()):
        n, avgdl, dfs = _bm25_corpus_stats(per_doc, terms)
        score = None
        for t in terms:
            idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = F.col("m")[t].cast("double")
            s_t = F.when(
                tf.isNotNull(),
                F.lit(idf_w) * tf * F.lit(2.2)
                / (tf + F.lit(1.2)
                   * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
            ).otherwise(F.lit(0.0))
            score = s_t if score is None else score + s_t
        nm = sum(
            (F.col("m")[t].isNotNull().cast("int") for t in terms), F.lit(0)
        )
        scored = per_doc.withColumn("s", score).withColumn("_nm", nm)
        w = Window.orderBy(F.desc("s"), F.asc("doc_id"))
        res_parts.append(
            scored.filter(F.col("_nm") >= 1)
            .orderBy(F.desc("s"), F.asc("doc_id"))
            .limit(BM25_K)
            .withColumn("rank", F.row_number().over(w))
            .select(F.lit(qid).alias("qid"), "doc_id", "rank")
        )
        qrel_parts.append(
            scored.filter(F.col("_nm") >= 2).select(
                F.lit(qid).alias("qid"),
                "doc_id",
                (F.col("_nm") - 1).cast("int").alias("rel"),
            )
        )
    results = res_parts[0]
    qrels = qrel_parts[0]
    for r in res_parts[1:]:
        results = results.unionByName(r)
    for r in qrel_parts[1:]:
        qrels = qrels.unionByName(r)
    return (
        rank_metrics(results, qrels, k=BM25_K)
        .orderBy("qid")
        .select("qid", "ndcg", "mrr", "p_at_k", "ap", "err")
    )


def _rankeval_block(q: int, terms: list[str], k: int) -> str:
    return f"""
qt{q} AS (SELECT unnest({terms!r}) AS term),
dfm{q} AS (SELECT term, count(*)::double AS df FROM dt JOIN qt{q} USING (term)
           GROUP BY 1),
sc{q} AS (SELECT dt.doc_id,
            sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s,
            count(DISTINCT dt.term)::int AS nm
          FROM dt JOIN dfm{q} USING (term) JOIN dl USING (doc_id) CROSS JOIN st
          GROUP BY dt.doc_id),
res{q} AS (SELECT doc_id, greatest(nm - 1, 0)::double AS rel,
             row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rnk
           FROM sc{q} ORDER BY s DESC, doc_id ASC LIMIT {k}),
qr{q} AS (SELECT doc_id, (nm - 1)::double AS rel FROM sc{q} WHERE nm >= 2),
ideal{q} AS (SELECT rel, row_number() OVER (ORDER BY rel DESC, doc_id ASC)
               AS irnk FROM qr{q}),
met{q} AS (SELECT {q}::bigint AS qid,
  round(coalesce(
    (SELECT sum((pow(2.0, rel) - 1) / log2(rnk + 1.0)) FROM res{q}) /
    nullif((SELECT sum((pow(2.0, rel) - 1) / log2(irnk + 1.0))
            FROM ideal{q} WHERE irnk <= {k}), 0), 0), 6) AS ndcg,
  round(coalesce(1.0 / (SELECT min(rnk) FROM res{q} WHERE rel > 0), 0), 6)
    AS mrr,
  round((SELECT count(*) FROM res{q} WHERE rel > 0)::double / {k}, 6)
    AS p_at_k,
  round(coalesce(
    (SELECT sum((SELECT count(*) FROM res{q} r2
                 WHERE r2.rnk <= r.rnk AND r2.rel > 0)::double / r.rnk)
     FROM res{q} r WHERE r.rel > 0) /
    nullif(least((SELECT count(*) FROM qr{q}), {k}), 0), 0), 6) AS ap,
  round(coalesce(
    (SELECT sum((pow(2.0, r.rel) - 1) / 4.0 / r.rnk
                * exp(coalesce(
                    (SELECT sum(ln(1 - (pow(2.0, r2.rel) - 1) / 4.0))
                     FROM res{q} r2 WHERE r2.rnk < r.rnk), 0)))
     FROM res{q} r), 0), 6) AS err)"""


O_RANK_EVAL = (
    f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),"""
    + ",".join(
        _rankeval_block(q, terms, BM25_K)
        for q, terms in sorted(RANKEVAL_QUERIES.items())
    )
    + "\nSELECT * FROM met0 UNION ALL SELECT * FROM met1 ORDER BY qid"
)


QPP_K = 100


def q_qpp_predictors(spark, sf_dir):
    """Query-performance prediction (Carmel & Yom-Tov 2010; NQC: Shtok
    et al. 2012) for the rank_eval query set — the pre-retrieval
    predictors every query router/rewriter thresholds on (avg/max IDF,
    query scope = fraction of docs touched) plus post-retrieval NQC
    (score dispersion of the top-{QPP_K}). Determinism: top-k BM25
    scores quantize to integer MICROS before the variance fold, so
    mean/var are exact int64 arithmetic and the final doubles are
    engine-identical; NQC normalizes by Σidf (the collection-score
    stand-in, documented — Shtok's D_collection score needs a corpus
    LM). One tokenize pass feeds every query's stats."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    parts = []
    for qid, terms in sorted(RANKEVAL_QUERIES.items()):
        n, avgdl, dfs = _bm25_corpus_stats(per_doc, terms)
        # df=0 terms are excluded exactly as the oracle's dfm CTE
        # excludes them (GROUP BY over matching rows only) — guards the
        # day RANKEVAL_QUERIES gains an out-of-vocabulary term
        idfs = {
            t: math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            for t in terms
            if dfs.get(t, 0.0) > 0
        }
        sum_idf = sum(idfs.values())
        score = None
        for t in terms:
            tf = F.col("m")[t].cast("double")
            s_t = F.when(
                tf.isNotNull(),
                F.lit(idfs.get(t, 0.0)) * tf * F.lit(2.2)
                / (tf + F.lit(1.2)
                   * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
            ).otherwise(F.lit(0.0))
            score = s_t if score is None else score + s_t
        nm = sum(
            (F.col("m")[t].isNotNull().cast("int") for t in terms), F.lit(0)
        )
        top = (
            per_doc.withColumn("_s", score)
            .filter(nm >= 1)
            .select(
                "doc_id", F.round(F.col("_s") * 1e6).cast("long").alias("s6")
            )
            .orderBy(F.desc("s6"), F.asc("doc_id"))
            .limit(QPP_K)
        )
        stats = top.agg(
            F.count("*").alias("k"),
            F.sum("s6").alias("s1"),
            F.sum(F.col("s6") * F.col("s6")).alias("s2"),
        ).collect()[0]
        kk, s1, s2 = int(stats["k"]), int(stats["s1"]), int(stats["s2"])
        scope_n = per_doc.filter(nm >= 1).count()
        # double-precision numerator, mirroring the oracle's
        # k::double * s2::double - s1::double * s1::double (s1^2 can
        # pass 2^63 on larger corpora; int64 would overflow in DuckDB)
        var_micros2 = (
            (float(kk) * float(s2) - float(s1) * float(s1))
            / float(kk * kk)
            if kk
            else 0.0
        )
        nqc = (
            math.sqrt(max(var_micros2, 0.0)) / 1e6 / sum_idf
            if sum_idf
            else 0.0
        )
        parts.append(
            (
                qid,
                len(terms),
                round(sum_idf / len(terms), 6),
                round(max(idfs.values()) if idfs else 0.0, 6),
                round(scope_n / n, 6),
                round(nqc, 6),
            )
        )
    return spark.createDataFrame(
        parts,
        "qid int, n_terms int, avg_idf double, max_idf double,"
        " scope double, nqc double",
    ).orderBy("qid")


def _qpp_block(q: int, terms: list) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
dfm{q} AS (SELECT term, count(*)::double AS df FROM dt
           WHERE term IN ({tl}) GROUP BY 1),
idf{q} AS (SELECT term, ln(1 + (n - df + 0.5) / (df + 0.5)) AS idf
           FROM dfm{q} CROSS JOIN st),
sc{q} AS (SELECT dt.doc_id,
            round(sum(idf * tf * 2.2
                  / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) * 1e6)::bigint
              AS s6
          FROM dt JOIN idf{q} USING (term) JOIN dl USING (doc_id)
          CROSS JOIN st
          WHERE dt.term IN ({tl}) GROUP BY dt.doc_id),
top{q} AS (SELECT s6 FROM sc{q} ORDER BY s6 DESC LIMIT {QPP_K}),
agg{q} AS (SELECT count(*)::bigint AS k, sum(s6)::bigint AS s1,
                  sum(s6 * s6)::bigint AS s2 FROM top{q}),
met{q}q AS (SELECT {q}::int AS qid, {len(terms)}::int AS n_terms,
              round((SELECT sum(idf) FROM idf{q}) / {len(terms)}, 6)
                AS avg_idf,
              round((SELECT max(idf) FROM idf{q}), 6) AS max_idf,
              round((SELECT count(*) FROM sc{q})
                    / (SELECT n FROM st), 6) AS scope,
              round(sqrt(greatest((k::double * s2::double
                                   - s1::double * s1::double)
                                  / (k * k)::double, 0.0)) / 1e6
                    / (SELECT sum(idf) FROM idf{q}), 6) AS nqc
            FROM agg{q})"""


O_QPP_PREDICTORS = (
    f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),"""
    + ",".join(
        _qpp_block(q, terms) for q, terms in sorted(RANKEVAL_QUERIES.items())
    )
    + "\n"
    + " UNION ALL ".join(
        f"SELECT * FROM met{q}q" for q in sorted(RANKEVAL_QUERIES)
    )
    + " ORDER BY qid"
)


BM25F_BOOSTS = {"body": 1.0, "title": 2.0}

_T_TITLE = STANDARD_ANALYZER.duckdb_tokens_sql("title")
_T_BODY = STANDARD_ANALYZER.duckdb_tokens_sql("body")

_BM25F_FIELD_SCORE = """
t{f} AS (SELECT doc_id, unnest({toks}) AS term FROM d2),
dt{f} AS (SELECT doc_id, term, count(*)::double AS tf FROM t{f} GROUP BY 1, 2),
dl{f} AS (SELECT d2.doc_id, coalesce(c.dl, 0)::double AS dl
          FROM d2 LEFT JOIN (SELECT doc_id, count(*)::double AS dl
                             FROM t{f} GROUP BY 1) c USING (doc_id)),
st{f} AS (SELECT count(*)::double AS n, sum(dl) / count(*) AS avgdl FROM dl{f}),
dfm{f} AS (SELECT term, count(*)::double AS df FROM dt{f} JOIN qt USING (term)
           GROUP BY 1),
sc{f} AS (SELECT dt{f}.doc_id,
            sum({boost} * ln(1 + (n - df + 0.5) / (df + 0.5))
                * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
          FROM dt{f} JOIN dfm{f} USING (term) JOIN dl{f} USING (doc_id)
          CROSS JOIN st{f}
          GROUP BY dt{f}.doc_id)"""

_BM25F_ORACLE = f"""
WITH d2 AS (SELECT doc_id,
              array_to_string((regexp_extract_all(trim(text), '\\S+'))[1:6], ' ')
                AS title,
              text AS body
            FROM documents),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
{_BM25F_FIELD_SCORE.format(f="b", toks=_T_BODY, boost=BM25F_BOOSTS["body"])},
{_BM25F_FIELD_SCORE.format(f="t", toks=_T_TITLE, boost=BM25F_BOOSTS["title"])},
cand AS (SELECT doc_id FROM scb UNION SELECT doc_id FROM sct)
SELECT cand.doc_id,
       round(coalesce(scb.s, 0) + coalesce(sct.s, 0), 6) AS score
FROM cand LEFT JOIN scb USING (doc_id) LEFT JOIN sct USING (doc_id)
ORDER BY coalesce(scb.s, 0) + coalesce(sct.s, 0) DESC, cand.doc_id ASC
LIMIT {BM25_K}
"""


def q_bm25f_topk(spark, sf_dir):
    """Multi-field BM25 (search.bm25f_topk): title = the doc's first 6
    whitespace tokens (derived deterministically in both engines), body =
    full text; per-field df/dl/avgdl statistics, field boosts
    {title: 2.0, body: 1.0} — Lucene MultiFieldQueryParser semantics."""
    from nlp4l_spark.search import bm25f_topk

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 6), " "
        ).alias("title"),
        F.col("text").alias("body"),
    )
    return bm25f_topk(docs, BM25_QUERY, fields=BM25F_BOOSTS, k=BM25_K)


PREFIX_SEARCH = "sc"


def q_prefix_search(spark, sf_dir):
    """Lucene PrefixQuery semantics over the corpus: docs containing any
    term with the prefix, constant score (omitted — docID set), docID asc.
    Index path: Searcher.search_prefix (term-dictionary range scan)."""
    corpus = _corpus(spark, sf_dir)
    return (
        corpus.doc_terms()
        .filter(F.col("term").startswith(PREFIX_SEARCH))
        .select("doc_id")
        .distinct()
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_PREFIX_SEARCH = f"""
WITH {TOKS_CTE}
SELECT DISTINCT doc_id FROM toks WHERE term LIKE '{PREFIX_SEARCH}%'
ORDER BY doc_id ASC LIMIT 20
"""


def q_wildcard_search(spark, sf_dir):
    """Lucene WildcardQuery over the corpus: docs containing a term
    matching the pattern (constant-score rewrite -> docID set). Index
    path: Searcher.search_wildcard."""
    corpus = _corpus(spark, sf_dir)
    return (
        corpus.doc_terms()
        .filter(F.col("term").rlike("^s.a.*$"))
        .select("doc_id")
        .distinct()
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_WILDCARD_SEARCH = f"""
WITH {TOKS_CTE}
SELECT DISTINCT doc_id FROM toks WHERE regexp_matches(term, '^s.a.*$')
ORDER BY doc_id ASC LIMIT 20
"""

REGEXP_PATTERN = "(jo|sp).*[nk]"


def q_regexp_search(spark, sf_dir):
    """Lucene RegexpQuery over the corpus: docs containing a term the
    regex matches IN FULL (Lucene's implicit whole-term anchoring);
    constant-score rewrite -> docID set. Index path:
    Searcher.search_regexp (dictionary expansion with literal-prefix
    range prune + pushed In(term), TooManyClauses guard)."""
    corpus = _corpus(spark, sf_dir)
    return (
        corpus.doc_terms()
        .filter(F.col("term").rlike(f"^(?:{REGEXP_PATTERN})$"))
        .select("doc_id")
        .distinct()
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_REGEXP_SEARCH = f"""
WITH {TOKS_CTE}
SELECT DISTINCT doc_id FROM toks
WHERE regexp_matches(term, '^(?:{REGEXP_PATTERN})$')
ORDER BY doc_id ASC LIMIT 20
"""


def q_term_range_search(spark, sf_dir):
    """Lucene TermRangeQuery over the corpus: docs containing >=1 term in
    ['s', 't') — the term-dictionary range scan. Index path:
    Searcher.search_term_range (min/max-pruned on the sorted postings)."""
    corpus = _corpus(spark, sf_dir)
    return (
        corpus.doc_terms()
        .filter((F.col("term") >= "s") & (F.col("term") < "t"))
        .select("doc_id")
        .distinct()
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_TERM_RANGE_SEARCH = f"""
WITH {TOKS_CTE}
SELECT DISTINCT doc_id FROM toks WHERE term >= 's' AND term < 't'
ORDER BY doc_id ASC LIMIT 20
"""


BOOL_SHOULD = ["join", "vector"]
BOOL_MUST_NOT = "scan"
BOOL_BOOST = {"vector": 2.0}


def q_bm25_not_topk(spark, sf_dir):
    """BooleanQuery with MUST_NOT + BoostQuery over the corpus: score
    SHOULD terms (vector boosted 2x), exclude any doc containing the
    MUST_NOT term. Index path: Searcher.search_boolean / Searcher.query
    ("join vector^2 -scan"), identity-tested in tests/test_boolean.py.
    Same two-pass one-tokenize shape as q_bm25_topk; MUST_NOT = the
    per-doc map lookup of the excluded term is null."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BOOL_SHOULD)
    score = None
    for t in BOOL_SHOULD:
        idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
        boost = BOOL_BOOST.get(t, 1.0)
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            F.lit(idf_w * boost)
            * tf
            * F.lit(2.2)
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
    return (
        per_doc.filter(
            F.greatest(*[F.col("m")[t] for t in BOOL_SHOULD]).isNotNull()
        )
        .filter(F.col("m")[BOOL_MUST_NOT].isNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_BM25_NOT_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest(['join', 'vector']) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
excl AS (SELECT DISTINCT doc_id FROM dt WHERE term = '{BOOL_MUST_NOT}'),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * (CASE WHEN dt.term = 'vector' THEN 2.0 ELSE 1.0 END)
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       WHERE dt.doc_id NOT IN (SELECT doc_id FROM excl)
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


FUZZY_TERM = "joun"  # 1 edit from "join"


def q_fuzzy_bm25_topk(spark, sf_dir):
    """Lucene FuzzyQuery shape over the corpus: expand to dictionary terms
    within 2 edits, BM25 weighted by the fuzzy boost
    1 - edits/min(|term|,|query|), sum per doc. Index path:
    Searcher.search_fuzzy (same formulas over term_stats)."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    stats = per_doc.agg(
        F.count("*").alias("n"), F.sum("dl").alias("sum_dl")
    ).collect()[0]
    n, avgdl = stats["n"], stats["sum_dl"] / stats["n"]
    # dictionary expansion: df per term within 2 DAMERAU-Levenshtein edits
    # (transposition = 1, matching Lucene's transpositions=true and the
    # oracle's duckdb damerau_levenshtein) + Lucene fuzzy boost; mirror
    # Searcher.search_fuzzy — the JVM lev <= 2*max_edits prefilter bounds
    # the collect (Lev <= 2*DL), DL runs driver-side on that handful;
    # zero/negative boosts (possible for 1-2 char terms) are dropped
    from nlp4l_spark.search.engine import damerau_levenshtein

    lev = F.levenshtein(F.col("term"), F.lit(FUZZY_TERM))
    cand_rows = (
        per_doc.select(F.explode(F.map_keys("m")).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))
        .filter(lev <= 4)
        .collect()
    )
    exp_rows = []
    for r in cand_rows:
        edits = damerau_levenshtein(r["term"], FUZZY_TERM)
        if edits > 2:
            continue
        boost = 1.0 - edits / min(len(r["term"]), len(FUZZY_TERM))
        if boost > 0:
            exp_rows.append({"term": r["term"], "df": r["df"], "boost": boost})
    # scoring pass: idf*boost folded into one literal per expanded term,
    # tf from the per-doc map — no joins, no groupBy
    score, any_match = None, None
    for r in exp_rows:
        w = (
            math.log(1.0 + (n - r["df"] + 0.5) / (r["df"] + 0.5))
            * float(r["boost"])
        )
        tf = F.col("m")[r["term"]].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            F.lit(w)
            * tf
            * F.lit(2.2)
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[r["term"]]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    if score is None:
        return spark.createDataFrame([], "doc_id long, score double")
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_FUZZY_BM25_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
dfm AS (SELECT term, count(*)::double AS df FROM dt GROUP BY 1),
exp AS (SELECT term, df,
               1.0 - damerau_levenshtein(term, '{FUZZY_TERM}')::double
                     / least(length(term), {len(FUZZY_TERM)}) AS boost
        FROM dfm WHERE damerau_levenshtein(term, '{FUZZY_TERM}') <= 2
          AND 1.0 - damerau_levenshtein(term, '{FUZZY_TERM}')::double
                    / least(length(term), {len(FUZZY_TERM)}) > 0),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * boost
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN exp USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


PHRASE_QUERY = "merge join"


def q_phrase_bm25_topk(spark, sf_dir):
    """Exact-phrase top-k, Lucene PhraseQuery BM25 semantics (tf = phrase
    frequency with stopword-hole adjacency, idf = Σ per-term idf); the
    index path (Searcher.search_phrase over term_vectors positions) is
    identity-tested against this in tests/test_phrase.py."""
    from nlp4l_spark.search import phrase_bm25_topk

    return phrase_bm25_topk(_docs(spark, sf_dir), PHRASE_QUERY, k=BM25_K)


O_PHRASE_BM25_TOPK = f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
base AS (SELECT doc_id,
           CASE WHEN len(ft) >= 2 THEN len(list_filter(range(1, len(ft)),
                i -> ft[i] = 'merge' AND ft[i+1] = 'join')) ELSE 0 END AS tf,
           len(at) AS dl
         FROM t),
n AS (SELECT count(*)::double AS n,
             sum(dl)::double / count(*) AS avgdl FROM base),
d AS (SELECT
        (SELECT count(*) FROM t WHERE list_contains(at, 'merge')) AS dfm,
        (SELECT count(*) FROM t WHERE list_contains(at, 'join')) AS dfj)
SELECT doc_id,
       round((ln(1 + (n.n - d.dfm + 0.5) / (d.dfm + 0.5))
              + ln(1 + (n.n - d.dfj + 0.5) / (d.dfj + 0.5)))
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / n.avgdl)), 6)
           AS score
FROM base, n, d WHERE tf > 0
ORDER BY score DESC, doc_id ASC LIMIT 10
"""


def q_boolean_tree_topk(spark, sf_dir):
    """Nested BooleanQuery top-k, corpus path (index twin
    Searcher.search_tree): (join AND (merge OR vector)) NOT scan — the
    flat clause parser cannot express the inner disjunction. Score =
    Σ BM25 of the matching scoring terms (join always; merge/vector when
    present); scan is pure exclusion and never scores."""
    scoring = ["join", "merge", "vector"]
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, scoring)
    has = lambda t: F.col("m")[t].isNotNull()
    return (
        per_doc.filter(
            has("join")
            & (has("merge") | has("vector"))
            & F.col("m")["scan"].isNull()
        )
        .withColumn("s", _bm25_score_col(scoring, n, avgdl, dfs))
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_BOOLEAN_TREE_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest(['join', 'merge', 'vector']) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s,
              count(*) FILTER (term = 'join') AS has_j,
              count(*) FILTER (term IN ('merge', 'vector')) AS has_mv
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
WHERE has_j > 0 AND has_mv > 0
  AND doc_id NOT IN (SELECT DISTINCT doc_id FROM toks WHERE term = 'scan')
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


RESCORE_WINDOW = 50
RESCORE_WEIGHT = 2.0


def q_rescore_topk(spark, sf_dir):
    """Two-phase rescoring (Lucene QueryRescorer / ES rescore; index twin
    Searcher.search_rescore): cheap BM25 first pass picks the rounded
    top-50 window, then the exact-phrase 'merge join' BM25 rescores
    WITHIN the window only — final order bm25 + 2.0 * phrase_bm25. The
    window cut uses the rounded (s1 desc, doc_id asc) total order so
    both engines pick the identical candidate set."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    window = (
        per_doc.withColumn(
            "s1", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s1"), F.asc("doc_id"))
        .limit(RESCORE_WINDOW)
        .select("doc_id", "s1")
    )
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias(
            "ft"
        ),
        STANDARD_ANALYZER.tokens_expr("text").alias("at"),
    )
    # phrase stats reuse the FIRST pass's aggregates — same analyzer, so
    # n/avgdl are identical and 'merge'/'join' dfs are already in dfs;
    # no second stats job
    idf_total = math.log(
        1.0 + (n - dfs["merge"] + 0.5) / (dfs["merge"] + 0.5)
    ) + math.log(1.0 + (n - dfs["join"] + 0.5) / (dfs["join"] + 0.5))
    avgdl_p = avgdl
    tf = F.expr(
        "CASE WHEN size(ft) >= 2 THEN size(filter(sequence(0, size(ft) - 2),"
        " i -> ft[i] = 'merge' AND ft[i + 1] = 'join')) ELSE 0 END"
    ).cast("double")
    ph = (
        t.select("doc_id", tf.alias("tf"), F.size("at").cast("double").alias("dl"))
        .filter(F.col("tf") > 0)
        .select(
            "doc_id",
            (
                F.lit(idf_total)
                * F.col("tf")
                * F.lit(2.2)
                / (
                    F.col("tf")
                    + F.lit(1.2)
                    * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl_p))
                )
            ).alias("s2"),
        )
    )
    return (
        window.join(ph, "doc_id", "left")
        .withColumn(
            "s",
            F.col("s1")
            + F.lit(RESCORE_WEIGHT) * F.coalesce(F.col("s2"), F.lit(0.0)),
        )
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_RESCORE_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
w AS (SELECT dt.doc_id,
             round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                 * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s1
      FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
      GROUP BY dt.doc_id
      ORDER BY s1 DESC, dt.doc_id ASC LIMIT {RESCORE_WINDOW}),
t AS (SELECT doc_id,
        regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
        {TOK_SQL} AS at FROM documents),
pb AS (SELECT doc_id,
         CASE WHEN len(ft) >= 2 THEN len(list_filter(range(1, len(ft)),
              i -> ft[i] = 'merge' AND ft[i+1] = 'join')) ELSE 0 END::double AS tf,
         len(at)::double AS pdl
       FROM t),
pn AS (SELECT count(*)::double AS n, sum(pdl) / count(*) AS avgdl FROM pb),
pd AS (SELECT
         (SELECT count(*) FROM t WHERE list_contains(at, 'merge')) AS dfm,
         (SELECT count(*) FROM t WHERE list_contains(at, 'join')) AS dfj),
ph AS (SELECT doc_id,
         (ln(1 + (pn.n - pd.dfm + 0.5) / (pd.dfm + 0.5))
          + ln(1 + (pn.n - pd.dfj + 0.5) / (pd.dfj + 0.5)))
         * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * pdl / pn.avgdl)) AS s2
       FROM pb, pn, pd WHERE tf > 0)
SELECT w.doc_id,
       round(w.s1 + {RESCORE_WEIGHT!r} * coalesce(ph.s2, 0), 6) AS score
FROM w LEFT JOIN ph USING (doc_id)
ORDER BY score DESC, w.doc_id ASC LIMIT {BM25_K}
"""


SLOPPY_SLOP = 2


def q_sloppy_phrase_topk(spark, sf_dir):
    """Two-term sloppy PhraseQuery top-k, corpus path (index twin
    Searcher.search_sloppy_phrase): fractional phrase tf = Σ over
    ordered position pairs within slop of 1/(pb - pa) — the
    1/(1+matchLength) decay of Lucene's SloppyPhraseMatcher — scored as
    (idf_merge + idf_join) * BM25 norm. Deviations documented on the
    engine method (ordered-only, all qualifying pairs). Positions are
    full-token-stream indexes (stopword holes preserved), dl/df from the
    analyzed stream — same contract as phrase_bm25_topk."""
    win = SLOPPY_SLOP + 1
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias(
            "ft"
        ),
        STANDARD_ANALYZER.tokens_expr("text").alias("at"),
    )

    def _positions(term):
        return F.filter(
            F.transform(
                F.col("ft"),
                lambda x, i: F.when(x == term, i).otherwise(F.lit(-1)),
            ),
            lambda v: v >= 0,
        )

    pa, pb = _positions("merge"), _positions("join")
    tfw = F.aggregate(
        pa,
        F.lit(0.0),
        lambda acc, i: acc
        + F.aggregate(
            F.filter(pb, lambda j: (j > i) & (j - i <= win)),
            F.lit(0.0),
            lambda a2, j: a2 + F.lit(1.0) / (j - i),
        ),
    )
    stats = t.agg(
        F.count("*").alias("n"),
        F.sum(F.size("at")).alias("sdl"),
        F.count_if(F.array_contains("at", "merge")).alias("dfm"),
        F.count_if(F.array_contains("at", "join")).alias("dfj"),
    ).collect()[0]
    n = float(stats["n"])
    avgdl = float(stats["sdl"]) / n
    idf_total = math.log(
        1.0 + (n - stats["dfm"] + 0.5) / (stats["dfm"] + 0.5)
    ) + math.log(1.0 + (n - stats["dfj"] + 0.5) / (stats["dfj"] + 0.5))
    return (
        t.select(
            "doc_id", tfw.alias("tf"), F.size("at").cast("double").alias("dl")
        )
        .filter(F.col("tf") > 0)
        .withColumn(
            "s",
            F.lit(idf_total)
            * F.col("tf")
            * F.lit(2.2)
            / (
                F.col("tf")
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_SLOPPY_PHRASE_TOPK = f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
pos AS (SELECT doc_id,
          list_filter(range(1, len(ft) + 1), i -> ft[i] = 'merge') AS pa,
          list_filter(range(1, len(ft) + 1), j -> ft[j] = 'join') AS pb,
          len(at)::double AS dl
        FROM t),
base AS (SELECT doc_id, dl,
           coalesce(list_aggregate(list_transform(pa, i ->
             coalesce(list_aggregate(list_transform(
               list_filter(pb, j -> j > i AND j - i <= {SLOPPY_SLOP + 1}),
               j -> 1.0::double / (j - i)), 'sum'), 0)), 'sum'), 0) AS tf
         FROM pos),
n AS (SELECT count(*)::double AS n,
             sum(dl) / count(*) AS avgdl FROM base),
d AS (SELECT
        (SELECT count(*) FROM t WHERE list_contains(at, 'merge')) AS dfm,
        (SELECT count(*) FROM t WHERE list_contains(at, 'join')) AS dfj)
SELECT doc_id,
       round((ln(1 + (n.n - d.dfm + 0.5) / (d.dfm + 0.5))
              + ln(1 + (n.n - d.dfj + 0.5) / (d.dfj + 0.5)))
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / n.avgdl)), 6)
           AS score
FROM base, n, d WHERE tf > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


SLOPPY3_TERMS = ("merge", "join", "query")
SLOPPY3_SLOP = 4


def q_sloppy_phrase3_topk(spark, sf_dir):
    """THREE-term sloppy PhraseQuery top-k, corpus path (index twin
    Searcher.search_sloppy_phrase_multi — session 13 closes the
    documented >2-term fall-through): tf = Σ over strictly increasing
    position triples (p₁<p₂<p₃) with matchLength L = (p₃−p₁)−2 ≤ slop
    of 1/(1+L), the k=2 pair decay generalized; the partial prune
    p₂−p₁−1 ≤ slop applies mid-tuple exactly as the engine's fold.
    Score = Σ idf · BM25 norm, positions on the full token stream —
    the sloppy_phrase_topk contract, k=3 edition."""
    win_mid = SLOPPY3_SLOP + 1
    t = _docs(spark, sf_dir).select(
        "doc_id",
        F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)").alias(
            "ft"
        ),
        STANDARD_ANALYZER.tokens_expr("text").alias("at"),
    )

    def _positions(term):
        return F.filter(
            F.transform(
                F.col("ft"),
                lambda x, i: F.when(x == term, i).otherwise(F.lit(-1)),
            ),
            lambda v: v >= 0,
        )

    ta, tb, tc = SLOPPY3_TERMS
    pa, pb, pc = _positions(ta), _positions(tb), _positions(tc)
    tfw = F.aggregate(
        pa,
        F.lit(0.0),
        lambda acc, i: acc
        + F.aggregate(
            F.filter(pb, lambda j: (j > i) & (j - i <= win_mid)),
            F.lit(0.0),
            lambda a2, j: a2
            + F.aggregate(
                F.filter(
                    pc,
                    lambda m: (m > j) & (m - i - 2 <= F.lit(SLOPPY3_SLOP)),
                ),
                F.lit(0.0),
                lambda a3, m: a3 + F.lit(1.0) / (m - i - 2 + F.lit(1.0)),
            ),
        ),
    )
    stats = t.agg(
        F.count("*").alias("n"),
        F.sum(F.size("at")).alias("sdl"),
        *[
            F.count_if(F.array_contains("at", tm)).alias(f"df{x}")
            for x, tm in enumerate(SLOPPY3_TERMS)
        ],
    ).collect()[0]
    n = float(stats["n"])
    avgdl = float(stats["sdl"]) / n
    idf_total = sum(
        math.log(
            1.0 + (n - stats[f"df{x}"] + 0.5) / (stats[f"df{x}"] + 0.5)
        )
        for x in range(3)
    )
    return (
        t.select(
            "doc_id", tfw.alias("tf"), F.size("at").cast("double").alias("dl")
        )
        .filter(F.col("tf") > 0)
        .withColumn(
            "s",
            F.lit(idf_total)
            * F.col("tf")
            * F.lit(2.2)
            / (
                F.col("tf")
                + F.lit(1.2)
                * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))
            ),
        )
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_SLOPPY_PHRASE3_TOPK = f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
pos AS (SELECT doc_id,
          list_filter(range(1, len(ft) + 1), i -> ft[i] = 'merge') AS pa,
          list_filter(range(1, len(ft) + 1), j -> ft[j] = 'join') AS pb,
          list_filter(range(1, len(ft) + 1), m -> ft[m] = 'query') AS pc,
          len(at)::double AS dl
        FROM t),
base AS (SELECT doc_id, dl,
           coalesce(list_aggregate(list_transform(pa, i ->
             coalesce(list_aggregate(list_transform(
               list_filter(pb, j -> j > i AND j - i <= {SLOPPY3_SLOP + 1}),
               j -> coalesce(list_aggregate(list_transform(
                 list_filter(pc, m -> m > j AND m - i - 2 <= {SLOPPY3_SLOP}),
                 m -> 1.0::double / (m - i - 2 + 1)), 'sum'), 0)), 'sum'),
               0)), 'sum'), 0) AS tf
         FROM pos),
n AS (SELECT count(*)::double AS n,
             sum(dl) / count(*) AS avgdl FROM base),
d AS (SELECT
        (SELECT count(*) FROM t WHERE list_contains(at, 'merge')) AS df0,
        (SELECT count(*) FROM t WHERE list_contains(at, 'join')) AS df1,
        (SELECT count(*) FROM t WHERE list_contains(at, 'query')) AS df2)
SELECT doc_id,
       round((ln(1 + (n.n - d.df0 + 0.5) / (d.df0 + 0.5))
              + ln(1 + (n.n - d.df1 + 0.5) / (d.df1 + 0.5))
              + ln(1 + (n.n - d.df2 + 0.5) / (d.df2 + 0.5)))
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / n.avgdl)), 6)
           AS score
FROM base, n, d WHERE tf > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


SPAN_A, SPAN_B, SPAN_SLOP = "merge", "join", 2


def q_span_near(spark, sf_dir):
    """Lucene SpanNearQuery (two clauses, in-order, slop=2) over the
    corpus: docs with a 'merge' position followed by a 'join' position
    with <= slop intervening tokens; n_spans = qualifying start
    positions. Index path: Searcher.search_span_near (term_vectors
    positions), identity-tested in tests/test_boolean.py. Positions are
    full-token-stream indexes (stopword holes preserved), same contract
    as the phrase queries."""
    win = SPAN_SLOP + 1
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def positions(term):
        return F.filter(
            F.transform(
                ft, lambda x, i: F.when(x == term, i).otherwise(F.lit(None))
            ),
            lambda v: v.isNotNull(),
        )

    pa, pb = positions(SPAN_A), positions(SPAN_B)
    n_spans = F.size(
        F.filter(
            pa, lambda p0: F.exists(pb, lambda p1: (p1 > p0) & (p1 - p0 <= win))
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_spans.cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_NEAR = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_A}') AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_B}') AS pb
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb, p1 -> p1 > p0 AND p1 - p0 <= {SPAN_SLOP + 1})) > 0
        ))::bigint AS n_spans
      FROM p)
SELECT doc_id, n_spans FROM s WHERE n_spans > 0 ORDER BY doc_id ASC LIMIT 20
"""


def q_span_near3(spark, sf_dir):
    """Lucene SpanNearQuery with THREE clauses, in-order, slop=4
    (index twin Searcher.search_span_near_multi — session 13 closes the
    two-clause-only surface): a span is a strictly increasing triple
    (p₁<p₂<p₃) with (p₃−p₁)−2 ≤ slop; n_spans counts qualifying start
    positions, with the partial prune p₂−p₁−1 ≤ slop mid-tuple exactly
    as the engine's EXISTS chain."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def positions(term):
        return F.filter(
            F.transform(
                ft, lambda x, i: F.when(x == term, i).otherwise(F.lit(None))
            ),
            lambda v: v.isNotNull(),
        )

    ta, tb, tc = SLOPPY3_TERMS
    pa, pb, pc = positions(ta), positions(tb), positions(tc)
    slop = SLOPPY3_SLOP
    n_spans = F.size(
        F.filter(
            pa,
            lambda p0: F.exists(
                pb,
                lambda p1: (p1 > p0)
                & (p1 - p0 - 1 <= F.lit(slop))
                & F.exists(
                    pc,
                    lambda p2: (p2 > p1) & (p2 - p0 - 2 <= F.lit(slop)),
                ),
            ),
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_spans.cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_NEAR3 = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = 'merge') AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = 'join') AS pb,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = 'query') AS pc
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb, p1 -> p1 > p0 AND p1 - p0 - 1 <= {SLOPPY3_SLOP}
            AND len(list_filter(pc, p2 -> p2 > p1
                AND p2 - p0 - 2 <= {SLOPPY3_SLOP})) > 0)) > 0
        ))::bigint AS n_spans
      FROM p)
SELECT doc_id, n_spans FROM s WHERE n_spans > 0 ORDER BY doc_id ASC LIMIT 20
"""


# --------------------------------------------------------------------- #
