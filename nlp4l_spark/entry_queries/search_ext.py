# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    BM25_K, BM25_QUERY, BM25_TERMS, F, STANDARD_ANALYZER, TOKS_CTE, TOK_SQL,
    Window, _docs, _embeddings, math, similarity,
)
from nlp4l_spark.entry_queries.search import (  # noqa: F401
    _bm25_corpus_stats, _bm25_per_doc, _bm25_score_col,
)
# forward reference in the monolith (q_index_sorted_topk uses the index
# cache helper defined in the ja_unicode section); ja_unicode depends
# only on core+search, so this import stays acyclic
from nlp4l_spark.entry_queries.ja_unicode import (  # noqa: F401
    _index_cache_dir,
)
# Extended similarity / query-type surface (Lucene SynonymQuery,
# LM Dirichlet / Jelinek-Mercer, ClassicSimilarity, MultiPhraseQuery,
# suggesters, passage retrieval) — corpus twins of the Searcher methods
# in search/engine.py, identity-tested in tests/test_similarities.py.
# --------------------------------------------------------------------- #
SYN_GROUPS = [["join", "merge"], ["vector"]]
LMD_MU = 2000.0
LMJM_LAMBDA = 0.7
MPHRASE_SLOTS = [["hash", "merge"], ["join"]]
SUGGEST_PREFIX = "s"
SUGGEST_CONTEXT = "merge"
PASSAGE_TERMS = BM25_TERMS
PASSAGE_W = 15
LANG_ALPHA = 0.3


def q_synonym_topk(spark, sf_dir):
    """Lucene SynonymQuery top-k, corpus path (index twin
    Searcher.search_synonym): each group of synonyms scores as ONE
    pseudo-term — tf = Σ member tfs, df = MAX member dfs (SynonymQuery's
    blended TermStatistics: docFreq = max, totalTermFreq = sum) — and
    groups combine as SHOULD. Same two-pass one-tokenize shape as
    q_bm25_topk; the blend is per-doc map arithmetic, no extra scan."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    all_terms = sorted({t for g in SYN_GROUPS for t in g})
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, all_terms)
    score, any_match = None, None
    for g in SYN_GROUPS:
        idf_w = math.log(
            1.0 + (n - max(dfs[t] for t in g) + 0.5) / (max(dfs[t] for t in g) + 0.5)
        )
        tf_g = None
        for t in g:
            tf_t = F.coalesce(F.col("m")[t].cast("double"), F.lit(0.0))
            tf_g = tf_t if tf_g is None else tf_g + tf_t
        s_g = F.when(
            tf_g > 0,
            F.lit(idf_w)
            * tf_g
            * F.lit(2.2)
            / (tf_g + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        ).otherwise(F.lit(0.0))
        score = s_g if score is None else score + s_g
        for t in g:
            m_t = F.col("m")[t]
            any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


_SYN_VALUES = ", ".join(
    f"({gid}, '{t}')" for gid, g in enumerate(SYN_GROUPS) for t in g
)

O_SYNONYM_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
gt AS (SELECT * FROM (VALUES {_SYN_VALUES}) AS v(gid, term)),
dfm AS (SELECT term, count(*)::double AS df FROM dt
        WHERE term IN (SELECT term FROM gt) GROUP BY 1),
gstat AS (SELECT gid, max(df) AS df FROM gt JOIN dfm USING (term) GROUP BY 1),
gtf AS (SELECT doc_id, gid, sum(tf) AS tf
        FROM dt JOIN gt USING (term) GROUP BY 1, 2),
sc AS (SELECT doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM gtf JOIN gstat USING (gid) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def _lm_corpus_stats(per_doc, terms):
    """(n, total_tokens, {term: cf}) in ONE aggregation job — the
    collection language model the LM similarities need."""
    aggs = [F.count("*").alias("n"), F.sum("dl").alias("sum_dl")] + [
        F.sum(F.col("m")[t]).cast("double").alias(f"_cf_{i}")
        for i, t in enumerate(terms)
    ]
    row = per_doc.agg(*aggs).collect()[0]
    return (
        row["n"],
        float(row["sum_dl"]),
        {t: float(row[f"_cf_{i}"] or 0.0) for i, t in enumerate(terms)},
    )


def q_lmd_topk(spark, sf_dir):
    """LM Dirichlet top-k, corpus path (index twin
    Searcher.search_lm(similarity='dirichlet'); Lucene
    LMDirichletSimilarity, Zhai & Lafferty 2001, mu=2000): per present
    term max(0, ln(1 + tf/(mu*p)) + ln(mu/(dl+mu))) with
    p(t|C) = (cf+1)/(total+1). Cross-engine determinism: the per-term
    value is rounded to 6 dp BEFORE Lucene's clamp-to-0 so clamp
    membership can never differ by an ulp between engines (the index
    path keeps the pure formula)."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, total, cfs = _lm_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        p = (cfs[t] + 1.0) / (total + 1.0)
        tf = F.col("m")[t].cast("double")
        raw = F.log(F.lit(1.0) + tf / F.lit(LMD_MU * p)) + F.log(
            F.lit(LMD_MU) / (F.col("dl") + F.lit(LMD_MU))
        )
        s_t = F.when(
            tf.isNotNull(), F.greatest(F.lit(0.0), F.round(raw, 6))
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def _o_lm_topk(similarity: str) -> str:
    qt = ", ".join(f"'{t}'" for t in BM25_TERMS)
    if similarity == "dirichlet":
        term_s = (
            f"greatest(0, round(ln(1 + tf / ({LMD_MU!r} * ((cf + 1) / (total + 1))))"
            f" + ln({LMD_MU!r} / (dl + {LMD_MU!r})), 6))"
        )
    else:
        term_s = (
            f"ln(1 + ({1.0 - LMJM_LAMBDA!r} * tf / dl)"
            f" / ({LMJM_LAMBDA!r} * ((cf + 1) / (total + 1))))"
        )
    return f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
tot AS (SELECT count(*)::double AS total FROM toks),
cfm AS (SELECT term, sum(tf) AS cf FROM dt WHERE term IN ({qt}) GROUP BY 1),
sc AS (SELECT dt.doc_id, sum({term_s}) AS s
       FROM dt JOIN cfm USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


O_LMD_TOPK = _o_lm_topk("dirichlet")
O_LMJM_TOPK = _o_lm_topk("jm")


def q_lmjm_topk(spark, sf_dir):
    """LM Jelinek-Mercer top-k, corpus path (index twin
    Searcher.search_lm(similarity='jm'); Lucene
    LMJelinekMercerSimilarity, lambda=0.7): per present term
    ln(1 + ((1-lambda)*tf/dl) / (lambda*p)) — always >= 0, so no clamp
    (and no rounding trick) is needed."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, total, cfs = _lm_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        p = (cfs[t] + 1.0) / (total + 1.0)
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            F.log(
                F.lit(1.0)
                + (F.lit(1.0 - LMJM_LAMBDA) * tf / F.col("dl"))
                / F.lit(LMJM_LAMBDA * p)
            ),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def q_classic_topk(spark, sf_dir):
    """Lucene ClassicSimilarity top-k, corpus path (index twin
    Searcher.search_classic; the pre-6.x TFIDFSimilarity default):
    per present term sqrt(tf) * idf^2 / sqrt(dl),
    idf = 1 + ln(n / (df + 1)) — idf squared because it enters both the
    query and the term weight (queryNorm/coord are gone since Lucene 7);
    exact 1/sqrt(dl) instead of Lucene's lossy byte-encoded norm,
    documented."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, _avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        idf2 = (1.0 + math.log(n / (dfs[t] + 1.0))) ** 2
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(), F.sqrt(tf) * F.lit(idf2) / F.sqrt(F.col("dl"))
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_CLASSIC_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(sqrt(tf) * pow(1 + ln(n / (df + 1)), 2) / sqrt(dl)) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


COMBSUM_POOL = 20


def q_combsum_topk(spark, sf_dir):
    """CombSUM score fusion (Fox & Shaw 1994; the other classic rank
    fusion next to hybrid_rrf_topk's RRF): min-max-normalize the BM25
    and ClassicSimilarity top-20 score lists to [0,1] and sum. All
    normalization inputs are 6-dp rounded so pool membership and the
    normalized values are cross-engine deterministic; normalizers are
    broadcast scalars over the pool-sized frames."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    classic = None
    for t in BM25_TERMS:
        idf2 = (1.0 + math.log(n / (dfs[t] + 1.0))) ** 2
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(), F.sqrt(tf) * F.lit(idf2) / F.sqrt(F.col("dl"))
        ).otherwise(F.lit(0.0))
        classic = s_t if classic is None else classic + s_t
    scored = (
        per_doc.filter(
            F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull()
        )
        .withColumn(
            "s1", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .withColumn("s2", F.round(classic, 6))
        .select("doc_id", "s1", "s2")
    )

    def _norm(col):
        pool = (
            scored.orderBy(F.desc(col), F.asc("doc_id"))
            .limit(COMBSUM_POOL)
            .select("doc_id", col)
        )
        mm = pool.agg(
            F.min(col).alias("_mn"), F.max(col).alias("_mx")
        )
        return pool.crossJoin(F.broadcast(mm)).select(
            "doc_id",
            F.when(
                F.col("_mx") > F.col("_mn"),
                F.round(
                    (F.col(col) - F.col("_mn")) / (F.col("_mx") - F.col("_mn")),
                    6,
                ),
            )
            .otherwise(F.lit(0.0))
            .alias(f"n_{col}"),
        )
    na, nb = _norm("s1"), _norm("s2")
    return (
        na.join(nb, "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                F.coalesce(F.col("n_s1"), F.lit(0.0))
                + F.coalesce(F.col("n_s2"), F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


O_COMBSUM_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s1,
              round(sum(sqrt(tf) * pow(1 + ln(n / (df + 1)), 2) / sqrt(dl)), 6) AS s2
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
a AS (SELECT doc_id, s1 FROM sc ORDER BY s1 DESC, doc_id LIMIT {COMBSUM_POOL}),
b AS (SELECT doc_id, s2 FROM sc ORDER BY s2 DESC, doc_id LIMIT {COMBSUM_POOL}),
na AS (SELECT doc_id, CASE WHEN max(s1) OVER () > min(s1) OVER ()
         THEN round((s1 - min(s1) OVER ()) / (max(s1) OVER () - min(s1) OVER ()), 6)
         ELSE 0 END AS n1 FROM a),
nb AS (SELECT doc_id, CASE WHEN max(s2) OVER () > min(s2) OVER ()
         THEN round((s2 - min(s2) OVER ()) / (max(s2) OVER () - min(s2) OVER ()), 6)
         ELSE 0 END AS n2 FROM b)
SELECT doc_id,
       round(coalesce(n1, 0) + coalesce(n2, 0), 6) AS score
FROM na FULL JOIN nb USING (doc_id)
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_dfr_topk(spark, sf_dir):
    """DFR InL2 top-k, corpus path (index twin Searcher.search_dfr;
    Lucene DFRSimilarity(BasicModelIN, AfterEffectL, NormalizationH2),
    Amati & van Rijsbergen 2002): per present term, with
    tfn = tf * log2(1 + c*avgdl/dl) (c=1),
    contribution = tfn * log2((n+1)/(df+0.5)) / (tfn+1). Same
    single-tokenize two-pass corpus shape as bm25_topk — only the score
    expression changes."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        log2in = math.log2((n + 1.0) / (dfs[t] + 0.5))
        tf = F.col("m")[t].cast("double")
        tfn = tf * F.log2(F.lit(1.0) + F.lit(avgdl) / F.col("dl"))
        s_t = F.when(
            tf.isNotNull(), tfn * F.lit(log2in) / (tfn + F.lit(1.0))
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_DFR_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(tf * log2(1 + avgdl / dl) * log2((n + 1) / (df + 0.5))
                  / (tf * log2(1 + avgdl / dl) + 1)) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_f2exp_topk(spark, sf_dir):
    """Axiomatic F2EXP top-k, corpus path (index twin
    Searcher.search_axiomatic; Fang & Zhai SIGIR 2005, Lucene
    AxiomaticF2EXP defaults s=0.5, k=0.35): per present term
    ((n+1)/df)^0.35 * tf / (tf + 0.5 + 0.5 * dl / avgdl) — Lucene's
    (n+1)/df idf base, documented vs the paper's n/df."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        idfk = ((n + 1.0) / dfs[t]) ** 0.35
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            F.lit(idfk)
            * tf
            / (tf + F.lit(0.5) + F.lit(0.5) * F.col("dl") / F.lit(avgdl)),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_F2EXP_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(pow((n + 1) / df, 0.35) * tf
                  / (tf + 0.5 + 0.5 * dl / avgdl)) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_ib_topk(spark, sf_dir):
    """Information-based LL/DF/H2 top-k, corpus path (index twin
    Searcher.search_ib; Lucene IBSimilarity(DistributionLL, LambdaDF,
    NormalizationH2), Clinchant & Gaussier SIGIR 2010): per present term,
    with tfn = tf * log2(1 + avgdl/dl) (H2, c=1) and
    lambda = (df+1)/(n+1) (LambdaDF), contribution =
    ln(1 + tfn/lambda) (DistributionLL's -ln(lambda/(lambda+tfn))).
    Same single-tokenize two-pass corpus shape as bm25_topk."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        lam = (dfs[t] + 1.0) / (n + 1.0)
        tf = F.col("m")[t].cast("double")
        tfn = tf * F.log2(F.lit(1.0) + F.lit(avgdl) / F.col("dl"))
        s_t = F.when(
            tf.isNotNull(), F.log(F.lit(1.0) + tfn / F.lit(lam))
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_IB_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (tf * log2(1 + avgdl / dl))
                  / ((df + 1) / (n + 1)))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_dfi_topk(spark, sf_dir):
    """Divergence-from-independence top-k, corpus path (index twin
    Searcher.search_dfi; Lucene DFISimilarity(IndependenceChiSquared),
    Kocabas, Dincer & Karaoglan IR 2014): per present term, with
    expected = (cf+1) * dl / (total+1) (the +1s are Lucene's), tf <=
    expected contributes 0 (chance-level occurrence), else
    log2((tf-expected)^2/expected + 1). The clamp compares products and
    quotients of integer-exact doubles evaluated in the same order on
    both engines, so clamp membership is bit-deterministic (no rounding
    trick needed, unlike lmd_topk's transcendental-then-clamp)."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, total, cfs = _lm_corpus_stats(per_doc, BM25_TERMS)
    score, any_match = None, None
    for t in BM25_TERMS:
        cfp = cfs[t] + 1.0
        tf = F.col("m")[t].cast("double")
        expected = F.lit(cfp) * F.col("dl") / F.lit(total + 1.0)
        s_t = F.when(
            tf.isNotNull() & (tf > expected),
            F.log2((tf - expected) * (tf - expected) / expected + F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_DFI_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
tot AS (SELECT count(*)::double AS total FROM toks),
cfm AS (SELECT term, sum(tf) AS cf FROM dt
        WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(CASE WHEN tf > (cf + 1) * dl / (total + 1)
                  THEN log2((tf - (cf + 1) * dl / (total + 1))
                            * (tf - (cf + 1) * dl / (total + 1))
                            / ((cf + 1) * dl / (total + 1)) + 1)
                  ELSE 0 END) AS s
       FROM dt JOIN cfm USING (term) JOIN dl USING (doc_id) CROSS JOIN tot
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_pl2_topk(spark, sf_dir):
    """PL2 top-k, corpus path (index twin Searcher.search_pl2; DFR
    BasicModelP + AfterEffectL + NormalizationH2, Amati & van
    Rijsbergen 2002 — Terrier's classic default, dropped from Lucene
    8 but still the canonical Poisson DFR). Per present term with
    λ = cf/N and tfn = tf·log2(1 + avgdl/dl) (c=1):
    (tfn·log2(tfn/λ) + (λ−tfn)·log2(e) + 0.5·log2(2π·tfn)) / (tfn+1).
    Same single-tokenize two-pass corpus shape as bm25_topk."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, total, cfs = _lm_corpus_stats(per_doc, BM25_TERMS)
    avgdl = total / n
    log2e = 1.0 / math.log(2.0)
    score, any_match = None, None
    for t in BM25_TERMS:
        if cfs[t] <= 0:
            continue
        lam = cfs[t] / n
        tf = F.col("m")[t].cast("double")
        tfn = tf * F.log2(F.lit(1.0) + F.lit(avgdl) / F.col("dl"))
        s_t = F.when(
            tf.isNotNull(),
            (
                tfn * F.log2(tfn / F.lit(lam))
                + (F.lit(lam) - tfn) * F.lit(log2e)
                + F.lit(0.5) * F.log2(F.lit(2.0 * math.pi) * tfn)
            )
            / (tfn + F.lit(1.0)),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_PL2_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
cfm AS (SELECT term, sum(tf) AS cf FROM dt
        WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum((tf * log2(1 + avgdl / dl)
                     * log2(tf * log2(1 + avgdl / dl) / (cf / n))
                   + (cf / n - tf * log2(1 + avgdl / dl)) * {1.0 / math.log(2.0)!r}
                   + 0.5 * log2(2 * {math.pi!r} * tf * log2(1 + avgdl / dl)))
                  / (tf * log2(1 + avgdl / dl) + 1)) AS s
       FROM dt JOIN cfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_dph_topk(spark, sf_dir):
    """DPH top-k, corpus path (index twin Searcher.search_dph; the
    parameter-free hypergeometric DFR model, Amati 2006 / Terrier DPH).
    Per present term with f = tf/dl:
    ((1−f)²/(tf+1)) · (tf·log2((tf·avgdl/dl)·(N/cf))
    + 0.5·log2(2π·tf·(1−f))); a tf = dl degenerate doc contributes 0
    (documented deviation from Terrier's −∞, both paths identical)."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, total, cfs = _lm_corpus_stats(per_doc, BM25_TERMS)
    avgdl = total / n
    score, any_match = None, None
    for t in BM25_TERMS:
        if cfs[t] <= 0:
            continue
        tf = F.col("m")[t].cast("double")
        dl = F.col("dl")
        fr = tf / dl
        s_t = F.when(
            tf.isNotNull() & (tf < dl),
            (F.lit(1.0) - fr)
            * (F.lit(1.0) - fr)
            / (tf + F.lit(1.0))
            * (
                tf
                * F.log2(
                    tf * F.lit(avgdl) / dl * F.lit(float(n)) / F.lit(cfs[t])
                )
                + F.lit(0.5)
                * F.log2(F.lit(2.0 * math.pi) * tf * (F.lit(1.0) - fr))
            ),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_DPH_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
cfm AS (SELECT term, sum(tf) AS cf FROM dt
        WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(CASE WHEN tf < dl THEN
                    (1 - tf / dl) * (1 - tf / dl) / (tf + 1)
                    * (tf * log2(tf * avgdl / dl * n / cf)
                       + 0.5 * log2(2 * {math.pi!r} * tf * (1 - tf / dl)))
                  ELSE 0 END) AS s
       FROM dt JOIN cfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_conv_pooling(spark, sf_dir):
    """Conversation-level embedding rollup (turn → conversation
    mean-pooling, the retrieval-unit change every RAG-over-chats
    pipeline makes): pooled vector = component-wise mean of the
    conversation's turn embeddings (conv = vec_id // 4, the chat
    derivation), reported as (conv_id, n_vecs, norm). The pooled norm is
    the coherence signal — aligned unit vectors pool to norm ≈ 1,
    incoherent ones to ≈ 1/√n. Components are 6dp-rounded BEFORE the
    norm on both engines (the label_centroids order-independence
    convention). Plan: one posexplode agg keyed by (conv, pos) + one
    conv-keyed rollup — vectors are never shuffled whole."""
    emb = _embeddings(spark, sf_dir).select(
        (F.col("vec_id") / 4).cast("long").alias("conv_id"),
        "vec_id",
        "embedding",
    )
    comp = emb.select(
        "conv_id", F.posexplode("embedding").alias("pos", "v")
    )
    pooled = (
        comp.groupBy("conv_id", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
        .groupBy("conv_id")
        .agg(F.round(F.sqrt(F.sum(F.col("c") * F.col("c"))), 6).alias("norm"))
    )
    counts = emb.groupBy("conv_id").agg(
        F.countDistinct("vec_id").cast("long").alias("n_vecs")
    )
    return (
        pooled.join(counts, "conv_id")
        .select("conv_id", "n_vecs", "norm")
        .orderBy("conv_id")
    )


O_CONV_POOLING = """
WITH e AS (SELECT (vec_id // 4)::bigint AS conv_id, vec_id, embedding
           FROM embeddings),
c AS (SELECT conv_id, pos, round(avg(v::double), 6) AS c
      FROM (SELECT conv_id, unnest(embedding) AS v,
                   generate_subscripts(embedding, 1) AS pos
            FROM e)
      GROUP BY 1, 2),
p AS (SELECT conv_id, round(sqrt(sum(c * c)), 6) AS norm FROM c GROUP BY 1),
n AS (SELECT conv_id, count(DISTINCT vec_id)::bigint AS n_vecs
      FROM e GROUP BY 1)
SELECT conv_id, n_vecs, norm FROM p JOIN n USING (conv_id)
ORDER BY conv_id
"""


def q_vsm_cosine_topk(spark, sf_dir):
    """Classic vector-space ranked retrieval, SMART lnc.ltc (Manning,
    Raghavan & Schütze IIR §6.4 — the textbook cosine scheme Lucene's
    ClassicSimilarity descends from): document vectors lnc =
    (1 + ln tf), cosine-normalized over the doc's FULL vocabulary;
    query vector ltc = (1 + ln tfq) * ln(N/df) with tfq = 1, cosine-
    normalized. Score = Σ_t w_d(t)·w_q(t). The per-doc norm is an
    aggregate HOF over the tf map from the SAME single tokenize pass as
    bm25_topk (no second scan); query weights fold in as literals. At
    index scale the norm is what Lucene materializes at write time —
    the corpus twin recomputes it in-scan."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, _avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    wq = {
        t: math.log(n / dfs[t]) for t in BM25_TERMS if dfs[t] > 0
    }
    qnorm = math.sqrt(sum(w * w for w in wq.values())) or 1.0
    norm_d = F.sqrt(
        F.aggregate(
            F.map_values("m"),
            F.lit(0.0),
            lambda acc, v: acc
            + F.pow(F.lit(1.0) + F.log(v.cast("double")), F.lit(2.0)),
        )
    )
    score, any_match = None, None
    for t, w in wq.items():
        tf = F.col("m")[t].cast("double")
        s_t = F.when(
            tf.isNotNull(),
            (F.lit(1.0) + F.log(tf)) * F.lit(w / qnorm),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
        m_t = F.col("m")[t]
        any_match = m_t if any_match is None else F.greatest(any_match, m_t)
    return (
        per_doc.filter(any_match.isNotNull())
        .withColumn("s", score / norm_d)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_VSM_COSINE_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT doc_id, sqrt(sum(pow(1 + ln(tf), 2))) AS norm_d
       FROM dt GROUP BY 1),
st AS (SELECT count(DISTINCT doc_id)::double AS n FROM dt),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
wq AS (SELECT term, ln(n / df) AS w FROM dfm CROSS JOIN st),
qn AS (SELECT sqrt(sum(w * w)) AS qnorm FROM wq),
sc AS (SELECT dt.doc_id,
              sum((1 + ln(tf)) * (w / qnorm)) AS dot
       FROM dt JOIN wq USING (term) CROSS JOIN qn
       GROUP BY dt.doc_id)
SELECT doc_id, round(dot / norm_d, 6) AS score
FROM sc JOIN nd USING (doc_id)
ORDER BY dot / norm_d DESC, doc_id ASC LIMIT {BM25_K}
"""


BM25PLUS_DELTA = 1.0
BM25L_DELTA = 0.5


def _q_bm25_lower_bounded(variant: str):
    def q(spark, sf_dir):
        per_doc = _bm25_per_doc(spark, sf_dir)
        n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
        score, any_match = None, None
        for t in BM25_TERMS:
            idf_w = math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5))
            tf = F.col("m")[t].cast("double")
            norm = F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl)
            if variant == "plus":
                body = (
                    F.lit(2.2) * tf / (F.lit(1.2) * norm + tf)
                    + F.lit(BM25PLUS_DELTA)
                )
            else:
                cp = tf / norm
                body = (
                    F.lit(2.2)
                    * (cp + F.lit(BM25L_DELTA))
                    / (F.lit(1.2) + cp + F.lit(BM25L_DELTA))
                )
            s_t = F.when(tf.isNotNull(), F.lit(idf_w) * body).otherwise(
                F.lit(0.0)
            )
            score = s_t if score is None else score + s_t
            m_t = F.col("m")[t]
            any_match = m_t if any_match is None else F.greatest(any_match, m_t)
        return (
            per_doc.filter(any_match.isNotNull())
            .withColumn("s", score)
            .orderBy(F.desc("s"), F.asc("doc_id"))
            .limit(BM25_K)
            .select("doc_id", F.round("s", 6).alias("score"))
        )

    return q


q_bm25plus_topk = _q_bm25_lower_bounded("plus")
q_bm25plus_topk.__doc__ = """BM25+ top-k, corpus path (index twin
Searcher.search_bm25_variant('plus'); Lv & Zhai CIKM 2011): per present
term idf * ((k1+1)*tf/(k1*norm + tf) + delta), delta=1 — the
lower-bounded tf normalization that stops very long docs losing to
non-occurrence. Same single-tokenize two-pass corpus shape as
bm25_topk."""
q_bm25l_topk = _q_bm25_lower_bounded("l")
q_bm25l_topk.__doc__ = """BM25L top-k, corpus path (index twin
Searcher.search_bm25_variant('l'); Lv & Zhai CIKM 2011): with
c' = tf/norm, per present term idf * (k1+1)*(c'+delta)/(k1+c'+delta),
delta=0.5. Same corpus shape as bm25_topk."""


def _o_bm25_lower_bounded(variant: str) -> str:
    if variant == "plus":
        body = f"(2.2 * tf / (1.2 * (0.25 + 0.75 * dl / avgdl) + tf) + {BM25PLUS_DELTA!r})"
    else:
        body = (
            f"(2.2 * (tf / (0.25 + 0.75 * dl / avgdl) + {BM25L_DELTA!r})"
            f" / (1.2 + tf / (0.25 + 0.75 * dl / avgdl) + {BM25L_DELTA!r}))"
        )
    return f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5)) * {body}) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


O_BM25PLUS_TOPK = _o_bm25_lower_bounded("plus")
O_BM25L_TOPK = _o_bm25_lower_bounded("l")


def q_collapse_topk(spark, sf_dir):
    """Field-collapsed BM25 top-k (Solr collapse / Lucene grouping's
    CollapsingTopDocsCollector; index twin Searcher.search_collapse): at
    most one result per conversation group (doc_id // 4, the chat
    derivation), the group head being the best-scoring doc. Scores are
    rounded to 6 dp BEFORE the group-head window so head choice is
    cross-engine deterministic."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    head = Window.partitionBy("conv_id").orderBy(
        F.desc("s"), F.asc("doc_id")
    )
    return (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .withColumn("conv_id", F.floor(F.col("doc_id") / 4))
        .withColumn("_rn", F.row_number().over(head))
        .filter(F.col("_rn") == 1)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", "conv_id", F.col("s").alias("score"))
    )


O_COLLAPSE_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
g AS (SELECT doc_id, doc_id // 4 AS conv_id, s,
             row_number() OVER (PARTITION BY doc_id // 4
                                ORDER BY s DESC, doc_id ASC) AS rn
      FROM sc)
SELECT doc_id, conv_id, s AS score FROM g WHERE rn = 1
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_collapse_inner_hits(spark, sf_dir):
    """Field collapsing WITH inner hits (ES collapse.inner_hits /
    Lucene grouping's TopGroups): the top-5 conversation groups by
    group-head BM25 score, each expanded to its up-to-3 best members
    with their rank inside the group — collapse_topk shows only heads;
    this is the variant real search UIs ship ("other messages in this
    thread"). Same 6-dp-rounded deterministic head choice; the top-5
    group table is tiny and broadcasts back onto the ranked rows."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    scored = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .withColumn("conv_id", F.floor(F.col("doc_id") / 4))
    )
    wg = Window.partitionBy("conv_id").orderBy(F.desc("s"), F.asc("doc_id"))
    ranked = scored.withColumn(
        "rank_in_group", F.row_number().over(wg)
    ).filter(F.col("rank_in_group") <= 3)
    heads = (
        ranked.filter(F.col("rank_in_group") == 1)
        .select("conv_id", F.col("s").alias("_hs"), F.col("doc_id").alias("_hd"))
        .orderBy(F.desc("_hs"), F.asc("_hd"))
        .limit(5)
    )
    return (
        ranked.join(F.broadcast(heads), "conv_id")
        .select(
            "conv_id",
            "doc_id",
            F.col("rank_in_group").cast("int").alias("rank_in_group"),
            F.col("s").alias("score"),
        )
        .orderBy("conv_id", "rank_in_group")
    )


O_COLLAPSE_INNER_HITS = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
ranked AS (SELECT doc_id, doc_id // 4 AS conv_id, s,
                  row_number() OVER (PARTITION BY doc_id // 4
                                     ORDER BY s DESC, doc_id ASC)
                    AS rank_in_group
           FROM sc QUALIFY rank_in_group <= 3),
heads AS (SELECT conv_id FROM ranked WHERE rank_in_group = 1
          ORDER BY s DESC, doc_id ASC LIMIT 5)
SELECT conv_id, doc_id, rank_in_group::int AS rank_in_group, s AS score
FROM ranked JOIN heads USING (conv_id)
ORDER BY conv_id, rank_in_group
"""


def q_search_after_page2(spark, sf_dir):
    """Cursor pagination, page 2 (Lucene IndexSearcher.searchAfter; index
    twin Searcher.search_after): results 11-20 of the BM25 ranking via
    the strictly-after-(score, doc_id) cursor taken from result 10 —
    NEVER an OFFSET rescan. The oracle states the same page as
    OFFSET 10, equivalent because the rounded (score desc, doc_id asc)
    order is total."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    scored = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .select("doc_id", "s")
    )
    page1 = scored.orderBy(F.desc("s"), F.asc("doc_id")).limit(BM25_K).collect()
    cur_s, cur_d = float(page1[-1]["s"]), int(page1[-1]["doc_id"])
    cursor = (F.col("s") < F.lit(cur_s)) | (
        (F.col("s") == F.lit(cur_s)) & (F.col("doc_id") > F.lit(cur_d))
    )
    return (
        scored.filter(cursor)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.col("s").alias("score"))
    )


O_SEARCH_AFTER_PAGE2 = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, s AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K} OFFSET {BM25_K}
"""


def q_sorted_by_field(spark, sf_dir):
    """Sort-by-field retrieval (Lucene Sort/SortField; index twin
    Searcher.search_sorted): docs matching >= 1 query term ordered by
    the stored n_chars column desc instead of relevance. One matching
    scan + TakeOrderedAndProject."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    qarr = F.array(*[F.lit(t) for t in BM25_TERMS])
    return (
        _docs(spark, sf_dir)
        .filter(F.arrays_overlap(toks, qarr))
        .select("doc_id", "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .limit(BM25_K)
    )


O_SORTED_BY_FIELD = f"""
WITH {TOKS_CTE},
m AS (SELECT DISTINCT doc_id FROM toks
      WHERE term IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}))
SELECT d.doc_id, d.n_chars
FROM documents d JOIN m USING (doc_id)
ORDER BY d.n_chars DESC, d.doc_id ASC LIMIT {BM25_K}
"""


def q_index_sorted_topk(spark, sf_dir):
    """Index-time sorting + early-terminated sort query (Lucene
    IndexWriterConfig.setIndexSort + TopFieldCollector early
    termination): the index is built sorted by (n_chars desc, doc_id),
    so docID rank == the query's sort order and Searcher.search_sorted
    takes the k SMALLEST matching docIDs straight from the query's
    postings — the stored table is read for exactly k rows via a pushed
    In(doc_id) point fetch, never joined against the matching set or
    sorted. The result carries the ORIGINAL doc_id (a stored field
    here, distinct from the sorted index's internal docID rank), so the
    oracle is the same SQL as the corpus-path sorted_by_field."""
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.index.catalog import IndexCatalog
    from nlp4l_spark.search import Searcher

    idx = _index_cache_dir(sf_dir) + "_sorted"
    if not IndexCatalog(idx).is_committed("field_stats"):
        IndexBuilder(
            sort_cols=("n_chars", "orig_id"), sort_desc=(True, False)
        ).build(
            _docs(spark, sf_dir).withColumnRenamed("doc_id", "orig_id"),
            idx,
        )
    s = Searcher(spark, idx)
    res = s.search_sorted(BM25_QUERY, "n_chars", k=BM25_K, ascending=False)
    # present the original ids (the internal docID is the sort rank)
    stored = IndexCatalog(idx).read(spark, "stored").select(
        "doc_id", F.col("orig_id")
    )
    return (
        res.join(stored, "doc_id")
        .select(F.col("orig_id").alias("doc_id"), "n_chars")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
    )


FS_HALF_LIFE = 180.0
FS_RATE = math.log(2.0) / FS_HALF_LIFE


def q_function_score_topk(spark, sf_dir):
    """FunctionScoreQuery in multiply mode, corpus path (index twin
    Searcher.search_function_score; the ES function_score exp-decay
    recipe): BM25 OR-score × exp(-ln2/half_life * age_days). The
    documents table has no timestamp, so age_days is the deterministic
    doc_id % 365 stand-in — the index twin uses the real stored ts. The
    decay must fold in BEFORE top-k (it reorders candidates); one extra
    projection on the same single-tokenize two-pass plan as bm25_topk."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    decay = F.exp(-F.lit(FS_RATE) * (F.col("doc_id") % 365).cast("double"))
    return (
        per_doc.withColumn(
            "s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs) * decay
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_FUNCTION_SCORE_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
              * exp(-{FS_RATE!r} * (dt.doc_id % 365)) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_suggest_complete(spark, sf_dir):
    """Autocomplete suggester, corpus path (index twin
    Searcher.suggest_complete — a pure term-dictionary range scan):
    top-10 analyzed-term completions of the prefix ranked by collection
    frequency desc / term asc, the Lucene suggest AnalyzingSuggester
    weight-sort shape with cf as the weight."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .select(F.explode(toks).alias("term"))
        .filter(F.col("term").startswith(SUGGEST_PREFIX))
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(10)
    )


O_SUGGEST_COMPLETE = f"""
WITH {TOKS_CTE}
SELECT term, count(*)::bigint AS cf FROM toks
WHERE term LIKE '{SUGGEST_PREFIX}%'
GROUP BY term ORDER BY cf DESC, term ASC LIMIT 10
"""


def q_suggest_next(spark, sf_dir):
    """Next-word suggester (the Lucene FreeTextSuggester shape at
    bigram order, weight = bigram count): rank the tokens that follow
    the context word in the FULL token stream (stopwords kept —
    completions like 'the' are what a real suggester must rank).
    Adjacency is a zip-with-tail over the token array — one scan, no
    positional join."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    tail = F.slice(ft, 2, F.greatest(F.size(ft) - 1, F.lit(0)))
    nxt = F.filter(
        F.zip_with(
            ft, tail, lambda a, b: F.when(a == SUGGEST_CONTEXT, b)
        ),
        lambda v: v.isNotNull(),
    )
    return (
        _docs(spark, sf_dir)
        .select(F.explode(nxt).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(10)
    )


O_SUGGEST_NEXT = f"""
WITH t AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
nx AS (SELECT unnest(list_transform(
         list_filter(range(1, len(ft)), i -> ft[i] = '{SUGGEST_CONTEXT}'),
         i -> ft[i + 1])) AS term FROM t)
SELECT term, count(*)::bigint AS cnt FROM nx
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT 10
"""


def q_multi_phrase_topk(spark, sf_dir):
    """Lucene MultiPhraseQuery top-k, corpus path (index twin
    Searcher.search_multi_phrase): slot 0 matches any of
    {MPHRASE_SLOTS[0]} and slot 1 any of {MPHRASE_SLOTS[1]} at the next
    position — tf = number of qualifying anchor positions in the FULL
    token stream (same stopword-hole contract as phrase_bm25_topk),
    idf = Σ idf over ALL member terms (MultiPhraseQuery feeds every
    term's stats to the Similarity), BM25 on the phrase tf. One
    tokenize pass; adjacency is array HOFs, df/dl stats ride the same
    single aggregation."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    at = STANDARD_ANALYZER.tokens_expr("text")
    all_terms = sorted({t for g in MPHRASE_SLOTS for t in g})
    base = _docs(spark, sf_dir).select(
        "doc_id",
        ft.alias("ft"),
        F.size(at).cast("double").alias("dl"),
        *[
            F.array_contains(at, t).cast("long").alias(f"_has_{i}")
            for i, t in enumerate(all_terms)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum(f"_has_{i}").alias(f"_df_{i}") for i in range(len(all_terms))],
    ).collect()[0]
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n
    dfs = {t: float(stats[f"_df_{i}"]) for i, t in enumerate(all_terms)}
    idf_total = sum(
        math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in all_terms
    )

    def positions(terms):
        tset = F.array(*[F.lit(t) for t in terms])
        return F.filter(
            F.transform(
                F.col("ft"),
                lambda x, i: F.when(F.array_contains(tset, x), i),
            ),
            lambda v: v.isNotNull(),
        )

    p0, p1 = positions(MPHRASE_SLOTS[0]), positions(MPHRASE_SLOTS[1])
    tf = F.size(
        F.filter(p0, lambda a: F.exists(p1, lambda b: b == a + 1))
    ).cast("double")
    score = (
        F.lit(idf_total)
        * F.col("tf")
        * F.lit(2.2)
        / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        base.withColumn("tf", tf)
        .filter(F.col("tf") > 0)
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def _o_multi_phrase() -> str:
    slot0 = ", ".join(f"'{t}'" for t in MPHRASE_SLOTS[0])
    slot1 = ", ".join(f"'{t}'" for t in MPHRASE_SLOTS[1])
    all_terms = sorted({t for g in MPHRASE_SLOTS for t in g})
    df_cols = ", ".join(
        f"(SELECT count(*) FROM t WHERE list_contains(at, '{t}')) AS df{i}"
        for i, t in enumerate(all_terms)
    )
    idf_sum = " + ".join(
        f"ln(1 + (n.n - d.df{i} + 0.5) / (d.df{i} + 0.5))"
        for i in range(len(all_terms))
    )
    return f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
base AS (SELECT doc_id,
           len(list_filter(
             list_filter(range(1, len(ft)), i -> ft[i] IN ({slot0})),
             i -> ft[i + 1] IN ({slot1})))::double AS tf,
           len(at)::double AS dl
         FROM t),
n AS (SELECT count(*)::double AS n, sum(dl) / count(*) AS avgdl FROM base),
d AS (SELECT {df_cols})
SELECT doc_id,
       round(({idf_sum})
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / n.avgdl)), 6)
           AS score
FROM base, n, d WHERE tf > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


O_MULTI_PHRASE_TOPK = _o_multi_phrase()


PPREFIX_LEAD = "merge"
PPREFIX = "s"
PPREFIX_MAX = 50


def q_phrase_prefix_topk(spark, sf_dir):
    """Elasticsearch match_phrase_prefix / Lucene MultiPhrasePrefixQuery
    top-k, corpus path (index twin Searcher.search_phrase_prefix):
    "{PPREFIX_LEAD} {PPREFIX}*" — the last slot expands to the first
    {PPREFIX_MAX} vocabulary terms with the prefix in term order (ES's
    max_expansions cap + ordering), then MultiPhraseQuery semantics: tf =
    anchor positions where the lead term is followed by ANY expansion
    member (full-token-stream adjacency, the stopword-hole contract of
    phrase_bm25_topk), idf = Σ idf over all member terms. The expansion
    job is a vocab-sized distinct (the suggest_complete shape); scoring
    is the one-tokenize multi-phrase scan with idfs folded as
    literals."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    at = STANDARD_ANALYZER.tokens_expr("text")
    exp = [
        r["t"]
        for r in (
            _docs(spark, sf_dir)
            .select(F.explode(at).alias("t"))
            .filter(F.col("t").startswith(PPREFIX))
            .distinct()
            .orderBy(F.asc("t"))
            .limit(PPREFIX_MAX)
            .collect()
        )
    ]
    if not exp:
        return spark.createDataFrame([], "doc_id long, score double")
    all_terms = sorted({PPREFIX_LEAD, *exp})
    base = _docs(spark, sf_dir).select(
        "doc_id",
        ft.alias("ft"),
        F.size(at).cast("double").alias("dl"),
        *[
            F.array_contains(at, t).cast("long").alias(f"_has_{i}")
            for i, t in enumerate(all_terms)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *[F.sum(f"_has_{i}").alias(f"_df_{i}") for i in range(len(all_terms))],
    ).collect()[0]
    n = float(stats["n"])
    avgdl = float(stats["sum_dl"]) / n
    dfs = {t: float(stats[f"_df_{i}"]) for i, t in enumerate(all_terms)}
    idf_total = sum(
        math.log(1.0 + (n - dfs[t] + 0.5) / (dfs[t] + 0.5)) for t in all_terms
    )
    eset = F.array(*[F.lit(t) for t in exp])
    p0 = F.filter(
        F.transform(
            F.col("ft"), lambda x, i: F.when(x == PPREFIX_LEAD, i)
        ),
        lambda v: v.isNotNull(),
    )
    p1 = F.filter(
        F.transform(
            F.col("ft"), lambda x, i: F.when(F.array_contains(eset, x), i)
        ),
        lambda v: v.isNotNull(),
    )
    tf = F.size(
        F.filter(p0, lambda a: F.exists(p1, lambda b: b == a + 1))
    ).cast("double")
    score = (
        F.lit(idf_total)
        * F.col("tf")
        * F.lit(2.2)
        / (F.col("tf") + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        base.withColumn("tf", tf)
        .filter(F.col("tf") > 0)
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_PHRASE_PREFIX_TOPK = f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
tk AS (SELECT doc_id, unnest(at) AS term FROM t),
exp AS (SELECT DISTINCT term FROM tk
        WHERE term LIKE '{PPREFIX}%' ORDER BY term LIMIT {PPREFIX_MAX}),
el AS (SELECT list(term ORDER BY term) AS el FROM exp),
allt AS (SELECT DISTINCT term FROM
           (SELECT '{PPREFIX_LEAD}' AS term UNION ALL SELECT term FROM exp)),
dt AS (SELECT DISTINCT doc_id, term FROM tk),
n AS (SELECT count(*)::double AS n,
             sum(len(at))::double / count(*) AS avgdl FROM t),
dfm AS (SELECT term, count(*)::double AS df
        FROM dt JOIN allt USING (term) GROUP BY 1),
it AS (SELECT sum(ln(1 + (n.n - df + 0.5) / (df + 0.5))) AS idf_total
       FROM dfm CROSS JOIN n),
base AS (SELECT t.doc_id,
           len(list_filter(range(1, len(ft)),
             i -> ft[i] = '{PPREFIX_LEAD}'
                  AND list_contains(el.el, ft[i + 1])))::double AS tf,
           len(at)::double AS dl
         FROM t CROSS JOIN el)
SELECT doc_id,
       round(it.idf_total
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / n.avgdl)), 6)
           AS score
FROM base, n, it WHERE tf > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_passage_topk(spark, sf_dir):
    """Best-passage retrieval (the UnifiedHighlighter passage-scoring
    shape): candidate passages are windows of {PASSAGE_W} tokens
    anchored at each query-term occurrence in the FULL token stream;
    a passage scores Σ idf(t) over the query-term occurrences inside
    it; a doc's best passage is the max-scoring window, earliest start
    on ties. Top-10 docs by best-passage score. Determinism: the
    anchor scores are identical FP expressions in both engines (idfs
    are repr'd literals, counts are ints, summed in fixed term order),
    so argmax/tie selection matches. Starts are 0-based token
    positions."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    at = STANDARD_ANALYZER.tokens_expr("text")
    base = _docs(spark, sf_dir).select(
        "doc_id",
        ft.alias("ft"),
        *[
            F.array_contains(at, t).cast("long").alias(f"_has_{i}")
            for i, t in enumerate(PASSAGE_TERMS)
        ],
    )
    stats = base.agg(
        F.count("*").alias("n"),
        *[F.sum(f"_has_{i}").alias(f"_df_{i}") for i in range(len(PASSAGE_TERMS))],
    ).collect()[0]
    n = float(stats["n"])
    idfs = {
        t: math.log(
            1.0
            + (n - float(stats[f"_df_{i}"]) + 0.5)
            / (float(stats[f"_df_{i}"]) + 0.5)
        )
        for i, t in enumerate(PASSAGE_TERMS)
    }

    def positions(term):
        return F.filter(
            F.transform(
                F.col("ft"), lambda x, i: F.when(x == term, i)
            ),
            lambda v: v.isNotNull(),
        )

    pos_cols = {t: positions(t).alias(f"_pos_{i}") for i, t in enumerate(PASSAGE_TERMS)}
    wdoc = base.select("doc_id", *pos_cols.values())
    anchors = F.array_sort(
        F.concat(*[F.col(f"_pos_{i}") for i in range(len(PASSAGE_TERMS))])
    )

    def window_score(a):
        s = None
        for i, t in enumerate(PASSAGE_TERMS):
            cnt = F.size(
                F.filter(
                    F.col(f"_pos_{i}"),
                    lambda p: (p >= a) & (p < a + PASSAGE_W),
                )
            ).cast("double")
            s_t = F.lit(idfs[t]) * cnt
            s = s_t if s is None else s + s_t
        return s

    # anchors ascend, so the FIRST index of the max score is the earliest
    # best window — argmax via array_position, no score recompute
    scored = (
        wdoc.withColumn("_anchors", anchors)
        .filter(F.size("_anchors") > 0)
        .withColumn("_scores", F.transform(F.col("_anchors"), window_score))
        .withColumn("_best", F.array_max("_scores"))
        .withColumn(
            "_start",
            F.element_at(
                F.col("_anchors"),
                F.array_position(F.col("_scores"), F.col("_best")).cast("int"),
            ),
        )
    )
    return (
        scored.select(
            "doc_id",
            F.col("_start").cast("long").alias("p_start"),
            F.round("_best", 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


def _o_passage_topk() -> str:
    pos_cols = ", ".join(
        f"list_filter(range(1, len(ft) + 1), i -> ft[i] = '{t}') AS pos{i}"
        for i, t in enumerate(PASSAGE_TERMS)
    )
    df_cols = ", ".join(
        f"(SELECT count(*) FROM t WHERE list_contains(at, '{t}')) AS df{i}"
        for i, t in enumerate(PASSAGE_TERMS)
    )
    score_terms = " + ".join(
        f"ln(1 + (n.n - d.df{i} + 0.5) / (d.df{i} + 0.5))"
        f" * len(list_filter(pos{i}, p -> p >= a AND p < a + {PASSAGE_W}))"
        for i in range(len(PASSAGE_TERMS))
    )
    anchor_cat = " || ".join(f"pos{i}" for i in range(len(PASSAGE_TERMS)))
    pos_names = ", ".join(f"pos{i}" for i in range(len(PASSAGE_TERMS)))
    return f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
n AS (SELECT count(*)::double AS n FROM t),
d AS (SELECT {df_cols}),
p AS (SELECT doc_id, {pos_cols} FROM t),
w AS (SELECT doc_id, list_sort({anchor_cat}) AS anchors, {pos_names} FROM p),
s AS (SELECT doc_id, anchors,
        list_transform(anchors, a -> {score_terms}) AS scores
      FROM w, n, d WHERE len(anchors) > 0),
b AS (SELECT doc_id, list_max(scores) AS best,
        anchors[list_position(scores, list_max(scores))] AS start1
      FROM s)
SELECT doc_id, (start1 - 1)::bigint AS p_start, round(best, 6) AS score
FROM b ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


O_PASSAGE_TOPK = _o_passage_topk()


def q_lang_mixture(spark, sf_dir):
    """Temperature-based language mixture reweighting (the mT5/XLM-R
    alpha-sampling recipe, alpha=0.3): per language, p = corpus share,
    q ∝ p^alpha the target sampling share, doc_weight = q/p the
    per-document sampling weight that realizes q. One groupBy over the
    corpus; the normalizers are broadcast cross-joined scalar aggregates
    over the languages-sized frame (no single-partition window)."""
    c = _docs(spark, sf_dir).groupBy("lang").agg(F.count("*").alias("n"))
    c = c.crossJoin(F.broadcast(c.agg(F.sum("n").alias("_N"))))
    c = c.withColumn("p", F.col("n") / F.col("_N")).withColumn(
        "pa", F.pow("p", LANG_ALPHA)
    )
    c = c.crossJoin(F.broadcast(c.agg(F.sum("pa").alias("_spa"))))
    q = F.col("pa") / F.col("_spa")
    return c.select(
        "lang",
        "n",
        F.round("p", 6).alias("p"),
        F.round(q, 6).alias("q"),
        F.round(q / F.col("p"), 6).alias("doc_weight"),
    ).orderBy("lang")


O_LANG_MIXTURE = f"""
WITH c AS (SELECT lang, count(*)::bigint AS n FROM documents GROUP BY 1),
x AS (SELECT lang, n,
        n / sum(n) OVER () AS p,
        pow(n / sum(n) OVER (), {LANG_ALPHA!r}) AS pa
      FROM c),
y AS (SELECT lang, n, p, pa / sum(pa) OVER () AS q FROM x)
SELECT lang, n, round(p, 6) AS p, round(q, 6) AS q,
       round(q / p, 6) AS doc_weight
FROM y ORDER BY lang
"""


# --------------------------------------------------------------------- #
