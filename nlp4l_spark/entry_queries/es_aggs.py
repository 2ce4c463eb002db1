# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    Analyzer, BM25_K, BM25_QUERY, BM25_TERMS, Corpus, F,
    LUCENE_ENGLISH_STOPWORDS, STANDARD_ANALYZER, TFIDF_FEATURES, TOKS_CTE,
    TOK_SQL, WHITESPACE_ANALYZER, WS_SQL, Window, _docs, _events, math, os,
    pd, sketches, wordcounts,
)
from nlp4l_spark.entry_queries.search import (  # noqa: F401
    SPAN_A, SPAN_B, _bm25_corpus_stats, _bm25_per_doc, _bm25_score_col,
)
from nlp4l_spark.entry_queries.chatqc import (  # noqa: F401
    CHAT_CTE, _chat_turns,
)
from nlp4l_spark.entry_queries.ja_unicode import (  # noqa: F401
    _index_cache_dir,
)
# Nonparametric source-comparison tests (extends the reference's Stats
# surface, /root/reference/app/org/nlp4l/lucene/stats/Stats.scala:27-57,
# with the rank-based siblings of q_source_ttest)
# --------------------------------------------------------------------- #
def _two_source_value_counts(spark, sf_dir):
    """(x, n1, n2) per distinct per-doc token count for the two
    lexicographically first sources, plus the source names. The
    grouped table is VALUE-COUNT sized (distinct doc lengths, not
    docs), so the single-partition rank window downstream is bounded
    by the length distribution's support — at 100 TB this is a few
    thousand rows regardless of corpus size."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir).select(
        "source", F.size(toks).cast("long").alias("x")
    )
    srcs = sorted(
        r["source"] for r in d.select("source").distinct().collect()
    )[:2]
    a, b = srcs
    g = (
        d.filter(F.col("source").isin(srcs))
        .groupBy("x")
        .agg(
            F.sum(F.when(F.col("source") == a, 1).otherwise(0))
            .cast("long")
            .alias("n1"),
            F.sum(F.when(F.col("source") == b, 1).otherwise(0))
            .cast("long")
            .alias("n2"),
        )
    )
    return g, a, b


def q_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) between the two
    lexicographically first sources on per-doc token count — the
    nonparametric twin of q_source_ttest for the skewed length
    distributions real crawls have. Ranks are midranks over the
    combined sample; z uses the tie-corrected normal approximation
    (no continuity correction, like scipy mannwhitneyu default).
    Everything up to the final two divisions is exact int64 (2*R1 is
    an integer even with midranks), so the aggregate is
    order-independent: one scan + one value-count agg + one
    support-sized window."""
    g, a, b = _two_source_value_counts(spark, sf_dir)
    nt = (F.col("n1") + F.col("n2")).alias("nt")
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, -1)
    ranked = g.select(
        "n1", "n2", nt,
        F.coalesce(
            F.sum(F.col("n1") + F.col("n2")).over(w), F.lit(0)
        ).cast("long").alias("c_less"),
    )
    row = ranked.agg(
        F.sum("n1").alias("na"),
        F.sum("n2").alias("nb"),
        # 2*R1 = sum n1*(2*c_less + nt + 1)  (midrank doubled -> int)
        F.sum(
            F.col("n1") * (2 * F.col("c_less") + F.col("nt") + 1)
        ).alias("r1_twice"),
        F.sum(
            F.col("nt") * F.col("nt") * F.col("nt") - F.col("nt")
        ).alias("ties"),
    ).collect()[0]
    na, nb = row["na"], row["nb"]
    n = na + nb
    u1 = (row["r1_twice"] - na * (na + 1)) / 2.0
    mu = na * nb / 2.0
    sigma2 = na * nb / 12.0 * ((n + 1) - row["ties"] / (n * (n - 1.0)))
    z = (u1 - mu) / math.sqrt(sigma2)
    return spark.createDataFrame(
        [(a, b, round(u1, 6), round(z, 6))],
        "source_a string, source_b string, u double, z double",
    )


def _o_two_source_counts(with_cum: str) -> str:
    return f"""
WITH d AS (SELECT source, len({TOK_SQL})::bigint AS x FROM documents),
s2 AS (SELECT source FROM d GROUP BY 1 ORDER BY source LIMIT 2),
ab AS (SELECT min(source) AS sa, max(source) AS sb FROM s2),
g AS (SELECT x,
             sum(CASE WHEN source = (SELECT sa FROM ab) THEN 1 ELSE 0 END)::bigint AS n1,
             sum(CASE WHEN source = (SELECT sb FROM ab) THEN 1 ELSE 0 END)::bigint AS n2
      FROM d JOIN s2 USING (source) GROUP BY 1),
cum AS ({with_cum})
"""


O_MANNWHITNEY_U = _o_two_source_counts(
    """SELECT n1, n2, (n1 + n2) AS nt,
       coalesce(sum(n1 + n2) OVER (ORDER BY x
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::bigint AS c_less
       FROM g"""
) + """,
s AS (SELECT sum(n1)::bigint AS na, sum(n2)::bigint AS nb,
             sum(n1 * (2 * c_less + nt + 1))::bigint AS r1_twice,
             sum(nt * nt * nt - nt)::bigint AS ties
      FROM cum)
SELECT (SELECT sa FROM ab) AS source_a, (SELECT sb FROM ab) AS source_b,
       round((r1_twice - na * (na + 1)) / 2.0, 6) AS u,
       round(((r1_twice - na * (na + 1)) / 2.0 - na * nb / 2.0)
             / sqrt(na * nb / 12.0
                    * ((na + nb + 1) - ties / ((na + nb) * (na + nb - 1.0)))),
             6) AS z
FROM s
"""


def q_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov statistic between the same two
    sources on per-doc token count: D = max |F1(x) - F2(x)| over the
    combined support, with the (smallest) location where the maximum
    is attained. The CDF difference is kept as the exact integer
    |c1*n2 - c2*n1| until the final division, so the argmax is
    FP-deterministic. Same value-count-sized plan as
    q_mannwhitney_u."""
    g, a, b = _two_source_value_counts(spark, sf_dir)
    tot = g.agg(F.sum("n1").alias("na"), F.sum("n2").alias("nb")).collect()[0]
    na, nb = tot["na"], tot["nb"]
    w = Window.orderBy("x").rowsBetween(Window.unboundedPreceding, 0)
    best = (
        g.select(
            "x",
            F.abs(
                F.sum("n1").over(w) * nb - F.sum("n2").over(w) * na
            ).cast("long").alias("dnum"),
        )
        .orderBy(F.desc("dnum"), F.asc("x"))
        .limit(1)
        .collect()[0]
    )
    return spark.createDataFrame(
        [(a, b, round(best["dnum"] / (na * nb), 6), best["x"])],
        "source_a string, source_b string, d double, at_x bigint",
    )


O_KS_TEST = _o_two_source_counts(
    """SELECT x,
       sum(n1) OVER (ORDER BY x)::bigint AS c1,
       sum(n2) OVER (ORDER BY x)::bigint AS c2
       FROM g"""
) + """,
s AS (SELECT sum(n1)::bigint AS na, sum(n2)::bigint AS nb FROM g),
dd AS (SELECT x, abs(c1 * (SELECT nb FROM s) - c2 * (SELECT na FROM s))::bigint AS dnum
       FROM cum)
SELECT (SELECT sa FROM ab) AS source_a, (SELECT sb FROM ab) AS source_b,
       round(dnum / ((SELECT na FROM s) * (SELECT nb FROM s) * 1.0), 6) AS d,
       x AS at_x
FROM dd ORDER BY dnum DESC, x ASC LIMIT 1
"""


def q_gini_token(spark, sf_dir):
    """Gini coefficient of the collection-frequency distribution — the
    one-row concentration diagnostic next to zipf_fit (a corpus whose
    token mass is owned by a handful of boilerplate terms has high
    Gini). G = (2*sum(i*cf_i) - (n+1)*sum(cf)) / (n*sum(cf)) with cf
    sorted ascending (ties broken by term, so the rank assignment is
    deterministic); both sums are exact int64, one divide at the end.
    One tokenize pass + one cf agg + one vocab-sized sort window."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    cf = (
        _docs(spark, sf_dir)
        .select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    w = Window.orderBy("cf", "term")
    row = (
        cf.select("cf", F.row_number().over(w).cast("long").alias("i"))
        .agg(
            F.count("*").alias("n"),
            F.sum("cf").alias("s"),
            F.sum(F.col("i") * F.col("cf")).alias("si"),
        )
        .collect()[0]
    )
    n, s, si = row["n"], row["s"], row["si"]
    gini = (2 * si - (n + 1) * s) / (n * s)
    return spark.createDataFrame(
        [(n, s, round(gini, 6))],
        "n_terms bigint, total_tokens bigint, gini double",
    )


O_GINI_TOKEN = f"""
WITH {TOKS_CTE},
cf AS (SELECT term, count(*)::bigint AS cf FROM toks GROUP BY 1),
r AS (SELECT cf, row_number() OVER (ORDER BY cf, term)::bigint AS i FROM cf),
s AS (SELECT count(*)::bigint AS n, sum(cf)::bigint AS s,
             sum(i * cf)::bigint AS si FROM r)
SELECT n AS n_terms, s AS total_tokens,
       round((2 * si - (n + 1) * s) / (n * s * 1.0), 6) AS gini
FROM s
"""


def q_event_moving_avg(spark, sf_dir):
    """Elasticsearch moving_fn pipeline aggregation over a
    date_histogram: calendar 7-day trailing average of the daily event
    count (missing days count as zero — RANGE frame on the day key,
    not ROWS, so gaps are handled identically at any scale). Parent
    histogram is one keyed groupBy; the window frame is DAYS-sized."""
    sec = F.col("ts").cast("timestamp").cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return (
        daily.select(
            "day",
            "cnt",
            F.round(F.sum("cnt").over(w) / 7.0, 6).alias("avg7"),
        )
        .orderBy("day")
    )


O_EVENT_MOVING_AVG = """
WITH d AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  count(*)::bigint AS cnt
           FROM events GROUP BY 1)
SELECT day, cnt,
       round(sum(cnt) OVER (ORDER BY day
               RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) / 7.0, 6) AS avg7
FROM d ORDER BY day
"""


def q_cardinality_by_source(spark, sf_dir):
    """Elasticsearch cardinality aggregation surface: distinct term
    count per source. This registry twin is EXACT (count distinct) so
    the oracle can verify it; the scale path for 100 TB is the same
    plan with approx_count_distinct (HLL++, fixed-size sketch per
    group, no distinct shuffle) — documented rather than registered
    because an approximate result can't hash-match a DuckDB oracle.
    One tokenize pass + one (source, term) dedup agg."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .select("source", F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("source")
        .agg(F.countDistinct("term").cast("long").alias("uniq_terms"))
        .orderBy("source")
    )


O_CARDINALITY_BY_SOURCE = f"""
WITH t AS (SELECT source, unnest(list_distinct({TOK_SQL})) AS term
           FROM documents)
SELECT source, count(DISTINCT term)::bigint AS uniq_terms
FROM t GROUP BY 1 ORDER BY source
"""


TOP_HITS_PER_BUCKET = 2


def q_top_hits_by_source(spark, sf_dir):
    """Elasticsearch top_hits aggregation: for the standard BM25 query,
    the top-{TOP_HITS_PER_BUCKET} scoring documents inside EVERY source
    bucket (the "best example per crawl" drill-down panel). Collection
    statistics stay whole-corpus (buckets slice the hit list, not the
    index). Same one-tokenize-pass corpus BM25 as q_bm25_topk plus a
    per-source rank window that compiles to WindowGroupLimit — O(k)
    retained per bucket, never a full per-bucket sort at scale."""
    tc = STANDARD_ANALYZER.term_counts_udf()
    per_doc = (
        _docs(spark, sf_dir)
        .select("doc_id", "source", tc(F.col("text")).alias("_tc"))
        .select(
            "doc_id",
            "source",
            F.col("_tc.dl").cast("double").alias("dl"),
            F.map_from_arrays("_tc.terms", "_tc.tfs").alias("m"),
        )
    )
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    w = Window.partitionBy("source").orderBy(F.desc("s"), F.asc("doc_id"))
    return (
        per_doc.withColumn("s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs))
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= TOP_HITS_PER_BUCKET)
        .select("source", "rank", "doc_id", F.round("s", 6).alias("score"))
        .orderBy("source", "rank")
    )


O_TOP_HITS_BY_SOURCE = f"""
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
ranked AS (SELECT d.source, sc.doc_id, sc.s,
                  row_number() OVER (PARTITION BY d.source
                                     ORDER BY sc.s DESC, sc.doc_id ASC)::bigint AS rank
           FROM sc JOIN documents d USING (doc_id))
SELECT source, rank, doc_id, round(s, 6) AS score
FROM ranked WHERE rank <= {TOP_HITS_PER_BUCKET}
ORDER BY source, rank
"""


RAKE_K = 15
RAKE_MAXLEN = 4


def q_rake_keywords(spark, sf_dir):
    """RAKE keyword extraction (Rose et al. 2010): candidate phrases are
    maximal runs of non-stopword tokens (stopwords as delimiters, so the
    STOP-KEEPING analyzer twin is used and the 33-word Lucene stop set
    drives segmentation); word score = deg(w)/freq(w) with
    deg(w) = sum of lengths of phrases containing w; phrase score = sum
    of its word scores. Complements kea_top_keyphrases / textrank with
    the third classic keyphrase extractor. Determinism: deg/freq are
    exact int64; the per-phrase sum folds word scores in phrase order on
    BOTH engines (array aggregate over a position-sorted list), and the
    final rank orders by the ROUNDED score with a phrase tiebreak. Plan:
    one tokenize pass -> doc-keyed segment window -> phrase-occurrence
    agg; word stats and distinct-phrase scoring run over phrase-sized
    frames with a broadcast word-stats join."""
    toks = WHITESPACE_ANALYZER.tokens_expr("text")
    stops = sorted(LUCENE_ENGLISH_STOPWORDS)
    t = (
        _docs(spark, sf_dir)
        .select("doc_id", F.posexplode(toks).alias("pos", "term"))
        .withColumn("is_stop", F.col("term").isin(stops))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ph = (
        t.select(
            "doc_id", "pos", "term", "is_stop",
            F.sum(F.col("is_stop").cast("int")).over(w).alias("seg"),
        )
        .filter(~F.col("is_stop"))
        .groupBy("doc_id", "seg")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "term"))).alias("pt"))
        .select(F.transform("pt", lambda x: x["term"]).alias("words"))
        .filter(F.size("words") <= RAKE_MAXLEN)
    )
    ws = (
        ph.select(F.size("words").alias("plen"), F.explode("words").alias("word"))
        .groupBy("word")
        .agg(
            F.count("*").cast("long").alias("freq"),
            F.sum("plen").cast("long").alias("deg"),
        )
    )
    dp = ph.groupBy("words").agg(F.count("*").cast("long").alias("occurrences"))
    j = dp.select(
        "words", "occurrences", F.posexplode("words").alias("wpos", "word")
    ).join(F.broadcast(ws), "word")
    scored = (
        j.groupBy("words", "occurrences")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "wpos",
                        (F.col("deg").cast("double") / F.col("freq")).alias("s"),
                    )
                )
            ).alias("ss")
        )
        .select(
            F.array_join("words", " ").alias("phrase"),
            "occurrences",
            F.round(
                F.aggregate(
                    F.transform("ss", lambda x: x["s"]),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ).alias("score"),
        )
    )
    return scored.orderBy(F.desc("score"), F.asc("phrase")).limit(RAKE_K)


_RAKE_STOPLIST = ", ".join(f"'{s}'" for s in sorted(LUCENE_ENGLISH_STOPWORDS))

O_RAKE_KEYWORDS = f"""
WITH t AS (SELECT doc_id, unnest({WS_SQL}) AS term,
                  generate_subscripts({WS_SQL}, 1) AS pos
           FROM documents),
f AS (SELECT doc_id, pos, term,
             (term IN ({_RAKE_STOPLIST})) AS is_stop FROM t),
seg AS (SELECT doc_id, pos, term, is_stop,
               sum(CASE WHEN is_stop THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY pos) AS seg
        FROM f),
ph AS (SELECT list(term ORDER BY pos) AS words
       FROM seg WHERE NOT is_stop GROUP BY doc_id, seg
       HAVING count(*) <= {RAKE_MAXLEN}),
ws AS (SELECT word, count(*)::bigint AS freq, sum(plen)::bigint AS deg
       FROM (SELECT len(words) AS plen, unnest(words) AS word FROM ph)
       GROUP BY 1),
dp AS (SELECT words, count(*)::bigint AS occurrences FROM ph GROUP BY 1),
exp AS (SELECT words, occurrences, unnest(words) AS word,
               generate_subscripts(words, 1) AS wpos
        FROM dp),
j AS (SELECT e.words, e.occurrences, e.wpos,
             ws.deg::double / ws.freq AS s
      FROM exp e JOIN ws USING (word)),
sc AS (SELECT array_to_string(words, ' ') AS phrase, occurrences,
              round(list_aggregate(list_transform(
                  list_sort(list(struct_pack(wpos := wpos, s := s))),
                  x -> x.s), 'sum'), 6) AS score
       FROM j GROUP BY words, occurrences)
SELECT phrase, occurrences, score
FROM sc ORDER BY score DESC, phrase ASC LIMIT {RAKE_K}
"""


DYM_TERMS = ("bog", "ord")  # each within 2 Damerau edits of 3 dictionary terms
DYM_PER_TERM = 3
DYM_K = 5


def q_phrase_suggest(spark, sf_dir):
    """Phrase suggester ("did you mean") over a 2-term misspelled query:
    per-term candidates are dictionary terms within 2 Damerau edits
    (transposition = 1, matching the fuzzy surface), ranked
    (edits asc, df desc, term asc) and cut to {DYM_PER_TERM} per term
    like Lucene's DirectSpellChecker; phrase candidates are the cross
    product ranked by (total edits asc, df product desc, phrase asc) —
    the ES phrase-suggester shape with an exact integer frequency score.
    Plan: the term-dictionary df agg is the only corpus work; the JVM
    lev <= 2*max_edits prefilter bounds the candidate collect (vocab
    slice, same contract as fuzzy_bm25_topk), and the cross of two
    <= {DYM_PER_TERM}-row candidate sets is driver-trivial."""
    from nlp4l_spark.search.engine import damerau_levenshtein

    toks = STANDARD_ANALYZER.tokens_expr("text")
    dfm = (
        _docs(spark, sf_dir)
        .select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
    )
    pre = F.lit(False)
    for qt in DYM_TERMS:
        pre = pre | (F.levenshtein(F.col("term"), F.lit(qt)) <= 4)
    rows = dfm.filter(pre).collect()
    cands = {}
    for qt in DYM_TERMS:
        c = []
        for r in rows:
            e = damerau_levenshtein(r["term"], qt)
            if e <= 2:
                c.append((e, -r["df"], r["term"]))
        c.sort()
        cands[qt] = [(t, e, -negdf) for (e, negdf, t) in c[:DYM_PER_TERM]]
    out = []
    for t1, e1, d1 in cands[DYM_TERMS[0]]:
        for t2, e2, d2 in cands[DYM_TERMS[1]]:
            out.append((f"{t1} {t2}", e1 + e2, d1 * d2))
    out.sort(key=lambda x: (x[1], -x[2], x[0]))
    return spark.createDataFrame(
        out[:DYM_K], "suggestion string, edits bigint, df_product bigint"
    )


O_PHRASE_SUGGEST = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({TOK_SQL})) AS term
           FROM documents),
dfm AS (SELECT term, count(*)::bigint AS df FROM t GROUP BY 1),
c1 AS (SELECT term, df, damerau_levenshtein(term, '{DYM_TERMS[0]}')::bigint AS e
       FROM dfm WHERE damerau_levenshtein(term, '{DYM_TERMS[0]}') <= 2
       ORDER BY e ASC, df DESC, term ASC LIMIT {DYM_PER_TERM}),
c2 AS (SELECT term, df, damerau_levenshtein(term, '{DYM_TERMS[1]}')::bigint AS e
       FROM dfm WHERE damerau_levenshtein(term, '{DYM_TERMS[1]}') <= 2
       ORDER BY e ASC, df DESC, term ASC LIMIT {DYM_PER_TERM}),
x AS (SELECT c1.term || ' ' || c2.term AS suggestion,
             (c1.e + c2.e)::bigint AS edits,
             (c1.df * c2.df)::bigint AS df_product
      FROM c1 CROSS JOIN c2)
SELECT suggestion, edits, df_product
FROM x ORDER BY edits ASC, df_product DESC, suggestion ASC LIMIT {DYM_K}
"""


GAUSS_SCALE = 90.0
GAUSS_DECAY = 0.5
# ES gauss decay: sigma^2 = -scale^2 / (2 ln decay)
_GAUSS_DENOM = 2.0 * (-GAUSS_SCALE * GAUSS_SCALE / (2.0 * math.log(GAUSS_DECAY)))


def q_decay_gauss_topk(spark, sf_dir):
    """FunctionScoreQuery with the ES *gauss* decay (the bell-shaped
    sibling of function_score_topk's exp decay): BM25 OR-score ×
    exp(-age² / 2σ²) with σ derived from (scale={GAUSS_SCALE},
    decay={GAUSS_DECAY}) exactly as ES computes it. Same deterministic
    doc_id % 365 age stand-in and the same single-tokenize two-pass
    plan — the decay folds in before top-k."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    age = (F.col("doc_id") % 365).cast("double")
    decay = F.exp(-(age * age) / F.lit(_GAUSS_DENOM))
    return (
        per_doc.withColumn(
            "s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs) * decay
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_DECAY_GAUSS_TOPK = f"""
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
              * exp(-((dt.doc_id % 365) * (dt.doc_id % 365))
                    / {_GAUSS_DENOM!r}) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_bucket_selector(spark, sf_dir):
    """ES bucket_selector pipeline aggregation (SQL HAVING over a parent
    terms agg): keep only sources whose mean per-doc token count exceeds
    the corpus-wide mean. Both means are exact-int sums divided once, so
    the predicate is FP-deterministic; the parent agg is one keyed
    shuffle and the corpus mean is a broadcast scalar."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir).select(
        "source", F.size(toks).cast("long").alias("dl")
    )
    tot = d.agg(F.sum("dl").alias("s"), F.count("*").alias("c")).collect()[0]
    gmean = tot["s"] / tot["c"]
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("dl").alias("_s"),
        )
        .filter(F.col("_s") / F.col("n_docs") > F.lit(gmean))
        .select(
            "source",
            "n_docs",
            F.round(F.col("_s") / F.col("n_docs"), 6).alias("mean_dl"),
        )
        .orderBy("source")
    )


O_BUCKET_SELECTOR = f"""
WITH d AS (SELECT source, len({TOK_SQL})::bigint AS dl FROM documents),
t AS (SELECT sum(dl)::double / count(*) AS gmean FROM d),
g AS (SELECT source, count(*)::bigint AS n_docs, sum(dl)::bigint AS s
      FROM d GROUP BY 1)
SELECT source, n_docs, round(s::double / n_docs, 6) AS mean_dl
FROM g CROSS JOIN t WHERE s::double / n_docs > gmean
ORDER BY source
"""


SERIAL_DIFF_LAG = 7


def q_serial_diff(spark, sf_dir):
    """ES serial_diff pipeline aggregation: lag-{SERIAL_DIFF_LAG}
    differencing of the daily event count (the deseasonalization step
    before trend fitting). Like ES, the lag is in BUCKET positions
    (ROWS), not calendar days. Same daily-histogram parent as
    event_derivative; one DAYS-sized window."""
    sec = F.col("ts").cast("timestamp").cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.orderBy("day")
    return (
        daily.select(
            "day",
            "cnt",
            (F.col("cnt") - F.lag("cnt", SERIAL_DIFF_LAG).over(w))
            .cast("long")
            .alias(f"diff{SERIAL_DIFF_LAG}"),
        )
        .orderBy("day")
    )


O_SERIAL_DIFF = f"""
WITH d AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  count(*)::bigint AS cnt
           FROM events GROUP BY 1)
SELECT day, cnt,
       (cnt - lag(cnt, {SERIAL_DIFF_LAG}) OVER (ORDER BY day))::bigint
         AS diff{SERIAL_DIFF_LAG}
FROM d ORDER BY day
"""


HIST_INTERVAL = 50


def q_value_histogram(spark, sf_dir):
    """ES histogram aggregation over events.value with a fixed interval
    of {HIST_INTERVAL}: bucket floor, count, and the bucket's value sum
    — the sum carried as exact integer cents (round-then-sum), the
    repo-wide determinism rule for double sums across groups. One keyed
    groupBy; empty buckets omitted (min_doc_count=1 semantics)."""
    b = (F.floor(F.col("value") / HIST_INTERVAL) * HIST_INTERVAL).cast("long")
    return (
        _events(spark, sf_dir)
        .select(
            b.alias("bucket"),
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
        .groupBy("bucket")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.sum("cents").alias("sum_cents"),
        )
        .orderBy("bucket")
    )


O_VALUE_HISTOGRAM = f"""
SELECT (floor(value / {HIST_INTERVAL}) * {HIST_INTERVAL})::bigint AS bucket,
       count(*)::bigint AS cnt,
       sum(round(value * 100)::bigint)::bigint AS sum_cents
FROM events GROUP BY 1 ORDER BY bucket
"""


def q_weighted_avg(spark, sf_dir):
    """ES weighted_avg aggregation: per-source mean document length in
    characters weighted by token count (long documents weigh more —
    the "mean chars per token-weighted doc" panel). Numerator and
    denominator are exact int64 sums; one division per group at the
    end, so the aggregate is order-independent."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir).select(
        "source",
        F.col("n_chars").cast("long").alias("w_val"),
        F.size(toks).cast("long").alias("w"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.sum(F.col("w_val") * F.col("w")).alias("_num"),
            F.sum("w").alias("_den"),
        )
        .select(
            "source",
            F.round(F.col("_num") / F.col("_den"), 6).alias("weighted_chars"),
        )
        .orderBy("source")
    )


O_WEIGHTED_AVG = f"""
WITH d AS (SELECT source, n_chars::bigint AS w_val,
                  len({TOK_SQL})::bigint AS w
           FROM documents)
SELECT source,
       round(sum(w_val * w)::double / sum(w), 6) AS weighted_chars
FROM d GROUP BY 1 ORDER BY source
"""


def q_block_join_topk(spark, sf_dir):
    """Lucene join module's ToParentBlockJoinQuery over the transcripts
    derivation (conversation = parent block, turns = child docs; ref
    Lucene join/ToParentBlockJoinQuery + ScoreMode, the ES has_child
    shape): child query = the standard BM25 OR over BM25_TERMS; parent
    score under ScoreMode.Max, with the Total sum and matching-child
    count carried as the explain surface, best_turn = earliest turn
    achieving the max (Lucene's collector keeps the best child per
    parent). Child scores are rounded to 6 dp BEFORE the parent fold so
    the max/argmax choice is cross-engine deterministic, and the Total
    sum folds exact integer micros (addition-order independent). Same
    one-tokenize two-pass shape as q_bm25_topk plus ONE
    groupBy(conv_id) shuffle (the max-over window reuses the same
    hash partitioning, so no second exchange)."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    matched = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .select(
            F.floor(F.col("doc_id") / 4).alias("conv_id"),
            (F.col("doc_id") % 4).cast("int").alias("turn_idx"),
            "s",
            F.round(F.col("s") * 1e6).cast("long").alias("s_micros"),
        )
    )
    w = Window.partitionBy("conv_id")
    agg = (
        matched.withColumn("smax", F.max("s").over(w))
        .groupBy("conv_id")
        .agg(
            F.max("s").alias("score_max"),
            (F.sum("s_micros") / 1e6).alias("score_total"),
            F.count("*").cast("long").alias("n_child"),
            F.min(
                F.when(F.col("s") == F.col("smax"), F.col("turn_idx"))
            ).alias("best_turn"),
        )
    )
    return (
        agg.orderBy(F.desc("score_max"), F.asc("conv_id"))
        .limit(BM25_K)
        .select(
            F.col("conv_id").cast("long").alias("conv_id"),
            "score_max",
            F.round("score_total", 6).alias("score_total"),
            "n_child",
            "best_turn",
        )
    )


O_BLOCK_JOIN_TOPK = f"""
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
ch AS (SELECT doc_id // 4 AS conv_id, (doc_id % 4)::int AS turn_idx, s,
              round(s * 1e6)::bigint AS s_micros,
              max(s) OVER (PARTITION BY doc_id // 4) AS smax
       FROM sc),
a AS (SELECT conv_id, max(s) AS score_max,
             round(sum(s_micros) / 1e6, 6) AS score_total,
             count(*)::bigint AS n_child,
             min(turn_idx) FILTER (s = smax) AS best_turn
      FROM ch GROUP BY conv_id)
SELECT conv_id::bigint AS conv_id, score_max, score_total, n_child, best_turn
FROM a ORDER BY score_max DESC, conv_id ASC LIMIT {BM25_K}
"""


SYNG_TERM = "vector"  # the user's query term
SYNG_PHRASE = ("merge", "join")  # its multi-word synonym


def q_synonym_graph_topk(spark, sf_dir):
    """Multi-word query-time synonyms (Lucene SynonymGraphFilter +
    QueryBuilder.analyzeGraphBoolean): the query term expands to a
    graph with a two-token path, and the built query is
    SHOULD(TermQuery(vector), PhraseQuery("merge join")) — score = sum
    of matching clause scores, phrase idf = Σ member idfs (PhraseQuery
    BM25), match if either path matches. ONE corpus scan computes both
    clause tfs (analyzed-term count + Arrow phrase-frequency pass) plus
    the per-term presence bits the stats agg needs; same two-pass shape
    as bm25_topk. Index paths compose from Searcher.search +
    search_phrase the same way."""
    from nlp4l_spark.search.engine import _phrase_tf_udf

    az = STANDARD_ANALYZER
    full = Analyzer(
        lowercase=az.lowercase,
        token_pattern=az.token_pattern,
        stopwords=frozenset(),
    )
    at = az.tokens_expr("text")
    base = _docs(spark, sf_dir).select(
        "doc_id",
        F.size(at).cast("double").alias("dl"),
        F.size(F.filter(at, lambda x: x == SYNG_TERM))
        .cast("double")
        .alias("tf_v"),
        _phrase_tf_udf(list(SYNG_PHRASE), full)(F.col("text"))
        .cast("double")
        .alias("tf_p"),
        F.array_contains(at, SYNG_PHRASE[0]).alias("_hm"),
        F.array_contains(at, SYNG_PHRASE[1]).alias("_hj"),
    )
    st = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        F.count_if(F.col("tf_v") > 0).alias("df_v"),
        F.count_if("_hm").alias("df_m"),
        F.count_if("_hj").alias("df_j"),
    ).collect()[0]
    n, avgdl = st["n"], st["sum_dl"] / st["n"]

    def _idf(df_):
        return math.log(1.0 + (n - df_ + 0.5) / (df_ + 0.5))

    norm = F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))
    clause_v = F.when(
        F.col("tf_v") > 0,
        F.lit(_idf(st["df_v"])) * F.col("tf_v") * F.lit(2.2)
        / (F.col("tf_v") + norm),
    ).otherwise(F.lit(0.0))
    clause_p = F.when(
        F.col("tf_p") > 0,
        F.lit(_idf(st["df_m"]) + _idf(st["df_j"]))
        * F.col("tf_p")
        * F.lit(2.2)
        / (F.col("tf_p") + norm),
    ).otherwise(F.lit(0.0))
    return (
        base.filter((F.col("tf_v") > 0) | (F.col("tf_p") > 0))
        .select("doc_id", F.round(clause_v + clause_p, 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


O_SYNONYM_GRAPH_TOPK = f"""
WITH t AS (SELECT doc_id,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS ft,
             {TOK_SQL} AS at FROM documents),
base AS (SELECT doc_id,
           len(at)::double AS dl,
           len(list_filter(at, x -> x = '{SYNG_TERM}'))::double AS tf_v,
           (CASE WHEN len(ft) >= 2 THEN len(list_filter(range(1, len(ft)),
                i -> ft[i] = '{SYNG_PHRASE[0]}'
                 AND ft[i+1] = '{SYNG_PHRASE[1]}')) ELSE 0 END)::double AS tf_p,
           list_contains(at, '{SYNG_PHRASE[0]}') AS hm,
           list_contains(at, '{SYNG_PHRASE[1]}') AS hj
         FROM t),
st AS (SELECT count(*)::double AS n,
              sum(dl) / count(*) AS avgdl,
              count(*) FILTER (tf_v > 0)::double AS dfv,
              count(*) FILTER (hm)::double AS dfm,
              count(*) FILTER (hj)::double AS dfj
       FROM base)
SELECT doc_id,
       round(
         (CASE WHEN tf_v > 0 THEN
            ln(1 + (n - dfv + 0.5) / (dfv + 0.5)) * tf_v * 2.2
            / (tf_v + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END)
         + (CASE WHEN tf_p > 0 THEN
            (ln(1 + (n - dfm + 0.5) / (dfm + 0.5))
             + ln(1 + (n - dfj + 0.5) / (dfj + 0.5))) * tf_p * 2.2
            / (tf_p + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END), 6)
           AS score
FROM base, st WHERE tf_v > 0 OR tf_p > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


CTX_BUDGET = 120


def q_truncate_context(spark, sf_dir):
    """Turn-granular context-window truncation over the transcripts
    derivation (ops/chatqc.truncate_context): per conversation, the
    longest turn SUFFIX fitting a {CTX_BUDGET}-token budget — the
    serving-time chat-history cut. One reverse-cumulative window + one
    groupBy on the same conv_id key (single shuffle)."""
    from nlp4l_spark.ops.chatqc import truncate_context

    return truncate_context(_chat_turns(spark, sf_dir), budget=CTX_BUDGET)


O_TRUNCATE_CONTEXT = rf"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx,
        len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+'))::bigint
            AS n_tokens
      FROM chat),
s AS (SELECT conv_id, turn_idx, n_tokens,
        sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
            ROWS UNBOUNDED PRECEDING) AS suffix
      FROM t)
SELECT conv_id::bigint AS conv_id, count(*)::bigint AS n_turns,
       sum(n_tokens)::bigint AS total_tokens,
       count(*) FILTER (suffix <= {CTX_BUDGET})::bigint AS kept_turns,
       coalesce(sum(n_tokens) FILTER (suffix <= {CTX_BUDGET}), 0)::bigint
           AS kept_tokens,
       min(turn_idx) FILTER (suffix <= {CTX_BUDGET})::int AS first_kept_turn
FROM s GROUP BY conv_id ORDER BY conv_id
"""


def q_pack_loss_mask(spark, sf_dir):
    """SFT packing with loss masks (ops/chatqc.pack_with_loss_mask):
    conv-atomic per-shard token streams, every turn placed at its global
    offset with loss_mask = 1 on assistant turns only — the
    train-on-assistant-tokens placement table. Turn windows and the
    conv-level shard window share keys with their aggs; two keyed
    shuffles of the turn table total."""
    from nlp4l_spark.ops.chatqc import pack_with_loss_mask

    return pack_with_loss_mask(
        _chat_turns(spark, sf_dir), seq_len=256, n_shards=8
    ).orderBy("conv_id", "turn_idx")


O_PACK_LOSS_MASK = r"""
WITH chat AS (
  SELECT doc_id // 4 AS conv_id,
         (doc_id % 4)::int AS turn_idx,
         CASE WHEN ((doc_id % 4) % 2
                    + CASE WHEN doc_id % 37 = 3 THEN 1 ELSE 0 END) % 2 = 0
              THEN 'user' ELSE 'assistant' END AS role,
         text
  FROM documents),
t AS (SELECT conv_id, turn_idx, role,
        len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+'))::bigint
            AS n_tokens
      FROM chat),
b AS (SELECT conv_id, turn_idx, role, n_tokens,
        sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx
            ROWS UNBOUNDED PRECEDING) - n_tokens AS turn_off
      FROM t),
c AS (SELECT conv_id, sum(n_tokens)::bigint AS conv_tokens,
        ('0x' || substr(md5('sft' || conv_id::varchar), 1, 8))::bigint % 8
            AS shard
      FROM t GROUP BY conv_id),
p AS (SELECT conv_id, shard,
        sum(conv_tokens) OVER (PARTITION BY shard ORDER BY conv_id
            ROWS UNBOUNDED PRECEDING) - conv_tokens AS conv_start
      FROM c)
SELECT b.conv_id::bigint AS conv_id, b.turn_idx, p.shard,
       (p.conv_start + b.turn_off)::bigint AS tok_start,
       b.n_tokens,
       (b.role = 'assistant')::int AS loss_mask,
       ((p.conv_start + b.turn_off) // 256)::bigint AS seq_first,
       (greatest(p.conv_start + b.turn_off + b.n_tokens - 1,
                 p.conv_start + b.turn_off) // 256)::bigint AS seq_last
FROM b JOIN p USING (conv_id)
ORDER BY conv_id, turn_idx
"""


IV_MAXGAPS = 3


def q_intervals_ordered(spark, sf_dir):
    """Lucene intervals module, Intervals.maxgaps({IV_MAXGAPS},
    ordered(SPAN_A, SPAN_B)) corpus twin (index path
    Searcher.search_intervals, identity-tested): MINIMAL ordered
    intervals only — for an a-position p0 the interval ends at the
    NEAREST following b-position p1 and is dropped if another a lies
    strictly inside (a later start gives a shorter interval). This is
    the Clarke/Cormack minimal-interval semantics, deliberately distinct
    from span_near's all-pairs slop count. One HOF scan over the
    tokenized stream, zero shuffle; integer position arithmetic on both
    engines."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def positions(term):
        return F.filter(
            F.transform(
                ft, lambda x, i: F.when(x == term, i).otherwise(F.lit(None))
            ),
            lambda v: v.isNotNull(),
        )

    pa, pb = positions(SPAN_A), positions(SPAN_B)

    def minimal(p0):
        nb = F.array_min(F.filter(pb, lambda x: x > p0))
        return (
            nb.isNotNull()
            & (nb - p0 - 1 <= F.lit(IV_MAXGAPS))
            & ~F.exists(pa, lambda q: (q > p0) & (q < nb))
        )

    n_iv = F.size(F.filter(pa, minimal))
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_iv.cast("long").alias("n_intervals"))
        .filter(F.col("n_intervals") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_INTERVALS_ORDERED = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_A}') AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_B}') AS pb
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb, x -> x > p0)) > 0
          AND list_min(list_filter(pb, x -> x > p0)) - p0 - 1 <= {IV_MAXGAPS}
          AND len(list_filter(pa, q -> q > p0
                AND q < list_min(list_filter(pb, x -> x > p0)))) = 0
        ))::bigint AS n_intervals
      FROM p)
SELECT doc_id, n_intervals FROM s WHERE n_intervals > 0
ORDER BY doc_id ASC LIMIT 20
"""


def q_extended_stats(spark, sf_dir):
    """Elasticsearch extended_stats aggregation per event_type: count,
    min, max, sum, avg, population variance and std deviation. All
    moments derive from EXACT integer-cents sums (value is 2-decimal by
    construction): sum(c) and sum(c^2) are order-independent int64
    folds, so the derived doubles are bit-stable across engines and
    partitionings — the date_histogram cents convention extended to
    second moments. One map-side-combined groupBy."""
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select("event_type", cents.alias("c"))
    agg = e.groupBy("event_type").agg(
        F.count("*").cast("long").alias("cnt"),
        (F.min("c").cast("double") / 100.0).alias("min_value"),
        (F.max("c").cast("double") / 100.0).alias("max_value"),
        F.sum("c").alias("_s1"),
        F.sum(F.col("c") * F.col("c")).alias("_s2"),
    )
    n = F.col("cnt").cast("double")
    mean_c = F.col("_s1").cast("double") / n
    var_c = F.col("_s2").cast("double") / n - mean_c * mean_c
    return agg.select(
        "event_type",
        "cnt",
        "min_value",
        "max_value",
        (F.col("_s1").cast("double") / 100.0).alias("sum_value"),
        F.round(mean_c / 100.0, 6).alias("avg_value"),
        F.round(var_c / 10000.0, 6).alias("variance"),
        F.round(F.sqrt(var_c) / 100.0, 6).alias("std_dev"),
    ).orderBy("event_type")


O_EXTENDED_STATS = """
WITH e AS (SELECT event_type, round(value * 100)::bigint AS c FROM events),
a AS (SELECT event_type, count(*)::bigint AS cnt,
             min(c) AS mn, max(c) AS mx,
             sum(c)::bigint AS s1, sum(c * c)::bigint AS s2
      FROM e GROUP BY 1)
SELECT event_type, cnt,
       mn::double / 100.0 AS min_value,
       mx::double / 100.0 AS max_value,
       s1::double / 100.0 AS sum_value,
       round(s1::double / cnt / 100.0, 6) AS avg_value,
       round((s2::double / cnt - (s1::double / cnt) * (s1::double / cnt))
             / 10000.0, 6) AS variance,
       round(sqrt(s2::double / cnt - (s1::double / cnt) * (s1::double / cnt))
             / 100.0, 6) AS std_dev
FROM a ORDER BY event_type
"""


def q_multi_terms(spark, sf_dir):
    """Elasticsearch multi_terms aggregation: top compound-key buckets
    over (lang, source) by doc count (the ES shape for 'terms over two
    fields without a script'), count desc with full key tiebreak. One
    hash groupBy + TakeOrdered."""
    return (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("lang"), F.asc("source"))
        .limit(10)
    )


O_MULTI_TERMS = """
SELECT lang, source, count(*)::bigint AS cnt
FROM documents GROUP BY 1, 2
ORDER BY cnt DESC, lang ASC, source ASC LIMIT 10
"""


def q_string_stats(spark, sf_dir):
    """Elasticsearch string_stats aggregation (show_distribution shape)
    over the documents lang field: count, min/max/avg length, and the
    Shannon character entropy of the concatenated field. The entropy
    sum folds per-character terms IN CHARACTER ORDER on both engines
    (array_sort + ordered aggregate here, list(... ORDER BY) fold in
    the oracle) — a hash-ordered double sum would be ulp-unstable.
    Char counts are one explode + groupBy on a ~tens-of-rows key space."""
    d = _docs(spark, sf_dir).select("lang")
    lens = d.select(F.length("lang").alias("ln")).agg(
        F.count("*").cast("long").alias("cnt"),
        F.min("ln").cast("long").alias("min_len"),
        F.max("ln").cast("long").alias("max_len"),
        F.sum("ln").cast("long").alias("_total"),
    )
    chars = (
        d.select(F.explode(F.split("lang", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("ch")
        .agg(F.count("*").cast("double").alias("c"))
    )
    folded = chars.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("ch"), F.col("c")))
        ).alias("arr"),
        F.sum("c").alias("n"),
    ).select(
        F.aggregate(
            "arr",
            F.lit(0.0),
            lambda acc, s: acc
            - (s["c"] / F.col("n")) * F.log2(s["c"] / F.col("n")),
        ).alias("entropy")
    )
    return lens.crossJoin(folded).select(
        "cnt",
        "min_len",
        "max_len",
        F.round(F.col("_total").cast("double") / F.col("cnt"), 6).alias(
            "avg_len"
        ),
        F.round("entropy", 6).alias("entropy"),
    )


O_STRING_STATS = """
WITH l AS (SELECT count(*)::bigint AS cnt,
                  min(len(lang))::bigint AS min_len,
                  max(len(lang))::bigint AS max_len,
                  sum(len(lang))::bigint AS total
           FROM documents),
ch AS (SELECT unnest(string_split(lang, '')) AS ch FROM documents),
cc AS (SELECT ch, count(*)::double AS c FROM ch WHERE ch != '' GROUP BY 1),
f AS (SELECT list(c ORDER BY ch) AS cs, sum(c) AS n FROM cc),
e AS (SELECT list_aggregate(
          list_transform(cs, c -> -(c / n) * log2(c / n)), 'sum') AS ent
      FROM f)
SELECT l.cnt, l.min_len, l.max_len,
       round(l.total::double / l.cnt, 6) AS avg_len,
       round(e.ent, 6) AS entropy
FROM l CROSS JOIN e
"""


def q_cumulative_cardinality(spark, sf_dir):
    """Elasticsearch cumulative_cardinality pipeline aggregation: per
    day, the running count of DISTINCT users seen so far (the 'total
    unique users to date' dashboard line). Distributed shape: distinct
    cardinality never recomputes per bucket — each user contributes at
    their FIRST day only (one groupBy(user) min), then a day-keyed
    count + cumulative window over the tiny day axis."""
    sec = F.col("ts").cast("timestamp").cast("long")
    first_day = (
        _events(spark, sf_dir)
        .select("user_id", F.floor(sec / 86400).cast("long").alias("day"))
        .groupBy("user_id")
        .agg(F.min("day").alias("day"))
    )
    per_day = first_day.groupBy("day").agg(
        F.count("*").cast("long").alias("new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per_day.withColumn(
            "cumulative_users", F.sum("new_users").over(w).cast("long")
        )
        .orderBy("day")
    )


O_CUMULATIVE_CARDINALITY = """
WITH fd AS (SELECT user_id,
                   min(floor(floor(epoch(ts))::bigint / 86400)::bigint) AS day
            FROM events GROUP BY 1),
pd AS (SELECT day, count(*)::bigint AS new_users FROM fd GROUP BY 1)
SELECT day, new_users,
       sum(new_users) OVER (ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint
           AS cumulative_users
FROM pd ORDER BY day
"""


def q_top_metrics(spark, sf_dir):
    """Elasticsearch top_metrics aggregation: per event_type, the value
    of the LATEST event (metric at the top of a ts sort, event_id-asc
    tiebreak for determinism). One groupBy with a struct-max — the
    argmax never shuffles raw events twice."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    top = (
        _events(spark, sf_dir)
        .select(
            "event_type",
            F.struct(
                sec.alias("s"),
                (-F.col("event_id")).alias("neg_id"),
                cents.alias("c"),
                F.col("event_id").alias("eid"),
            ).alias("t"),
        )
        .groupBy("event_type")
        .agg(F.max("t").alias("t"))
    )
    return top.select(
        "event_type",
        F.col("t.eid").cast("long").alias("event_id"),
        (F.col("t.c").cast("double") / 100.0).alias("top_value"),
    ).orderBy("event_type")


O_TOP_METRICS = """
WITH r AS (SELECT event_type, event_id,
                  round(value * 100)::bigint AS c,
                  row_number() OVER (PARTITION BY event_type
                      ORDER BY floor(epoch(ts))::bigint DESC, event_id ASC)
                      AS rn
           FROM events)
SELECT event_type, event_id::bigint AS event_id,
       c::double / 100.0 AS top_value
FROM r WHERE rn = 1 ORDER BY event_type
"""


PERC_PHRASES = [
    ("q_mj", ["merge", "join"]),
    ("q_jm", ["join", "merge"]),
    ("q_bos", ["big", "order", "scan"]),
    ("q_none", ["merge", "join", "vector", "scan"]),  # expected 0 hits
]


def q_percolate_phrase(spark, sf_dir):
    """Phrase percolation (ES percolator with match_phrase predicates,
    ops/percolate.percolate_phrase): every doc checked against a
    broadcast registry of stored PHRASE queries — term-subset prune
    first (the percolator candidate optimization), exact contiguous
    adjacency on candidates only, full-token-stream positions exactly
    like the forward PhraseQuery. Includes a reversed phrase (order
    matters), a trigram, and a never-matching phrase."""
    from nlp4l_spark.ops.percolate import percolate_phrase

    qdf = spark.createDataFrame(
        PERC_PHRASES, "query_id string, phrase array<string>"
    )
    return (
        percolate_phrase(_docs(spark, sf_dir), qdf)
        .orderBy("doc_id", "query_id")
    )


def _o_percolate_phrase() -> str:
    arms = []
    for qid, ph in PERC_PHRASES:
        n = len(ph)
        conj = " AND ".join(
            f"ft[i+{j}] = '{t}'" for j, t in enumerate(ph)
        )
        arms.append(
            f"SELECT doc_id, '{qid}' AS query_id FROM t "
            f"WHERE len(ft) >= {n} AND "
            f"len(list_filter(range(1, len(ft) - {n - 2}), i -> {conj})) > 0"
        )
    u = "\nUNION ALL\n".join(arms)
    return f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents)
{u}
ORDER BY doc_id, query_id
"""


O_PERCOLATE_PHRASE = _o_percolate_phrase()


def q_bucket_sort_page(spark, sf_dir):
    """Elasticsearch bucket_sort pipeline aggregation: re-sort the
    parent terms buckets by a METRIC (sum of exact cents), then apply
    from/size paging over the sorted buckets — distinct from terms-agg
    ordering because the sort key is a computed sub-metric and the
    paging happens after aggregation. One keyed groupBy + TakeOrdered
    with an offset."""
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        _events(spark, sf_dir)
        .select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            (F.sum("c").cast("double") / 100.0).alias("sum_value"),
        )
    )
    w = Window.orderBy(F.desc("sum_value"), F.asc("event_type"))
    return (
        agg.withColumn("_rn", F.row_number().over(w))
        .filter((F.col("_rn") > 1) & (F.col("_rn") <= 4))  # from=1, size=3
        .select("event_type", "cnt", "sum_value")
        .orderBy(F.desc("sum_value"), F.asc("event_type"))
    )


O_BUCKET_SORT_PAGE = """
WITH a AS (SELECT event_type, count(*)::bigint AS cnt,
                  sum(round(value * 100)::bigint)::double / 100.0 AS sum_value
           FROM events GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY sum_value DESC, event_type ASC)
          AS rn FROM a)
SELECT event_type, cnt, sum_value FROM r WHERE rn > 1 AND rn <= 4
ORDER BY sum_value DESC, event_type ASC
"""


def q_normalize_agg(spark, sf_dir):
    """Elasticsearch normalize pipeline aggregation (percent_of_sum):
    each event_type bucket's share of the total metric, from exact
    integer cents so the shares are order-independent. One groupBy; the
    total is a broadcast scalar over the tiny bucket table, never a
    second scan of events."""
    cents = F.round(F.col("value") * 100).cast("long")
    agg = (
        _events(spark, sf_dir)
        .select("event_type", cents.alias("c"))
        .groupBy("event_type")
        .agg(F.sum("c").alias("_s"))
    )
    w = Window.partitionBy()
    return (
        agg.withColumn("_tot", F.sum("_s").over(w))
        .select(
            "event_type",
            (F.col("_s").cast("double") / 100.0).alias("sum_value"),
            F.round(
                F.col("_s").cast("double") / F.col("_tot").cast("double"), 6
            ).alias("percent_of_sum"),
        )
        .orderBy("event_type")
    )


O_NORMALIZE_AGG = """
WITH a AS (SELECT event_type, sum(round(value * 100)::bigint)::bigint AS s
           FROM events GROUP BY 1)
SELECT event_type, s::double / 100.0 AS sum_value,
       round(s::double / (SELECT sum(s) FROM a)::double, 6) AS percent_of_sum
FROM a ORDER BY event_type
"""


SYNIDX_ANALYZER_SYNS = (("dup", "duplicate"),)


def q_synonym_index_wordcount(spark, sf_dir):
    """Index-TIME synonyms (Lucene SynonymFilter, one-way single-token
    rules at posinc 0; query-time twins are synonym_topk /
    synonym_graph_topk): whole-index term counts under an analyzer that
    injects 'duplicate' wherever 'dup' appears — cf('duplicate') gains
    exactly cf('dup'). The oracle tokenizes with the SAME analyzer's
    DuckDB expression (Analyzer.duckdb_tokens_sql emits the expansion),
    so the synonym contract itself is what's being checked. One
    tokenize + one groupBy, the wordcount_cf plan."""
    syn_az = Analyzer(
        stopwords=LUCENE_ENGLISH_STOPWORDS, synonyms=SYNIDX_ANALYZER_SYNS
    )
    c = Corpus(_docs(spark, sf_dir), "text", "doc_id", analyzer=syn_az)
    return (
        wordcounts.count_whole_index(c)
        .filter(F.col("term").isin("dup", "duplicate", "scan"))
        .orderBy("term")
    )


def _o_synonym_index_wordcount() -> str:
    syn_az = Analyzer(
        stopwords=LUCENE_ENGLISH_STOPWORDS, synonyms=SYNIDX_ANALYZER_SYNS
    )
    tok = syn_az.duckdb_tokens_sql("text")
    return f"""
WITH toks AS (SELECT doc_id, unnest({tok}) AS term FROM documents)
SELECT term, count(*)::bigint AS cf FROM toks
WHERE term IN ('dup', 'duplicate', 'scan')
GROUP BY term ORDER BY term
"""


O_SYNONYM_INDEX_WORDCOUNT = _o_synonym_index_wordcount()


CTQ_TERMS = ["dup", "scan"]  # dup df/N = 0.05 (low), scan = 0.8 (common)
CTQ_CUTOFF = 0.10  # df/N above this => common


def q_common_terms_topk(spark, sf_dir):
    """Lucene CommonTermsQuery: query terms are split by document
    frequency at maxTermFrequency={CTQ_CUTOFF} — LOW-df terms form the
    candidate-driving SHOULD clause (>= 1 must match), HIGH-df ("common",
    stopword-ish) terms never select candidates and only ADD to the BM25
    score of docs already matched by a low clause. The pre-analysis
    stopword idea done with corpus statistics at query time. Same
    two-pass one-tokenize shape as bm25_topk: the split is a driver-side
    decision on the df row, the candidate filter uses only the low
    terms' map lookups."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, CTQ_TERMS)
    low = [t for t in CTQ_TERMS if dfs[t] / n <= CTQ_CUTOFF]
    if not low:  # all terms common -> Lucene falls back to plain SHOULD
        low = CTQ_TERMS
    gate = F.col("m")[low[0]].isNotNull()
    for t in low[1:]:
        gate = gate | F.col("m")[t].isNotNull()
    score = _bm25_score_col(CTQ_TERMS, n, avgdl, dfs)
    return (
        per_doc.filter(gate)
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_COMMON_TERMS_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({CTQ_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
lowt AS (SELECT term FROM dfm CROSS JOIN st WHERE df / n <= {CTQ_CUTOFF}
         UNION ALL
         SELECT term FROM qt WHERE NOT EXISTS (
           SELECT 1 FROM dfm CROSS JOIN st WHERE df / n <= {CTQ_CUTOFF})),
cand AS (SELECT DISTINCT doc_id FROM dt JOIN lowt USING (term)),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       WHERE dt.doc_id IN (SELECT doc_id FROM cand)
       GROUP BY dt.doc_id)
SELECT doc_id, round(s, 6) AS score FROM sc
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


TSA_SHARDS, TSA_SHARD_SIZE, TSA_SIZE = 4, 3, 5


def q_terms_shard_approx(spark, sf_dir):
    """Elasticsearch terms aggregation DISTRIBUTED semantics: each shard
    returns only its local top-``shard_size`` buckets, the coordinator
    sums what it received, and every bucket carries
    ``doc_count_error_upper_bound`` = Σ over the shards that did NOT
    report the term of that shard's smallest returned count (the ES
    error-bound contract: a missing term can hide at most just below
    the shard's cutoff). Shards here are the engine-reproducible md5
    doc buckets, so both engines compute the identical approximation —
    including the deliberate under-counts that make this different from
    the exact `multi_terms` twin. Plan: one (shard, key) groupBy + a
    per-shard WindowGroupLimit; the error grid joins two coordinator-
    sized tables (≤ shards × shard_size rows)."""
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("tsa"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % TSA_SHARDS
    )
    per = (
        _docs(spark, sf_dir)
        .select(shard.alias("shard"), F.col("source").alias("key"))
        .groupBy("shard", "key")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w = Window.partitionBy("shard").orderBy(F.desc("cnt"), F.asc("key"))
    kept = per.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= TSA_SHARD_SIZE
    )
    cutoff = kept.groupBy("shard").agg(F.min("cnt").alias("cut"))
    keys = kept.select("key").distinct()
    grid = keys.crossJoin(cutoff)  # coordinator-sized: keys x shards
    merged = (
        grid.join(kept.select("shard", "key", "cnt"), ["shard", "key"], "left")
        .groupBy("key")
        .agg(
            F.sum(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias(
                "doc_count"
            ),
            F.sum(F.when(F.col("cnt").isNull(), F.col("cut")).otherwise(0))
            .cast("long")
            .alias("doc_count_error_upper_bound"),
        )
    )
    return merged.orderBy(F.desc("doc_count"), F.asc("key")).limit(TSA_SIZE)


O_TERMS_SHARD_APPROX = f"""
WITH d AS (SELECT source AS key,
             ('0x' || substr(md5('tsa' || doc_id::varchar), 1, 8))::bigint
                 % {TSA_SHARDS} AS shard
           FROM documents),
per AS (SELECT shard, key, count(*)::bigint AS cnt FROM d GROUP BY 1, 2),
kept AS (SELECT shard, key, cnt FROM (
           SELECT shard, key, cnt,
                  row_number() OVER (PARTITION BY shard
                      ORDER BY cnt DESC, key ASC) AS rn
           FROM per) WHERE rn <= {TSA_SHARD_SIZE}),
cutoff AS (SELECT shard, min(cnt) AS cut FROM kept GROUP BY 1),
keys AS (SELECT DISTINCT key FROM kept),
grid AS (SELECT k.key, c.shard, c.cut FROM keys k CROSS JOIN cutoff c),
m AS (SELECT g.key,
        sum(coalesce(kp.cnt, 0))::bigint AS doc_count,
        sum(CASE WHEN kp.cnt IS NULL THEN g.cut ELSE 0 END)::bigint
            AS doc_count_error_upper_bound
      FROM grid g LEFT JOIN kept kp ON kp.shard = g.shard AND kp.key = g.key
      GROUP BY g.key)
SELECT key, doc_count, doc_count_error_upper_bound FROM m
ORDER BY doc_count DESC, key ASC LIMIT {TSA_SIZE}
"""


XF_BOOSTS = {"title": 2.0, "body": 1.0}  # bm25f's field derivation


def q_cross_fields_topk(spark, sf_dir):
    """ES multi_match type=cross_fields over the bm25f title/body
    derivation — the 'one big field' semantics, deliberately DISTINCT
    from bm25f (per-field scores summed) and dismax (best field wins):
    per term, tf* = Σ_f boost_f·tf_f and dl* = Σ_f boost_f·dl_f, i.e.
    boosts act as field repetition weights in one virtual field; df is
    blended as docs-where-ANY-field-matches (the SynonymQuery-style
    blend cross_fields uses). One scan computes both fields' counts;
    same two-pass shape as bm25_topk."""
    title = F.array_join(
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 6), " "
    )
    at_t = STANDARD_ANALYZER.tokens_expr("title")
    at_b = STANDARD_ANALYZER.tokens_expr("body")
    bt, bb = XF_BOOSTS["title"], XF_BOOSTS["body"]
    base = (
        _docs(spark, sf_dir)
        .select("doc_id", title.alias("title"), F.col("text").alias("body"))
        .select(
            "doc_id",
            *(
                (
                    F.size(F.filter(at_t, (lambda tt: lambda x: x == tt)(t)))
                    * F.lit(bt)
                    + F.size(F.filter(at_b, (lambda tt: lambda x: x == tt)(t)))
                    * F.lit(bb)
                ).alias(f"_tf_{i}")
                for i, t in enumerate(BM25_TERMS)
            ),
            (F.size(at_t) * F.lit(bt) + F.size(at_b) * F.lit(bb)).alias("dl"),
        )
    )
    st = base.agg(
        F.count("*").alias("n"),
        F.sum("dl").alias("sum_dl"),
        *(
            F.count_if(F.col(f"_tf_{i}") > 0).alias(f"_df_{i}")
            for i in range(len(BM25_TERMS))
        ),
    ).collect()[0]
    n, avgdl = st["n"], st["sum_dl"] / st["n"]
    score = None
    for i, t in enumerate(BM25_TERMS):
        idf_w = math.log(
            1.0 + (n - st[f"_df_{i}"] + 0.5) / (st[f"_df_{i}"] + 0.5)
        )
        tf = F.col(f"_tf_{i}")
        s_t = F.when(
            tf > 0,
            F.lit(idf_w) * tf * F.lit(2.2)
            / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl))),
        ).otherwise(F.lit(0.0))
        score = s_t if score is None else score + s_t
    any_match = None
    for i in range(len(BM25_TERMS)):
        c = F.col(f"_tf_{i}") > 0
        any_match = c if any_match is None else (any_match | c)
    return (
        base.filter(any_match)
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


def _o_cross_fields() -> str:
    bt, bb = XF_BOOSTS["title"], XF_BOOSTS["body"]
    tf_cols = ", ".join(
        f"len(list_filter({{T}}, x -> x = '{t}')) * {bt!r}"
        f" + len(list_filter({{B}}, x -> x = '{t}')) * {bb!r} AS tf_{i}"
        for i, t in enumerate(BM25_TERMS)
    ).format(T="at_t", B="at_b")
    df_cols = ", ".join(
        f"count(*) FILTER (tf_{i} > 0)::double AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    score = " + ".join(
        f"(CASE WHEN tf_{i} > 0 THEN"
        f" ln(1 + (n - df_{i} + 0.5) / (df_{i} + 0.5)) * tf_{i} * 2.2"
        f" / (tf_{i} + 1.2 * (0.25 + 0.75 * dl / avgdl)) ELSE 0 END)"
        for i in range(len(BM25_TERMS))
    )
    any_m = " OR ".join(f"tf_{i} > 0" for i in range(len(BM25_TERMS)))
    tok_t = STANDARD_ANALYZER.duckdb_tokens_sql("title")
    tok_b = STANDARD_ANALYZER.duckdb_tokens_sql("body")
    return f"""
WITH d AS (SELECT doc_id,
             array_to_string(list_slice(
                 regexp_split_to_array(trim(text), '\\s+'), 1, 6), ' ')
                 AS title,
             text AS body
           FROM documents),
tk AS (SELECT doc_id, {tok_t} AS at_t, {tok_b} AS at_b FROM d),
base AS (SELECT doc_id, {tf_cols},
                len(at_t) * {bt!r} + len(at_b) * {bb!r} AS dl
         FROM tk),
st AS (SELECT count(*)::double AS n, sum(dl) / count(*) AS avgdl, {df_cols}
       FROM base)
SELECT doc_id, round({score}, 6) AS score
FROM base, st WHERE {any_m}
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


O_CROSS_FIELDS_TOPK = _o_cross_fields()


def q_topic_shifts(spark, sf_dir):
    """TextTiling-style dialogue segmentation (Hearst 1997, the
    lexical-cohesion boundary detector, simplified to the adjacent-gap
    form): per conversation, cosine-of-token-sets similarity between
    each adjacent turn pair (|A∩B| / sqrt(|A||B|), 6-dp rounded), and a
    topic boundary wherever a gap's similarity falls strictly below the
    conversation's mean gap similarity (micros-folded mean, so the
    comparison is cross-engine exact). Output: per conversation, gap
    count, boundary count, first boundary gap. One lag window + one
    groupBy + one rejoin, all on conv_id — the window's partitioning is
    reused throughout."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        _chat_turns(spark, sf_dir)
        .select("conv_id", "turn_idx", F.array_distinct(ft).alias("_tk"))
        .withColumn("_prev", F.lag("_tk").over(w))
        .filter(F.col("_prev").isNotNull())
    )
    sim = F.round(
        F.size(F.array_intersect(F.col("_tk"), F.col("_prev")))
        / F.sqrt(
            F.greatest(F.size("_tk") * F.size("_prev"), F.lit(1)).cast(
                "double"
            )
        ),
        6,
    )
    gaps = t.select(
        "conv_id", F.col("turn_idx").alias("gap"), sim.alias("_s"),
        F.round(sim * 1e6).cast("long").alias("_sm"),
    )
    stats = gaps.groupBy("conv_id").agg(
        F.count("*").alias("_n"),
        F.round(F.sum("_sm") / 1e6 / F.count("*"), 6).alias("_mean"),
    )
    flagged = gaps.join(stats, "conv_id").withColumn(
        "_b", (F.col("_s") < F.col("_mean")).cast("long")
    )
    return (
        flagged.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.sum("_b").cast("long").alias("n_boundaries"),
            F.min(F.when(F.col("_b") == 1, F.col("gap")))
            .cast("int")
            .alias("first_boundary"),
        )
        .select(
            F.col("conv_id").cast("long").alias("conv_id"),
            "n_gaps", "n_boundaries", "first_boundary",
        )
        .orderBy("conv_id")
    )


O_TOPIC_SHIFTS = f"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))
                 AS tk,
             lag(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
                 OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
      FROM chat),
g AS (SELECT conv_id, turn_idx AS gap,
             round(len(list_intersect(tk, prev))::double
                   / sqrt(greatest(len(tk) * len(prev), 1)::double), 6) AS s
      FROM t WHERE prev IS NOT NULL),
m AS (SELECT conv_id, count(*) AS n,
             round(sum(round(s * 1e6)) / 1e6 / count(*), 6) AS mean_s
      FROM g GROUP BY 1)
SELECT g.conv_id::bigint AS conv_id, count(*)::bigint AS n_gaps,
       sum(CASE WHEN g.s < m.mean_s THEN 1 ELSE 0 END)::bigint
           AS n_boundaries,
       min(CASE WHEN g.s < m.mean_s THEN g.gap END)::int AS first_boundary
FROM g JOIN m USING (conv_id)
GROUP BY 1 ORDER BY conv_id
"""


def q_heaps_growth(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve (the corpus-profile companion
    to zipf_fit): distinct-vocabulary size V(N) after the first N docs
    in docID order at geometric (power-of-two) checkpoints. Each term
    contributes at its FIRST document only (one groupBy(term) min —
    cumulative distinct without re-counting per checkpoint, the
    cumulative_cardinality trick on the term axis); the checkpoint
    cumulative is a tiny window. NB the synthetic fixture's ~30-word
    vocabulary saturates within the first couple of docs (2-4 checkpoint
    rows); the op's value shows on a real corpus where V(N) keeps
    growing — the plan shape is what's asserted here."""
    n_docs = _docs(spark, sf_dir).count()
    toks = STANDARD_ANALYZER.tokens_expr("text")
    first = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.min("doc_id").alias("d0"))
    )
    # GEOMETRIC checkpoints (1, 2, 4, ... docs): Heaps' V ~ k*N^beta is
    # a log-log line, so doubling checkpoints spread the curve; linear
    # deciles collapse onto one point on a fast-saturating vocabulary.
    # floor(log2) is engine-exact: log2 of a power of two is exact in
    # IEEE doubles, every other value sits strictly between integers.
    p = F.when(F.col("d0") == 0, F.lit(0)).otherwise(
        F.floor(F.log2(F.col("d0").cast("double"))) + 1
    )
    bucket = F.pow(F.lit(2.0), p).cast("long")
    per = first.groupBy(
        F.least(bucket, F.lit(n_docs)).cast("long").alias("n_docs")
    ).agg(F.count("*").alias("new_terms"))
    w = Window.orderBy("n_docs").rowsBetween(Window.unboundedPreceding, 0)
    return (
        per.withColumn("vocab", F.sum("new_terms").over(w).cast("long"))
        .select("n_docs", F.col("new_terms").cast("long").alias("new_terms"), "vocab")
        .orderBy("n_docs")
    )


def _o_heaps_growth() -> str:
    return f"""
WITH toks AS (SELECT doc_id, unnest(list_distinct({TOK_SQL})) AS term
              FROM documents),
f AS (SELECT term, min(doc_id) AS d0 FROM toks GROUP BY 1),
n AS (SELECT count(*) AS nd FROM documents),
per AS (SELECT least(
                 (CASE WHEN d0 = 0 THEN 1
                       ELSE pow(2, floor(log2(d0::double)) + 1) END)::bigint,
                 nd)::bigint AS n_docs,
               count(*)::bigint AS new_terms
        FROM f CROSS JOIN n GROUP BY 1)
SELECT n_docs, new_terms,
       sum(new_terms) OVER (ORDER BY n_docs
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint AS vocab
FROM per ORDER BY n_docs
"""


O_HEAPS_GROWTH = _o_heaps_growth()


RF_PIVOT, RF_BOOST = 500.0, 2.0


def q_rank_feature_topk(spark, sf_dir):
    """ES rank_feature query, saturation function: score = BM25 OR +
    boost * x / (x + pivot) over the numeric feature column (n_chars
    here — the static doc-quality signal pattern). Unlike
    function_score's multiplicative decay, rank_feature ADDS a bounded
    bonus, so unmatched-feature docs keep their text score. Folds into
    the same single-scan projection as bm25_topk — no extra pass."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    feat = _docs(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("double").alias("_x")
    )
    sat = F.lit(RF_BOOST) * F.col("_x") / (F.col("_x") + F.lit(RF_PIVOT))
    return (
        per_doc.join(feat, "doc_id")
        .withColumn("s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs) + sat)
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_RANK_FEATURE_TOPK = f"""
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
SELECT sc.doc_id,
       round(s + {RF_BOOST!r} * d.n_chars::double
                 / (d.n_chars::double + {RF_PIVOT!r}), 6) AS score
FROM sc JOIN documents d ON d.doc_id = sc.doc_id
ORDER BY score DESC, sc.doc_id ASC LIMIT {BM25_K}
"""


def q_echo_rate(spark, sf_dir):
    """Assistant echo detection (SFT QC): per conversation, the mean
    fraction of each assistant turn's distinct tokens that already
    appeared in the immediately preceding user turn — high values flag
    parrot/template responses a training pipeline downweights. One lag
    window + one conv agg on the same key (single shuffle); rates fold
    per-turn rounded so the mean is cross-engine exact."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    t = (
        _chat_turns(spark, sf_dir)
        .select(
            "conv_id", "turn_idx", "role",
            F.array_distinct(ft).alias("_tk"),
        )
        .withColumn("_prev", F.lag("_tk").over(w))
        .withColumn("_prev_role", F.lag("role").over(w))
    )
    rate = F.round(
        F.size(F.array_intersect(F.col("_tk"), F.col("_prev")))
        / F.greatest(F.size("_tk"), F.lit(1)),
        6,
    )
    a = t.filter(
        (F.col("role") == "assistant")
        & (F.col("_prev_role") == "user")
        & F.col("_prev").isNotNull()
    ).select("conv_id", rate.alias("_r"))
    return (
        a.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.round(
                F.sum(F.round(F.col("_r") * 1e6)) / 1e6 / F.count("*"), 6
            ).alias("echo_rate"),
        )
        .select(F.col("conv_id").cast("long").alias("conv_id"),
                "n_pairs", "echo_rate")
        .orderBy("conv_id")
    )


O_ECHO_RATE = f"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx, role,
             list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+'))
                 AS tk,
             lag(list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')))
                 OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev,
             lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                 AS prev_role
      FROM chat),
a AS (SELECT conv_id,
             round(len(list_intersect(tk, prev))::double
                   / greatest(len(tk), 1), 6) AS r
      FROM t
      WHERE role = 'assistant' AND prev_role = 'user' AND prev IS NOT NULL)
SELECT conv_id::bigint AS conv_id, count(*)::bigint AS n_pairs,
       round(sum(round(r * 1e6)) / 1e6 / count(*), 6) AS echo_rate
FROM a GROUP BY conv_id ORDER BY conv_id
"""


def q_has_parent_turns(spark, sf_dir):
    """ES has_parent query over the transcripts derivation: return the
    TURNS of the top-{BM25_K} conversations whose parent score
    (ScoreMode.Max over child BM25, the block_join fold) qualifies —
    each child row carries its parent's score (has_parent score mode =
    parent score propagated to every child). The top-k parent set is
    k-sized and broadcasts against the turn stream; the corpus never
    shuffles for the propagation."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    matched = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .select(F.floor(F.col("doc_id") / 4).alias("conv_id"), "s")
    )
    parents = F.broadcast(
        matched.groupBy("conv_id")
        .agg(F.max("s").alias("parent_score"))
        .orderBy(F.desc("parent_score"), F.asc("conv_id"))
        .limit(BM25_K)
    )
    turns = _docs(spark, sf_dir).select(
        F.floor(F.col("doc_id") / 4).alias("conv_id"),
        (F.col("doc_id") % 4).cast("int").alias("turn_idx"),
    )
    return (
        turns.join(parents, "conv_id")
        .select(
            F.col("conv_id").cast("long").alias("conv_id"),
            "turn_idx",
            "parent_score",
        )
        .orderBy("conv_id", "turn_idx")
    )


O_HAS_PARENT_TURNS = f"""
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
p AS (SELECT doc_id // 4 AS conv_id, max(s) AS parent_score
      FROM sc GROUP BY 1
      ORDER BY parent_score DESC, conv_id ASC LIMIT {BM25_K})
SELECT (d.doc_id // 4)::bigint AS conv_id, (d.doc_id % 4)::int AS turn_idx,
       p.parent_score
FROM documents d JOIN p ON d.doc_id // 4 = p.conv_id
ORDER BY conv_id, turn_idx
"""


def q_lucene_qs_topk(spark, sf_dir):
    """Classic query-string surface end-to-end (Searcher.search_lucene +
    search/queryparser.py): the string '+join +(merge vector) -scan'
    parses to MUST(join), MUST(bool(merge OR vector)), MUST_NOT(scan)
    and compiles onto pushed-In(term) postings frames — semantically
    identical to the nested-tree query, so the oracle is
    O_BOOLEAN_TREE_TOPK verbatim."""
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.index.catalog import IndexCatalog
    from nlp4l_spark.search import Searcher

    idx = _index_cache_dir(sf_dir)
    if not IndexCatalog(idx).is_committed("field_stats"):
        IndexBuilder(sort_cols=("doc_id",)).build(_docs(spark, sf_dir), idx)
    s = Searcher(spark, idx)
    res = s.search_lucene("+join +(merge vector) -scan", k=BM25_K)
    return res.select("doc_id", F.round("score", 6).alias("score"))


def q_index_block_join_topk(spark, sf_dir):
    """Block-join from the INDEX (Searcher.search_block_join): the
    documents index is built with sort_cols=("doc_id",), so internal
    docIDs equal the original ids and the conversation derivation
    doc_id // 4 gives the parent blocks — contiguous docID ranges,
    exactly Lucene's block-indexing contract. Child BM25 comes from the
    pushed-In(term) postings; the parent fold is one groupBy of the
    df-sized candidate set. Same oracle as the corpus twin
    block_join_topk."""
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.index.catalog import IndexCatalog
    from nlp4l_spark.search import Searcher

    idx = _index_cache_dir(sf_dir)
    if not IndexCatalog(idx).is_committed("field_stats"):
        IndexBuilder(sort_cols=("doc_id",)).build(_docs(spark, sf_dir), idx)
    s = Searcher(spark, idx)
    res = s.search_block_join(
        BM25_QUERY, k=BM25_K, parent_expr="floor(doc_id / 4)"
    )
    return res.select(
        F.col("parent").cast("long").alias("conv_id"),
        "score_max",
        "score_total",
        "n_child",
        (F.col("best_child") % 4).cast("int").alias("best_turn"),
    )


def q_has_child_topk(spark, sf_dir):
    """ES has_child query with the two knobs block_join_topk does NOT
    exercise: score_mode=avg and min_children=2 (ref ES
    HasChildQueryBuilder; Lucene join/ToParentBlockJoinQuery
    ScoreMode.Avg). Parents = conversations (doc_id // 4); a parent
    qualifies only if >= 2 children match the BM25 OR query, and its
    score is the AVERAGE of matching-child scores. Child scores are
    6dp-rounded then summed as exact micros (the rounded-selection-key
    convention) so the avg is order-independent across engines. Plan:
    one corpus scoring scan -> one conv-keyed groupBy of the matching
    subset -> TakeOrdered k."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    matched = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .select(F.floor(F.col("doc_id") / 4).alias("conv_id"), "s")
    )
    return (
        matched.groupBy("conv_id")
        .agg(
            F.count("*").cast("long").alias("n_children"),
            F.round(
                F.sum(F.round(F.col("s") * 1e6)) / 1e6 / F.count("*"), 6
            ).alias("avg_score"),
        )
        .filter(F.col("n_children") >= 2)
        .orderBy(F.desc("avg_score"), F.asc("conv_id"))
        .limit(BM25_K)
        .select(F.col("conv_id").cast("long").alias("conv_id"),
                "n_children", "avg_score")
    )


O_HAS_CHILD_TOPK = f"""
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
SELECT (doc_id // 4)::bigint AS conv_id, count(*)::bigint AS n_children,
       round(sum(round(s * 1e6)) / 1e6 / count(*), 6) AS avg_score
FROM sc GROUP BY 1 HAVING count(*) >= 2
ORDER BY avg_score DESC, conv_id ASC LIMIT {BM25_K}
"""


TERMS_SET_TERMS = ["join", "merge", "vector", "scan"]


def q_terms_set_topk(spark, sf_dir):
    """ES terms_set query (ref TermsSetQueryBuilder): the number of
    query terms a doc must match is PER-DOC — ES reads it from a field
    (minimum_should_match_field). We derive the required count
    deterministically from the doc itself: required = 2 + (doc_id % 2),
    i.e. even docs need any 2 of {TERMS_SET_TERMS}, odd docs need 3.
    Distinct from bm25_msm_topk, whose threshold is one global
    constant. Qualifying docs score BM25 over their PRESENT query
    terms; top-k by (score desc, doc_id asc). One scoring scan, no
    join."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, TERMS_SET_TERMS)
    n_matched = sum(
        F.when(F.col("m")[t].isNotNull(), 1).otherwise(0)
        for t in TERMS_SET_TERMS
    )
    required = (F.lit(2) + (F.col("doc_id") % 2)).cast("int")
    return (
        per_doc.withColumn("n_matched", n_matched)
        .filter(F.col("n_matched") >= required)
        .withColumn(
            "score",
            F.round(_bm25_score_col(TERMS_SET_TERMS, n, avgdl, dfs), 6),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.col("n_matched").cast("int").alias("n_matched"),
                "score")
    )


O_TERMS_SET_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({TERMS_SET_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id, count(*)::int AS n_matched,
              round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6)
                  AS score
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id)
SELECT doc_id, n_matched, score FROM sc
WHERE n_matched >= 2 + (doc_id % 2)
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_field_value_factor_topk(spark, sf_dir):
    """ES function_score field_value_factor (ref
    FieldValueFactorFunction, modifier=log1p): final = bm25 *
    ln(1 + factor * n_chars), factor = 0.01 — the static
    document-quality boost pattern (popularity, length priors).
    Distinct from function_score_topk (recency decay) and
    rank_feature_topk (saturation): this one multiplies. BM25 is
    6dp-rounded BEFORE the multiply on both engines. Still one scoring
    scan; n_chars rides the same row."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    chars = _docs(spark, sf_dir).select("doc_id", "n_chars")
    factor = F.log(F.lit(1.0) + F.lit(0.01) * F.col("n_chars").cast("double"))
    return (
        per_doc.join(chars, "doc_id")
        .withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .withColumn("score", F.round(F.col("s") * factor, 6))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", "score")
    )


O_FIELD_VALUE_FACTOR_TOPK = f"""
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
SELECT sc.doc_id,
       round(s * ln(1 + 0.01 * d.n_chars::double), 6) AS score
FROM sc JOIN documents d ON sc.doc_id = d.doc_id
ORDER BY score DESC, sc.doc_id ASC LIMIT {BM25_K}
"""


def q_pivot_facets(spark, sf_dir):
    """Solr pivot faceting, facet.pivot=lang,source (ref Solr
    PivotFacetProcessor): hierarchical counts — every lang bucket plus
    every nested (lang, source) sub-bucket, the drill-down tree a Solr
    UI renders. Expressed as Spark's native ROLLUP (one shuffle,
    partial-agg map-side; Catalyst expands the grouping sets), grand
    total dropped; level-1 rows carry source = NULL exactly as Solr's
    pivot response nests. Mirrored GROUP BY ROLLUP in DuckDB."""
    return (
        _docs(spark, sf_dir)
        .rollup("lang", "source")
        .agg(F.count("*").cast("long").alias("n_docs"))
        .filter(F.col("lang").isNotNull())
        .orderBy(F.asc("lang"), F.asc_nulls_first("source"))
    )


O_PIVOT_FACETS = """
SELECT lang, source, count(*)::bigint AS n_docs
FROM documents GROUP BY ROLLUP (lang, source)
HAVING lang IS NOT NULL
ORDER BY lang ASC, source ASC NULLS FIRST
"""


def _user_day_key():
    """user_id:day epoch-bucket key — the classic distinct-actives HLL
    input. Day via the retention_cohorts floor(epoch/86400) convention."""
    sec = F.col("ts").cast("timestamp").cast("long")
    return F.concat_ws(
        ":",
        F.col("user_id").cast("string"),
        F.floor(sec / 86400).cast("long").cast("string"),
    )


UD_SQL = (
    "user_id::varchar || ':' || "
    "(floor(floor(epoch(ts))::bigint / 86400))::bigint::varchar"
)


def q_hll_user_days(spark, sf_dir):
    """Distinct user-days ("daily actives") per event_type via a
    256-register HyperLogLog — the mergeable fixed-size sketch that
    replaces the exact-distinct shuffle at 100 TB (ES `cardinality` agg;
    the exact twin is cardinality_by_source). The oracle recomputes the
    SAME registers and estimator in DuckDB, so the approximation itself
    is externally verified, not just some exact answer. sf0.001 lands in
    the linear-counting branch, sf0.01 in the raw-harmonic branch — both
    correction paths get driver coverage. Plan: one groupBy whose key
    space is types x 256, map-side combinable; see ops/sketches.py."""
    ev = _events(spark, sf_dir).select("event_type", _user_day_key().alias("ud"))
    return sketches.hll_estimate(ev, F.col("ud"), ["event_type"], p=8).orderBy(
        "event_type"
    )


O_HLL_USER_DAYS = (
    sketches.hll_sql(
        "ud",
        f"(SELECT event_type, {UD_SQL} AS ud FROM events) s",
        ["event_type"],
        p=8,
    )
    + " ORDER BY event_type"
)


def q_cms_term_counts(spark, sf_dir):
    """Corpus collection-frequency point estimates for the
    {TFIDF_FEATURES} terms from a 4x1024 Count-Min sketch. The counter
    table is <= 4096 rows no matter the corpus size — the heavy-hitter
    frequency surface a 100-TB stream keeps instead of a full wordcount
    (exact twin: wordcount_cf). CMS guarantees est >= truth
    (tests/test_sketches.py asserts it); the oracle rebuilds identical
    counters in DuckDB. Plan: one tokenize scan -> one bounded groupBy
    -> broadcast probe join."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    tdf = _docs(spark, sf_dir).select(F.explode(toks).alias("term"))
    counters = sketches.cms_build(tdf, F.col("term"), depth=4, width=1024)
    return (
        sketches.cms_query(counters, TFIDF_FEATURES, depth=4, width=1024)
        .select(F.col("key").alias("term"), "est")
        .orderBy("term")
    )


O_CMS_TERM_COUNTS = f"""
WITH {TOKS_CTE},
rows_ AS (SELECT unnest(generate_series(0, 3)) AS row),
cells AS (SELECT row,
                 ('0x' || substr(md5(row::varchar || ':' || term), 1, 8))::bigint
                     % 1024 AS col,
                 count(*)::bigint AS cnt
          FROM toks CROSS JOIN rows_ GROUP BY 1, 2),
probe AS (SELECT term, row,
                 ('0x' || substr(md5(row::varchar || ':' || term), 1, 8))::bigint
                     % 1024 AS col
          FROM (SELECT unnest({TFIDF_FEATURES!r}) AS term) CROSS JOIN rows_)
SELECT term, min(coalesce(cnt, 0))::bigint AS est
FROM probe LEFT JOIN cells USING (row, col)
GROUP BY term ORDER BY term
"""


def q_kmv_event_overlap(spark, sf_dir):
    """Pairwise audience overlap between event types — KMV/theta
    sketches (k=64 minimum hashes) over the user-day sets, giving
    estimated cardinalities, intersection, and Jaccard for every type
    pair WITHOUT ever joining the raw sets (the scale path behind
    jaccard_topk / source_similarity). theta = min of the two kth
    minima; groups holding < k hashes degrade to exact. Everything
    after the bounded sketch is joins over <= types*64 rows. The oracle
    reruns the identical estimator in DuckDB."""
    ev = _events(spark, sf_dir).select("event_type", _user_day_key().alias("ud"))
    sk = sketches.kmv_sketch(ev, F.col("ud"), "event_type", k=64)
    return (
        sketches.kmv_pair_overlap(sk, k=64)
        .select(
            F.col("ga").alias("type_a"),
            F.col("gb").alias("type_b"),
            "est_card_a",
            "est_card_b",
            "est_inter",
            "jaccard_est",
        )
        .orderBy("type_a", "type_b")
    )


O_KMV_EVENT_OVERLAP = f"""
WITH ud AS (SELECT DISTINCT event_type AS g,
                   ('0x' || substr(md5({UD_SQL}), 1, 8))::bigint AS h
            FROM events),
sk AS (SELECT g, h, row_number() OVER (PARTITION BY g ORDER BY h) AS rn
       FROM ud QUALIFY rn <= 64),
st AS (SELECT g, CASE WHEN count(*) < 64 THEN 4294967296
                      ELSE max(h) END AS theta FROM sk GROUP BY g),
pairs AS (SELECT a.g AS ga, b.g AS gb, least(a.theta, b.theta) AS theta
          FROM st a, st b WHERE a.g < b.g),
sa AS (SELECT ga, gb, theta, h FROM pairs
       JOIN sk ON sk.g = pairs.ga AND sk.h < pairs.theta),
sb AS (SELECT ga, gb, h FROM pairs
       JOIN sk ON sk.g = pairs.gb AND sk.h < pairs.theta),
na AS (SELECT ga, gb, count(*)::bigint AS na FROM sa GROUP BY 1, 2),
nb AS (SELECT ga, gb, count(*)::bigint AS nb FROM sb GROUP BY 1, 2),
ni AS (SELECT sa.ga, sa.gb, count(*)::bigint AS ni FROM sa
       JOIN sb ON sa.ga = sb.ga AND sa.gb = sb.gb AND sa.h = sb.h
       GROUP BY 1, 2)
SELECT pairs.ga AS type_a, pairs.gb AS type_b,
       round(na * (4294967296.0 / theta::double), 4) AS est_card_a,
       round(nb * (4294967296.0 / theta::double), 4) AS est_card_b,
       round(coalesce(ni, 0) * (4294967296.0 / theta::double), 4) AS est_inter,
       round(coalesce(ni, 0)::double
             / greatest(na + nb - coalesce(ni, 0), 1), 6) AS jaccard_est
FROM pairs JOIN na USING (ga, gb) JOIN nb USING (ga, gb)
LEFT JOIN ni USING (ga, gb)
ORDER BY type_a, type_b
"""


def q_bloom_semijoin(spark, sf_dir):
    """Runtime-filtered semi-join (the Bloom prefilter Spark's own
    InjectRuntimeFilter builds internally, here from public primitives
    — ops/sketches.py::bloom_build/bloom_might_contain): revenue and
    order count per priority for customers with acctbal > 9000. The
    dim-side keys (~10% of customers) build a fixed 2^14-bit Bloom
    bitset; the probe is a pure-JVM bit test INSIDE the orders scan's
    codegen stage, so non-matching fact rows die before any exchange;
    survivors are verified exactly with a broadcast semi-join (Bloom
    admits false positives, never negatives — tests/test_sketches.py).
    Result is therefore exact; the oracle is the plain join. At 10^12
    rows the bitset is still 2 KB·8 and the fact shuffle is ∝ matches,
    not corpus."""
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    keys = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    m, k = 1 << 14, 4
    words = sketches.bloom_build(keys, "c_custkey", num_bits=m, num_hashes=k)
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    pre = orders.filter(
        sketches.bloom_might_contain(F.col("o_custkey"), words, m, k)
    )
    return (
        pre.join(
            F.broadcast(keys),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_c"
            ),
        )
        .orderBy("o_orderpriority")
    )


O_BLOOM_SEMIJOIN = """
SELECT o_orderpriority, count(*)::bigint AS n_orders,
       sum(round(o_totalprice * 100)::bigint) AS revenue_c
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_acctbal > 9000
GROUP BY 1 ORDER BY 1
"""


DS_LANG = "en"
DS_SOURCE = "src3"


def q_drill_sideways(spark, sf_dir):
    """Lucene DrillSideways (facet/DrillSideways.java): with drill-down
    selections lang={DS_LANG} AND source={DS_SOURCE} on a base match-any
    query, each dimension's facet counts are computed with the OTHER
    dimension's filter applied but its own relaxed — the "what would I
    get if I un-picked this" counts a faceted UI needs. Rows: dim='lang'
    facets (source filter on), dim='source' facets (lang filter on),
    dim='hits' (both on). ONE corpus scan: each doc conditionally emits
    its applicable (dim, value) contributions into an exploded array —
    no per-dimension re-scan — then one (dim, value) groupBy."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    base = _docs(spark, sf_dir).select(
        "lang", "source", toks.alias("at")
    ).filter(
        F.arrays_overlap(
            "at", F.array(*[F.lit(t) for t in BM25_TERMS])
        )
    )
    contrib = F.filter(
        F.array(
            F.when(
                F.col("source") == DS_SOURCE,
                F.struct(F.lit("lang").alias("dim"), F.col("lang").alias("value")),
            ),
            F.when(
                F.col("lang") == DS_LANG,
                F.struct(F.lit("source").alias("dim"), F.col("source").alias("value")),
            ),
            F.when(
                (F.col("lang") == DS_LANG) & (F.col("source") == DS_SOURCE),
                F.struct(F.lit("hits").alias("dim"), F.lit("*").alias("value")),
            ),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        base.select(F.explode(contrib).alias("c"))
        .groupBy(F.col("c.dim").alias("dim"), F.col("c.value").alias("value"))
        .agg(F.count("*").cast("long").alias("n_docs"))
        .orderBy("dim", "value")
    )


O_DRILL_SIDEWAYS = f"""
WITH base AS (
  SELECT lang, source FROM documents
  WHERE len(list_intersect(list_distinct({TOK_SQL}),
            {BM25_TERMS!r})) > 0),
u AS (
  SELECT 'lang' AS dim, lang AS value FROM base WHERE source = '{DS_SOURCE}'
  UNION ALL
  SELECT 'source' AS dim, source AS value FROM base WHERE lang = '{DS_LANG}'
  UNION ALL
  SELECT 'hits' AS dim, '*' AS value FROM base
  WHERE lang = '{DS_LANG}' AND source = '{DS_SOURCE}')
SELECT dim, value, count(*)::bigint AS n_docs
FROM u GROUP BY dim, value ORDER BY dim, value
"""


def q_adjacency_matrix(spark, sf_dir):
    """ES adjacency_matrix aggregation (AdjacencyMatrixAggregator):
    named filters = presence of each {BM25_TERMS} term; buckets for
    every filter and every pairwise intersection ('a&b' keys), empty
    buckets omitted exactly as ES does. One scan computing the three
    presence flags, one scalar agg, then an in-plan unpivot — no join,
    no second pass."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    a, b, c = BM25_TERMS
    d = _docs(spark, sf_dir).select(
        *[
            F.array_contains(toks, t).cast("int").alias(f"f{i}")
            for i, t in enumerate(BM25_TERMS)
        ]
    )
    agg = d.agg(
        F.sum("f0").alias("na"),
        F.sum("f1").alias("nb"),
        F.sum("f2").alias("nc"),
        F.sum(F.col("f0") * F.col("f1")).alias("nab"),
        F.sum(F.col("f0") * F.col("f2")).alias("nac"),
        F.sum(F.col("f1") * F.col("f2")).alias("nbc"),
    )
    pairs = [
        (a, "na"), (b, "nb"), (c, "nc"),
        (f"{a}&{b}", "nab"), (f"{a}&{c}", "nac"), (f"{b}&{c}", "nbc"),
    ]
    buckets = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(key).alias("key"),
                    F.col(col).cast("long").alias("doc_count"),
                )
                for key, col in pairs
            ]
        )
    )
    return (
        agg.select(buckets.alias("x"))
        .select("x.key", "x.doc_count")
        .filter(F.col("doc_count") > 0)
        .orderBy("key")
    )


O_ADJACENCY_MATRIX = f"""
WITH d AS (SELECT list_contains(list_distinct({TOK_SQL}), '{BM25_TERMS[0]}')::int AS f0,
                  list_contains(list_distinct({TOK_SQL}), '{BM25_TERMS[1]}')::int AS f1,
                  list_contains(list_distinct({TOK_SQL}), '{BM25_TERMS[2]}')::int AS f2
           FROM documents),
s AS (SELECT sum(f0) AS na, sum(f1) AS nb, sum(f2) AS nc,
             sum(f0 * f1) AS nab, sum(f0 * f2) AS nac, sum(f1 * f2) AS nbc
      FROM d),
u AS (SELECT '{BM25_TERMS[0]}' AS key, na AS doc_count FROM s
      UNION ALL SELECT '{BM25_TERMS[1]}', nb FROM s
      UNION ALL SELECT '{BM25_TERMS[2]}', nc FROM s
      UNION ALL SELECT '{BM25_TERMS[0]}&{BM25_TERMS[1]}', nab FROM s
      UNION ALL SELECT '{BM25_TERMS[0]}&{BM25_TERMS[2]}', nac FROM s
      UNION ALL SELECT '{BM25_TERMS[1]}&{BM25_TERMS[2]}', nbc FROM s)
SELECT key, doc_count::bigint AS doc_count FROM u
WHERE doc_count > 0 ORDER BY key
"""


AUTO_HIST_TARGET = 20
AUTO_HIST_LADDER = [
    1, 5, 10, 30, 60, 300, 600, 1800, 3600, 10800, 43200,
    86400, 604800, 2592000, 7776000, 31536000,
]


def q_auto_date_histogram(spark, sf_dir):
    """ES auto_date_histogram (AutoDateHistogramAggregationBuilder):
    the engine, not the caller, picks the interval — the smallest rung
    on a fixed ladder such that the bucket count stays <= {AUTO_HIST_TARGET}.
    The interval choice is a driver decision on the min/max stats row
    (the common_terms df-split convention: a bounded 1-row collect);
    the data pass is then one keyed groupBy on the derived epoch
    bucket. Oracle mirrors the ladder as a CASE chain."""
    sec = F.col("ts").cast("timestamp").cast("long")
    ev = _events(spark, sf_dir).select(sec.alias("sec"))
    row = ev.agg(F.min("sec").alias("mn"), F.max("sec").alias("mx")).collect()[0]
    span = row["mx"] - row["mn"]
    iv = next(
        (i for i in AUTO_HIST_LADDER if span // i <= AUTO_HIST_TARGET - 1),
        AUTO_HIST_LADDER[-1],
    )
    return (
        ev.groupBy((F.floor(F.col("sec") / iv) * iv).cast("long").alias("bucket_start"))
        .agg(F.count("*").cast("long").alias("cnt"))
        .withColumn("interval_s", F.lit(iv).cast("long"))
        .orderBy("bucket_start")
    )


def _auto_hist_case() -> str:
    legs = " ".join(
        f"WHEN (mx - mn) // {i} <= {AUTO_HIST_TARGET - 1} THEN {i}"
        for i in AUTO_HIST_LADDER
    )
    return f"CASE {legs} ELSE {AUTO_HIST_LADDER[-1]} END"


O_AUTO_DATE_HISTOGRAM = f"""
WITH b AS (SELECT min(floor(epoch(ts))::bigint) AS mn,
                  max(floor(epoch(ts))::bigint) AS mx FROM events),
iv AS (SELECT {_auto_hist_case()} AS ivl FROM b)
SELECT (floor(epoch(ts))::bigint // ivl) * ivl AS bucket_start,
       count(*)::bigint AS cnt, ivl::bigint AS interval_s
FROM events, iv GROUP BY 1, 3 ORDER BY 1
"""


def q_dataset_split(spark, sf_dir):
    """Deterministic train/val/test split — the reproducible-pipeline
    primitive behind every training-data run: split membership is a
    pure function of the stable doc_id (md5 bucket mod 100: <10 test,
    <20 val, else train), so re-runs, backfills, and different cluster
    sizes all agree with no shuffled state. Per-split counts + exact
    char budget + source coverage; one scan, one 3-key groupBy."""
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    bucket = h % 100
    split = (
        F.when(bucket < 10, "test").when(bucket < 20, "val").otherwise("train")
    )
    return (
        _docs(spark, sf_dir)
        .select(split.alias("split"), "n_chars", "source")
        .groupBy("split")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.countDistinct("source").cast("long").alias("n_sources"),
        )
        .orderBy("split")
    )


O_DATASET_SPLIT = """
WITH d AS (SELECT CASE
             WHEN ('0x' || substr(md5('split:' || doc_id::varchar), 1, 8))::bigint % 100 < 10 THEN 'test'
             WHEN ('0x' || substr(md5('split:' || doc_id::varchar), 1, 8))::bigint % 100 < 20 THEN 'val'
             ELSE 'train' END AS split,
           n_chars, source FROM documents)
SELECT split, count(*)::bigint AS n_docs,
       sum(n_chars)::bigint AS total_chars,
       count(DISTINCT source)::bigint AS n_sources
FROM d GROUP BY split ORDER BY split
"""


def q_simple_qs_topk(spark, sf_dir):
    """ES simple_query_string end-to-end (Searcher.search_simple +
    queryparser.parse_simple): 'join + merge | vect* -scan' parses to
    MUST(join), MUST(merge), SHOULD(prefix vect*), MUST_NOT(scan) under
    the lenient grammar (`+` AND both neighbors, `|` OR, `-` negate,
    trailing-* prefix). Compiles to pushed-In(term) postings frames;
    the prefix leaf rewrites against the vocab-sized dictionary to a
    constant-score (1.0) left-join bonus — Lucene's multi-term
    constant-score rewrite. Oracle recomputes BM25 + bonus in SQL."""
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.index.catalog import IndexCatalog
    from nlp4l_spark.search import Searcher

    idx = _index_cache_dir(sf_dir)
    if not IndexCatalog(idx).is_committed("field_stats"):
        IndexBuilder(sort_cols=("doc_id",)).build(_docs(spark, sf_dir), idx)
    s = Searcher(spark, idx)
    res = s.search_simple("join + merge | vect* -scan", k=BM25_K)
    return res.select("doc_id", F.round("score", 6).alias("score"))


O_SIMPLE_QS_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest(['join', 'merge']) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st),
musts AS (SELECT doc_id, sum(s) AS s FROM sc GROUP BY 1 HAVING count(*) = 2),
pfx AS (SELECT DISTINCT doc_id FROM dt WHERE term LIKE 'vect%'),
nots AS (SELECT DISTINCT doc_id FROM dt WHERE term = 'scan')
SELECT m.doc_id,
       round(m.s + CASE WHEN p.doc_id IS NOT NULL THEN 1.0 ELSE 0.0 END, 6)
           AS score
FROM musts m LEFT JOIN pfx p USING (doc_id)
WHERE m.doc_id NOT IN (SELECT doc_id FROM nots)
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


SAMPLER_SHARD_SIZE = 100
SAMPLER_MAX_PER_SOURCE = 5
SAMPLER_SUB_K = 10


def q_diversified_sampler(spark, sf_dir):
    """ES diversified_sampler aggregation (DiversifiedAggregationBuilder):
    sub-aggregations run on a score-ordered SAMPLE of the hit stream,
    capped at max_docs_per_value per diversity field (source) so one
    crawl can't dominate the sample — here the top-{SAMPLER_SHARD_SIZE}
    BM25 hits with <= {SAMPLER_MAX_PER_SOURCE} docs per source, then a
    terms sub-agg (top-{SAMPLER_SUB_K} terms by sample doc_count).
    Scores are 6dp-rounded BEFORE selection (the rounded-selection-key
    convention) with doc_id tiebreaks, so the sample set is identical
    across engines. Plan: one scoring scan -> per-source rank window
    (WindowGroupLimit) -> global top-k -> term counts of the bounded
    sample only."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    src = _docs(spark, sf_dir).select("doc_id", "source")
    scored = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .join(src, "doc_id")
    )
    w = Window.partitionBy("source").orderBy(F.desc("s"), F.asc("doc_id"))
    sample = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= SAMPLER_MAX_PER_SOURCE)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(SAMPLER_SHARD_SIZE)
    )
    return (
        sample.select("doc_id", F.explode(F.map_keys("m")).alias("term"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("doc_count"))
        .orderBy(F.desc("doc_count"), F.asc("term"))
        .limit(SAMPLER_SUB_K)
    )


O_DIVERSIFIED_SAMPLER = f"""
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
ranked AS (SELECT sc.doc_id, s,
                  row_number() OVER (PARTITION BY d.source
                                     ORDER BY s DESC, sc.doc_id ASC) AS rn
           FROM sc JOIN documents d ON sc.doc_id = d.doc_id),
sample AS (SELECT doc_id FROM ranked WHERE rn <= {SAMPLER_MAX_PER_SOURCE}
           ORDER BY s DESC, doc_id ASC LIMIT {SAMPLER_SHARD_SIZE})
SELECT term, count(DISTINCT doc_id)::bigint AS doc_count
FROM toks JOIN sample USING (doc_id)
GROUP BY term ORDER BY doc_count DESC, term ASC LIMIT {SAMPLER_SUB_K}
"""


def q_filters_agg(spark, sf_dir):
    """ES `filters` aggregation with other_bucket=true
    (FiltersAggregator): named overlapping buckets — 'short'
    (n_chars < 200), 'english' (lang=en), 'cjk' (lang=zh) — where a doc
    counts in EVERY filter it matches, plus the '_other_' bucket for
    docs matching none, exactly ES's other_bucket_key contract. One
    scan computing the flags, one scalar agg, in-plan unpivot (the
    adjacency_matrix shape)."""
    d = _docs(spark, sf_dir).select(
        (F.col("n_chars") < 200).cast("int").alias("f_short"),
        (F.col("lang") == "en").cast("int").alias("f_en"),
        (F.col("lang") == "zh").cast("int").alias("f_zh"),
    )
    agg = d.agg(
        F.sum("f_short").alias("n_short"),
        F.sum("f_en").alias("n_en"),
        F.sum("f_zh").alias("n_zh"),
        F.sum(
            (
                (F.col("f_short") + F.col("f_en") + F.col("f_zh")) == 0
            ).cast("int")
        ).alias("n_other"),
    )
    buckets = F.explode(
        F.array(
            *[
                F.struct(F.lit(key).alias("key"), F.col(c).cast("long").alias("doc_count"))
                for key, c in [
                    ("short", "n_short"), ("english", "n_en"),
                    ("cjk", "n_zh"), ("_other_", "n_other"),
                ]
            ]
        )
    )
    return (
        agg.select(buckets.alias("x")).select("x.key", "x.doc_count").orderBy("key")
    )


O_FILTERS_AGG = """
WITH d AS (SELECT (n_chars < 200)::int AS f_short,
                  (lang = 'en')::int AS f_en,
                  (lang = 'zh')::int AS f_zh FROM documents),
s AS (SELECT sum(f_short) AS n_short, sum(f_en) AS n_en, sum(f_zh) AS n_zh,
             sum((f_short + f_en + f_zh = 0)::int) AS n_other FROM d),
u AS (SELECT 'short' AS key, n_short AS doc_count FROM s
      UNION ALL SELECT 'english', n_en FROM s
      UNION ALL SELECT 'cjk', n_zh FROM s
      UNION ALL SELECT '_other_', n_other FROM s)
SELECT key, doc_count::bigint AS doc_count FROM u ORDER BY key
"""


def q_bucket_script(spark, sf_dir):
    """ES bucket_script pipeline aggregation
    (BucketScriptPipelineAggregationBuilder): a per-bucket metric
    computed FROM sibling metrics — the canonical error-rate dashboard:
    day buckets with total events, error events, and
    rate = errors/total. Distinct from bucket_selector (filters
    buckets) and bucket_sort (pages them): this one adds a derived
    metric column. One keyed groupBy; the script is a projection over
    the bucket-sized table."""
    sec = F.col("ts").cast("timestamp").cast("long")
    return (
        _events(spark, sf_dir)
        .select(
            F.floor(sec / 86400).cast("long").alias("day"),
            (F.col("event_type") == "error").cast("int").alias("is_err"),
        )
        .groupBy("day")
        .agg(
            F.count("*").cast("long").alias("n_total"),
            F.sum("is_err").cast("long").alias("n_error"),
        )
        .withColumn(
            "error_rate",
            F.round(F.col("n_error").cast("double") / F.col("n_total"), 6),
        )
        .orderBy("day")
    )


O_BUCKET_SCRIPT = """
SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
       count(*)::bigint AS n_total,
       sum((event_type = 'error')::int)::bigint AS n_error,
       round(sum((event_type = 'error')::int)::double / count(*), 6)
           AS error_rate
FROM events GROUP BY 1 ORDER BY 1
"""


PCTRANK_VALUES = [50.0, 100.0, 200.0]


def q_percentile_ranks(spark, sf_dir):
    """ES percentile_ranks aggregation (PercentileRanksAggregationBuilder):
    the inverse of percentiles — for fixed values, the percent of
    observations <= each value. Exact (the length_percentiles
    convention: exact twin verifiable, t-digest is the documented scale
    path). One scan, one scalar agg via conditional sums, in-plan
    unpivot."""
    ev = _events(spark, sf_dir).select("value")
    agg = ev.agg(
        F.count("*").alias("n"),
        *[
            F.sum((F.col("value") <= v).cast("int")).alias(f"le{i}")
            for i, v in enumerate(PCTRANK_VALUES)
        ],
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(v).alias("value"),
                    F.round(
                        F.col(f"le{i}").cast("double") * 100.0 / F.col("n"), 6
                    ).alias("pct_rank"),
                )
                for i, v in enumerate(PCTRANK_VALUES)
            ]
        )
    )
    return agg.select(rows.alias("x")).select("x.value", "x.pct_rank").orderBy("value")


O_PERCENTILE_RANKS = f"""
WITH s AS (SELECT count(*)::bigint AS n,
    {", ".join(f"sum((value <= {v})::int)::bigint AS le{i}" for i, v in enumerate(PCTRANK_VALUES))}
    FROM events),
u AS ({" UNION ALL ".join(f"SELECT {v}::double AS value, round(le{i}::double * 100.0 / n, 6) AS pct_rank FROM s" for i, v in enumerate(PCTRANK_VALUES))})
SELECT value, pct_rank FROM u ORDER BY value
"""


def q_stream_set_ops(spark, sf_dir):
    """Solr streaming-expression set decorators `intersect` and
    `complement` (org.apache.solr.client.solrj.io.stream): set algebra
    over two sorted doc_id streams — here streamA = docs containing
    'join', streamB = docs containing 'merge'. Rather than two merge
    joins over re-executed streams, one conditional-emit scan computes
    both decorators (the drill_sideways shape): op='intersect' for docs
    in A∩B, op='complement' for A\\B."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.array_contains(toks, "join").alias("a"),
        F.array_contains(toks, "merge").alias("b"),
    )
    emit = F.filter(
        F.array(
            F.when(F.col("a") & F.col("b"), F.lit("intersect")),
            F.when(F.col("a") & ~F.col("b"), F.lit("complement")),
        ),
        lambda x: x.isNotNull(),
    )
    return (
        d.filter("a")
        .select("doc_id", F.explode(emit).alias("op"))
        .orderBy("op", "doc_id")
    )


O_STREAM_SET_OPS = f"""
WITH d AS (SELECT doc_id,
                  list_contains(list_distinct({TOK_SQL}), 'join') AS a,
                  list_contains(list_distinct({TOK_SQL}), 'merge') AS b
           FROM documents)
SELECT doc_id, 'intersect' AS op FROM d WHERE a AND b
UNION ALL
SELECT doc_id, 'complement' AS op FROM d WHERE a AND NOT b
ORDER BY op, doc_id
"""


def q_reindex_wordcount(spark, sf_dir):
    """ES _reindex end-to-end (index/reindex.py): the documents index's
    STORED fields — not the original corpus — are filtered
    (where="lang = 'en'", ES reindex's source.query) and rebuilt into a
    fresh destination index; the answer is the destination's term
    dictionary (term_stats: cf + df). Oracle = wordcount over the
    filtered corpus, which the destination must reproduce exactly if
    the stored-fields round-trip, live-docs filter, and rebuild are all
    correct. Destination is cached like the source index (one build per
    sf_dir)."""
    from nlp4l_spark.index import IndexBuilder, reindex
    from nlp4l_spark.index.catalog import IndexCatalog

    src = _index_cache_dir(sf_dir)
    if not IndexCatalog(src).is_committed("field_stats"):
        IndexBuilder(sort_cols=("doc_id",)).build(_docs(spark, sf_dir), src)
    dst = src + "_reindex_en"
    if not IndexCatalog(dst).is_committed("term_stats"):
        reindex(
            spark,
            src,
            dst,
            where="lang = 'en'",
            transform=lambda d: d.withColumnRenamed("doc_id", "src_id"),
            builder=IndexBuilder(sort_cols=("src_id",)),
        )
    ts = IndexCatalog(dst).read(spark, "term_stats")
    return ts.select(
        "term",
        F.col("cf").cast("long").alias("cf"),
        F.col("df").cast("long").alias("df"),
    ).orderBy("term")


O_REINDEX_WORDCOUNT = f"""
WITH toks AS (SELECT doc_id, unnest({TOK_SQL}) AS term
              FROM documents WHERE lang = 'en')
SELECT term, count(*)::bigint AS cf, count(DISTINCT doc_id)::bigint AS df
FROM toks GROUP BY term ORDER BY term
"""


SHINGLE_ANALYZER = Analyzer(
    stopwords=LUCENE_ENGLISH_STOPWORDS, shingle_size=2
)
EDGE_ANALYZER = Analyzer(stopwords=LUCENE_ENGLISH_STOPWORDS, edge_ngrams=(2, 4))


def q_shingle_wordcount(spark, sf_dir):
    """Lucene ShingleFilter contract (analysis/analyzer.py shingle_size):
    index-time word bigrams ("a_b") appended to the unigram stream,
    outputUnigrams=true — the phrase-frequency index that powers
    phrase-boosting and collocation stats without positions. Top-20
    shingles by collection frequency; the oracle re-renders the SAME
    analyzer contract in DuckDB (4-engine identity smoke-tested in
    tests/test_shingle_edge.py).

    Engine note: the declarative twin (explode(SHINGLE_ANALYZER
    .tokens_expr) + contains('_')) measured 11.5 s at sf0.1 — the
    nested transform/slice/array_join HOF chain is interpreted per
    element. This is the dedup.shingles_udf / collocations precedent a
    fourth time: per-doc shingle COUNTS via one Arrow pass (the
    unigram stream never reaches the query: [a-z0-9]+ tokens cannot
    contain '_'), oracle-identical output."""
    from pyspark.sql import types as T

    tokenize = STANDARD_ANALYZER.tokenize  # == SHINGLE base stream

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("t", T.StringType()),
                    T.StructField("c", T.LongType()),
                ]
            )
        )
    )
    def _shingle_counts(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tokenize(t)
            counts: dict[str, int] = {}
            for a, b in zip(toks, toks[1:]):
                s = a + "_" + b
                counts[s] = counts.get(s, 0) + 1
            out.append(list(counts.items()))
        return pd.Series(out)

    return (
        _docs(spark, sf_dir)
        .select(F.explode(_shingle_counts(F.col("text"))).alias("b"))
        .groupBy(F.col("b.t").alias("term"))
        .agg(F.sum("b.c").cast("long").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(20)
    )


O_SHINGLE_WORDCOUNT = f"""
WITH t AS (SELECT unnest({SHINGLE_ANALYZER.duckdb_tokens_sql("text")}) AS term
           FROM documents)
SELECT term, count(*)::bigint AS cf FROM t
WHERE contains(term, '_')
GROUP BY term ORDER BY cf DESC, term ASC LIMIT 20
"""


def q_edge_ngram_autocomplete(spark, sf_dir):
    """Lucene EdgeNGramTokenFilter / ES search_as_you_type contract
    (analysis/analyzer.py edge_ngrams): the index analyzer replaces each
    token by its 2..4-char prefixes (+ the original), so a partial
    keystroke is an EXACT term lookup — no wildcard scan at query time.
    The twin materializes the autocomplete table for prefix 've': each
    edge term's doc frequency, the numbers a suggest-box ranks on."""
    toks = EDGE_ANALYZER.tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.array_distinct(toks)).alias("term"))
        .filter(F.col("term").startswith("ve"))
        .groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("df"))
        .orderBy("term")
    )


O_EDGE_NGRAM_AUTOCOMPLETE = f"""
WITH t AS (SELECT doc_id,
                  unnest(list_distinct({EDGE_ANALYZER.duckdb_tokens_sql("text")}))
                      AS term
           FROM documents)
SELECT term, count(DISTINCT doc_id)::bigint AS df FROM t
WHERE term LIKE 've%' GROUP BY term ORDER BY term
"""


MIX_ALPHA = 0.3


def q_mix_weights(spark, sf_dir):
    """Temperature-based data mixing (the multilingual/multi-source
    sampling recipe, p_i ∝ n_i^alpha with alpha={MIX_ALPHA} — Conneau &
    Lample 2019 XLM §3.1, also the Pile/ROOTS mixing shape): per source,
    the raw doc share and the temperature-flattened sampling weight.
    Small sources get up-weighted, head sources damped — the knob every
    LLM data pipeline sets. Weight = n^alpha / sum(n^alpha): pow and ONE
    division per row, 6dp both engines; the n^alpha fold is over the
    source-sized table. One scan + one tiny agg."""
    counts = (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(F.count("*").cast("long").alias("n_docs"))
    )
    total = counts.agg(
        F.sum("n_docs").alias("_t"),
        F.sum(F.pow(F.col("n_docs").cast("double"), MIX_ALPHA)).alias("_z"),
    ).collect()[0]
    return counts.select(
        "source",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / float(total["_t"]), 6).alias(
            "raw_share"
        ),
        F.round(
            F.pow(F.col("n_docs").cast("double"), MIX_ALPHA)
            / float(total["_z"]),
            6,
        ).alias("mix_weight"),
    ).orderBy("source")


O_MIX_WEIGHTS = f"""
WITH c AS (SELECT source, count(*)::bigint AS n_docs FROM documents GROUP BY 1),
t AS (SELECT sum(n_docs)::double AS total,
             sum(pow(n_docs::double, {MIX_ALPHA})) AS z FROM c)
SELECT source, n_docs,
       round(n_docs::double / total, 6) AS raw_share,
       round(pow(n_docs::double, {MIX_ALPHA}) / z, 6) AS mix_weight
FROM c CROSS JOIN t ORDER BY source
"""


RANDOM_SCORE_SEED = 42


def q_random_score_topk(spark, sf_dir):
    """ES function_score random_score with a seed+field
    (RandomScoreFunctionBuilder): ES makes "random" reproducible by
    hashing (seed, field value) — which is exactly a deterministic hash
    score, so the twin IS the real semantics, not an approximation.
    score = md5-hash32(seed:doc_id) / 2^32 ∈ [0,1). The canonical use is
    a stable random sample / exploration slice of a filtered set (here:
    docs matching the BM25 terms). One scan, TakeOrdered."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    h = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{RANDOM_SCORE_SEED}:"),
                    F.col("doc_id").cast("string"),
                )
            ),
            1,
            8,
        ),
        16,
        10,
    ).cast("long")
    return (
        _docs(spark, sf_dir)
        .filter(
            F.arrays_overlap(toks, F.array(*[F.lit(t) for t in BM25_TERMS]))
        )
        .select(
            "doc_id",
            F.round(h.cast("double") / F.lit(4294967296.0), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


O_RANDOM_SCORE_TOPK = f"""
SELECT doc_id,
       round(('0x' || substr(md5('{RANDOM_SCORE_SEED}:' || doc_id::varchar), 1, 8))::bigint::double
             / 4294967296.0, 6) AS score
FROM documents
WHERE len(list_intersect(list_distinct({TOK_SQL}), {BM25_TERMS!r})) > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


PINNED_IDS = [7, 404, 13]


def q_pinned_topk(spark, sf_dir):
    """ES pinned query (PinnedQueryBuilder): curated doc ids rank FIRST
    in their given order, organic BM25 results follow — the editorial
    'promoted result' surface. ES implements it as a huge constant boost
    per pin position; the twin scores pins as 1e6 - position and
    organics by 6dp-rounded BM25, one ranking. Pins that also match
    organically appear once (pinned position wins). The pin list is a
    LITERAL, so no join at all: organic scan with a NOT-IN filter, pins
    unioned in as driver-built rows."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    organic = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .filter(~F.col("doc_id").isin(PINNED_IDS))
        .select("doc_id", F.col("s").alias("score"))
    )
    pin_rows = spark.createDataFrame(
        [(d, 1e6 - i) for i, d in enumerate(PINNED_IDS)],
        "doc_id long, score double",
    )
    return (
        organic.unionByName(pin_rows)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("score", 6).alias("score"))
    )


O_PINNED_TOPK = f"""
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
merged AS (SELECT doc_id, s AS score FROM sc
           WHERE doc_id NOT IN (SELECT unnest({PINNED_IDS!r}))
           UNION ALL
           SELECT unnest({PINNED_IDS!r})::bigint AS doc_id,
                  1e6 - (generate_subscripts({PINNED_IDS!r}, 1) - 1) AS score)
SELECT doc_id, round(score, 6) AS score FROM merged
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


# --------------------------------------------------------------------- #
