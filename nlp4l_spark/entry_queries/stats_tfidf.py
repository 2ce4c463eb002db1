# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    CHI2_TERMS, Corpus, F, SOLR_LOG_LINES, TFIDF_FEATURES, TOKS_CTE, Window,
    _corpus, _docs, _events, _lineitem, moments, processors, tfidf,
)
# TF-IDF (SURVEY §2.5, TFIDF.scala modes)
# --------------------------------------------------------------------- #
def q_tfidf_weights(spark, sf_dir):
    w = tfidf.tf_idf_weights(
        _corpus(spark, sf_dir), tf_mode="n", idf_mode="t", features=TFIDF_FEATURES
    )
    return w.select("doc_id", "term", F.round("weight", 6).alias("weight"))


O_TFIDF_WEIGHTS = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks
       WHERE term IN {tuple(TFIDF_FEATURES)!r} GROUP BY 1, 2),
dfm AS (SELECT term, count(*)::double AS df FROM dt GROUP BY 1),
n AS (SELECT count(*)::double AS n FROM documents)
SELECT doc_id, term, round(tf * ln(n / df), 6) AS weight
FROM dt JOIN dfm USING (term) CROSS JOIN n
"""


def q_chi2_terms(spark, sf_dir):
    """Per-term 2x2 chi-square of term counts: lang='en' docs vs the rest
    (Stats.chiSquare, Stats.scala:81-106)."""
    docs = _docs(spark, sf_dir)
    dt = Corpus(docs, "text", "doc_id").doc_terms().join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    grp = dt.withColumn("_g", (F.col("lang") == "en").cast("int"))
    tot = grp.groupBy("_g").agg(F.sum("tf").alias("tot"))
    wc = (
        grp.filter(F.col("term").isin(CHI2_TERMS))
        .groupBy("term", "_g")
        .agg(F.sum("tf").alias("wc"))
    )
    pivoted = (
        wc.join(tot, "_g")
        .groupBy("term")
        .agg(
            F.sum(F.when(F.col("_g") == 1, F.col("wc"))).alias("wc1"),
            F.sum(F.when(F.col("_g") == 1, F.col("tot") - F.col("wc"))).alias("oc1"),
            F.sum(F.when(F.col("_g") == 0, F.col("wc"))).alias("wc2"),
            F.sum(F.when(F.col("_g") == 0, F.col("tot") - F.col("wc"))).alias("oc2"),
        )
    )
    chi = moments.chi_square_cols(
        F.col("wc1").cast("double"),
        F.col("oc1").cast("double"),
        F.col("wc2").cast("double"),
        F.col("oc2").cast("double"),
    )
    return pivoted.select("term", F.round(chi, 6).alias("chi2"))


O_CHI2_TERMS = f"""
WITH {TOKS_CTE},
dt AS (SELECT t.doc_id, term, d.lang, count(*)::double AS tf
       FROM toks t JOIN documents d USING (doc_id) GROUP BY 1, 2, 3),
g AS (SELECT *, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS grp FROM dt),
tot AS (SELECT grp, sum(tf) AS tot FROM g GROUP BY grp),
wc AS (SELECT term, grp, sum(tf) AS wc FROM g
       WHERE term IN {tuple(CHI2_TERMS)!r} GROUP BY 1, 2),
piv AS (SELECT term,
           sum(CASE WHEN grp = 1 THEN wc END) AS wc1,
           sum(CASE WHEN grp = 1 THEN tot - wc END) AS oc1,
           sum(CASE WHEN grp = 0 THEN wc END) AS wc2,
           sum(CASE WHEN grp = 0 THEN tot - wc END) AS oc2
        FROM wc JOIN tot USING (grp) GROUP BY term)
SELECT term, round(
    pow(wc1 - (oc1+wc1)/(oc1+wc1+oc2+wc2)*(wc1+wc2), 2) / ((oc1+wc1)/(oc1+wc1+oc2+wc2)*(wc1+wc2))
  + pow(oc1 - (oc1+wc1)/(oc1+wc1+oc2+wc2)*(oc1+oc2), 2) / ((oc1+wc1)/(oc1+wc1+oc2+wc2)*(oc1+oc2))
  + pow(wc2 - (oc2+wc2)/(oc1+wc1+oc2+wc2)*(wc1+wc2), 2) / ((oc2+wc2)/(oc1+wc1+oc2+wc2)*(wc1+wc2))
  + pow(oc2 - (oc2+wc2)/(oc1+wc1+oc2+wc2)*(oc1+oc2), 2) / ((oc2+wc2)/(oc1+wc1+oc2+wc2)*(oc1+oc2)),
  6) AS chi2
FROM piv
"""


# --------------------------------------------------------------------- #
# Stats moments (Stats.scala), processors, click analytics
# --------------------------------------------------------------------- #
def q_stats_moments(spark, sf_dir):
    m = moments.moments(_lineitem(spark, sf_dir), "l_quantity", "l_extendedprice")
    return m.select(
        F.round("avg1", 6).alias("avg1"),
        F.round("var1", 6).alias("var1"),
        F.round("cov12", 6).alias("cov12"),
        F.round("corr12", 6).alias("corr12"),
    )


O_STATS_MOMENTS = """
SELECT round(avg(l_quantity), 6) AS avg1,
       round(var_pop(l_quantity), 6) AS var1,
       round(covar_pop(l_quantity, l_extendedprice), 6) AS cov12,
       round(corr(l_quantity, l_extendedprice), 6) AS corr12
FROM lineitem
"""


def q_merge_records(spark, sf_dir):
    ev = _events(spark, sf_dir)
    merged = (
        ev.groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                " ",
            ).alias("merged")
        )
    )
    return merged


O_MERGE_RECORDS = """
SELECT user_id, string_agg(event_type, ' ' ORDER BY ts, event_id) AS merged
FROM events GROUP BY user_id
"""


def q_unique_by_source(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("source", "doc_id")
    return processors.unique(docs, "source")


O_UNIQUE_BY_SOURCE = """
SELECT source, min(doc_id)::bigint AS doc_id FROM documents GROUP BY source
"""


def q_click_rate(spark, sf_dir):
    ev = _events(spark, sf_dir).withColumn(
        "is_click", (F.col("event_type") == "click").cast("double")
    )
    cr = ev.groupBy("user_id").agg(F.avg("is_click").alias("_r"))
    return cr.select("user_id", F.round("_r", 6).alias("click_rate"))


O_CLICK_RATE = """
SELECT user_id,
       round(avg(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END), 6)
           AS click_rate
FROM events GROUP BY user_id
"""


def q_rate_to_label(spark, sf_dir):
    ev = _events(spark, sf_dir).withColumn(
        "is_click", (F.col("event_type") == "click").cast("double")
    )
    cr = ev.groupBy("user_id").agg(F.avg("is_click").alias("rate"))
    return processors.rate_to_label(cr, "rate", [0.2, 0.5, 0.8]).select(
        "user_id", "label"
    )


O_RATE_TO_LABEL = """
WITH cr AS (SELECT user_id,
            avg(CASE WHEN event_type = 'click' THEN 1.0 ELSE 0.0 END) AS rate
            FROM events GROUP BY user_id)
SELECT user_id,
       (CASE WHEN rate >= 0.8 THEN 3 WHEN rate >= 0.5 THEN 2
             WHEN rate >= 0.2 THEN 1 ELSE 0 END)::int AS label
FROM cr
"""


def q_top_event_types(spark, sf_dir):
    ev = processors.filter_top_queries(_events(spark, sf_dir), "event_type", 3)
    return ev.groupBy("event_type").agg(F.count("*").alias("cnt"))


O_TOP_EVENT_TYPES = """
SELECT event_type, count(*)::bigint AS cnt FROM events GROUP BY event_type
ORDER BY cnt DESC, event_type ASC LIMIT 3
"""


FUNNEL = ["view", "click", "purchase"]


def q_funnel_steps(spark, sf_dir):
    """Ordered view→click→purchase funnel per user (subsequence
    semantics, greedy earliest match — processors.funnel_steps)."""
    ev = _events(spark, sf_dir)
    return processors.funnel_steps(ev, "user_id", "ts", "event_type", FUNNEL)


O_FUNNEL_STEPS = """
WITH e AS (SELECT user_id, floor(epoch(ts))::BIGINT AS sec, event_type
           FROM events),
s1 AS (SELECT user_id, min(sec) AS t_1 FROM e
       WHERE event_type = 'view' GROUP BY user_id),
s2 AS (SELECT e.user_id, min(sec) AS t_2 FROM e JOIN s1 USING (user_id)
       WHERE event_type = 'click' AND sec > t_1 GROUP BY e.user_id),
s3 AS (SELECT e.user_id, min(sec) AS t_3 FROM e JOIN s2 USING (user_id)
       WHERE event_type = 'purchase' AND sec > t_2 GROUP BY e.user_id)
SELECT s1.user_id,
       (1 + (t_2 IS NOT NULL)::int + (t_3 IS NOT NULL)::int) AS reached,
       t_1, t_2, t_3
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)
"""


def q_rolling_stats(spark, sf_dir):
    """Trailing 30-min per-user aggregates over the event stream (count /
    sum / mean of value), one RANGE-frame window pass — see
    processors.rolling_stats."""
    ev = _events(spark, sf_dir)
    return processors.rolling_stats(ev, "user_id", "ts", "value", 1800).select(
        "event_id", "user_id", "ts_sec", "n_win", "sum_win", "avg_win"
    )


O_ROLLING_STATS = """
WITH e AS (SELECT event_id, user_id, floor(epoch(ts))::BIGINT AS ts_sec, value
           FROM events)
SELECT event_id, user_id, ts_sec,
       count(value) OVER w::BIGINT AS n_win,
       round(sum(value) OVER w, 6) AS sum_win,
       round(avg(value) OVER w, 6) AS avg_win
FROM e
WINDOW w AS (PARTITION BY user_id ORDER BY ts_sec
             RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
"""


def q_asof_join(spark, sf_dir):
    """As-of join over the events log: each purchase picks up the user's
    most recent click at-or-before it (ops/asof.asof_join — union +
    ordered window, ONE shuffle on user_id, no range-join row
    amplification). DuckDB's native ASOF LEFT JOIN is the oracle, so the
    tie/no-match semantics are pinned to the industry definition."""
    from nlp4l_spark.ops.asof import asof_join

    ev = _events(spark, sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "value"
    )
    j = asof_join(purchases, clicks, on="ts", by=("user_id",), right_cols=("value",))
    return j.select(
        "event_id",
        "user_id",
        F.col("ts").cast("timestamp").cast("long").alias("ts_sec"),
        F.col("ts_r").cast("timestamp").cast("long").alias("click_ts_sec"),
        F.round("value_r", 6).alias("click_value"),
    )


O_ASOF_JOIN = """
SELECT p.event_id, p.user_id, floor(epoch(p.ts))::BIGINT AS ts_sec,
       floor(epoch(c.ts))::BIGINT AS click_ts_sec,
       round(c.value, 6) AS click_value
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN
     (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def q_sessionize(spark, sf_dir):
    """Gap-based sessionization of the events stream (30-min gap): the
    transcripts/agent-log workload's session segmentation, as one window
    pass (lag + running sum; ops/processors.sessionize)."""
    ev = processors.sessionize(_events(spark, sf_dir), "user_id", "ts", 1800)
    return ev.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events")
    )


O_SESSIONIZE = """
WITH seq AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts)::BIGINT - epoch(lag(ts) OVER w)::BIGINT > 1800
              THEN 1 ELSE 0 END AS ns
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
lab AS (SELECT user_id,
               (sum(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) - 1)::int AS session_id
        FROM seq)
SELECT user_id, session_id, count(*)::bigint AS n_events
FROM lab GROUP BY user_id, session_id
"""


def q_event_transitions(spark, sf_dir):
    """Per-user event-type transition counts (Markov/funnel view of the
    agent/event log): one window pass (lead over ts, event_id tiebreak),
    then a count aggregation."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    ev = _events(spark, sf_dir).withColumn(
        "next_type", F.lead("event_type").over(w)
    )
    return (
        ev.filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("from_type"),
                 F.col("next_type").alias("to_type"))
        .agg(F.count("*").alias("cnt"))
    )


O_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events)
SELECT from_type, to_type, count(*)::bigint AS cnt
FROM seq WHERE to_type IS NOT NULL
GROUP BY from_type, to_type
"""


def q_dcm_truncate(spark, sf_dir):
    """DCM truncation (ClickModelAnalyzer.filterAsDCM): impressions per user
    ordered by time, truncated at last click; output kept-count."""
    ev = _events(spark, sf_dir)
    lists = ev.groupBy("user_id").agg(
        F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))).alias("_s")
    ).select(
        "user_id",
        F.transform(F.col("_s"), lambda x: x["event_id"]).alias("imps"),
        F.transform(
            F.col("_s"), lambda x: (x["event_type"] == F.lit("click")).cast("int")
        ).alias("clicks"),
    )
    out = processors.dcm_truncate(lists, "imps", "clicks")
    return out.select("user_id", F.size("imps").cast("long").alias("n_kept"))


O_DCM_TRUNCATE = """
WITH seq AS (SELECT user_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
             FROM events)
SELECT user_id,
       coalesce(max(CASE WHEN event_type = 'click' THEN rn END), 0)::bigint AS n_kept
FROM seq GROUP BY user_id
"""


def q_props_parse(spark, sf_dir):
    """Regex field extraction (StandardSolrQueryLogProcessor shape) over the
    events.props JSON-ish strings."""
    ev = _events(spark, sf_dir).withColumn(
        "k", F.regexp_extract("props", r'"k": (\d+)', 1).cast("int")
    )
    return ev.groupBy("event_type").agg(F.round(F.avg("k"), 6).alias("avg_k"))


O_PROPS_PARSE = """
SELECT event_type,
       round(avg(regexp_extract(props, '"k": (\\d+)', 1)::int), 6) AS avg_k
FROM events GROUP BY event_type
"""


def q_solr_log_parse(spark, sf_dir):
    df = spark.createDataFrame([(l,) for l in SOLR_LOG_LINES], "line string")
    return processors.parse_solr_log(df)


def _sql_quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


O_SOLR_LOG_PARSE = f"""
WITH lines(line) AS (VALUES {", ".join(f"({_sql_quote(l)})" for l in SOLR_LOG_LINES)}),
p AS (SELECT line, regexp_extract(line, 'params=\\{{(.*?)\\}}', 1) AS params FROM lines)
SELECT regexp_extract(line, '^(\\S+\\s+\\S+)', 1) AS date,
       regexp_extract(params, '(?:^|&)q=([^&]*)', 1) AS q,
       regexp_extract(params, '(?:^|&)fq=([^&]*)', 1) AS fq,
       regexp_extract(params, '(?:^|&)facet\\.field=([^&]*)', 1) AS facet_field,
       regexp_extract(params, '(?:^|&)facet\\.query=([^&]*)', 1) AS facet_query,
       regexp_extract(line, 'hits=(\\d+)', 1)::bigint AS hits,
       regexp_extract(line, 'QTime=(\\d+)', 1)::bigint AS qtime
FROM p
"""


def q_sort_paging(spark, sf_dir):
    """SortProcessor + fetch paging (RunDao.fetch offset/size)."""
    return (
        _docs(spark, sf_dir)
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .offset(10)
        .limit(5)
        .select("doc_id", "n_chars")
    )


O_SORT_PAGING = """
SELECT doc_id, n_chars FROM documents
ORDER BY n_chars DESC, doc_id ASC LIMIT 5 OFFSET 10
"""


def q_validator_unique(spark, sf_dir):
    _, dup = processors.unique_record_validator(_docs(spark, sf_dir), "doc_id")
    return spark.createDataFrame([(dup,)], "dup_keys long")


O_VALIDATOR_UNIQUE = """
SELECT count(*)::bigint AS dup_keys FROM (
  SELECT doc_id FROM documents GROUP BY doc_id HAVING count(*) > 1
)
"""


# --------------------------------------------------------------------- #
