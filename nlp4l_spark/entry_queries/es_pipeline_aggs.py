# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    F, STANDARD_ANALYZER, TOK_SQL, Window, _docs, _embeddings, _events,
    _lineitem, os,
)
from nlp4l_spark.entry_queries.chatqc import (  # noqa: F401
    CHAT_CTE, _chat_turns,
)
from nlp4l_spark.entry_queries.es_aggs import (  # noqa: F401
    CTX_BUDGET,
)
# ES pipeline-aggregation twins (cumulative_sum, stats_bucket,
# percentiles_bucket) + classical-statistics twins (one-way ANOVA,
# Cramér's V, Spearman), ACF, and graph triangle counting.
# --------------------------------------------------------------------- #


def _daily_counts(spark, sf_dir):
    """Shared parent: the daily event-count date histogram (epoch-day
    buckets, timezone-free — the same parent every ES pipeline agg in
    this file hangs off)."""
    sec = F.col("ts").cast("timestamp").cast("long")
    return (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


O_DAILY_CTE = """d AS (
  SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
         count(*)::bigint AS cnt
  FROM events GROUP BY 1)"""


BACKTEST_DAYS = 7


def q_forecast_backtest(spark, sf_dir):
    """Forecast backtest (the baseline-honesty panel any forecasting
    stack prints before shipping a model): naive (lag-1 bucket) and
    seasonal-naive (lag-7 bucket) predictions of the daily value sum,
    scored on the LAST {BACKTEST_DAYS} buckets by MAE and MAPE. Lags
    are BUCKET positions (row lag over the day-ordered histogram, the
    serial_diff convention). Errors are exact integer cents; MAE/MAPE
    are ratios of exact sums — one histogram-sized window pass, two
    output rows."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(
            F.floor(sec / 86400).cast("long").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("day")
        .agg(F.sum("_c").alias("s"))
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "day",
        "s",
        F.lag("s", 1).over(w).alias("p1"),
        F.lag("s", 7).over(w).alias("p7"),
        F.row_number().over(w).alias("rn"),
    )
    tot = lagged.agg(F.max("rn").alias("_mx"))
    test = lagged.crossJoin(F.broadcast(tot)).filter(
        F.col("rn") > F.col("_mx") - BACKTEST_DAYS
    )

    def arm(pred, name):
        ae = F.abs(F.col("s") - F.col(pred))
        return test.filter(F.col(pred).isNotNull()).agg(
            F.max(F.lit(name)).alias("model"),
            F.count("*").cast("long").alias("n_days"),
            F.round(
                F.sum(ae).cast("double") / F.count("*") / 100.0, 6
            ).alias("mae"),
            F.round(
                F.sum(ae.cast("double") / F.col("s")) / F.count("*"), 6
            ).alias("mape"),
        )

    return arm("p1", "naive").unionAll(arm("p7", "seasonal_naive")).orderBy(
        "model"
    )


O_FORECAST_BACKTEST = f"""
WITH daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint
                 AS day,
               sum(round(value * 100)::bigint)::bigint AS s
               FROM events GROUP BY 1),
lagged AS (SELECT day, s,
                  lag(s, 1) OVER (ORDER BY day) AS p1,
                  lag(s, 7) OVER (ORDER BY day) AS p7,
                  row_number() OVER (ORDER BY day) AS rn
           FROM daily),
mx AS (SELECT max(rn) AS m FROM lagged),
test AS (SELECT * FROM lagged CROSS JOIN mx
         WHERE rn > m - {BACKTEST_DAYS})
SELECT * FROM (
  SELECT 'naive' AS model, count(*)::bigint AS n_days,
         round(sum(abs(s - p1))::double / count(*) / 100.0, 6) AS mae,
         round(sum(abs(s - p1)::double / s) / count(*), 6) AS mape
  FROM test WHERE p1 IS NOT NULL
  UNION ALL
  SELECT 'seasonal_naive', count(*)::bigint,
         round(sum(abs(s - p7))::double / count(*) / 100.0, 6),
         round(sum(abs(s - p7)::double / s) / count(*), 6)
  FROM test WHERE p7 IS NOT NULL)
ORDER BY model
"""


CONF_ALPHA = 0.1
CONF_TRAIN_D, CONF_CALIB_D = 20, 5


def q_conformal_coverage(spark, sf_dir):
    """Split-conformal prediction intervals (Vovk; the
    distribution-free uncertainty wrapper modern ML eval uses) on event
    value by type: the model is the per-type TRAIN-window mean (exact
    cents), the conformal radius q̂ is the k-th smallest calibration
    |residual| with k = ⌈(n_calib+1)(1−α)⌉ (an exact order statistic —
    no interpolation, the textbook finite-sample rule), and the report
    is empirical test coverage of mean ± q̂, which the conformal
    guarantee lower-bounds by 1−α = {1 - CONF_ALPHA}. Residuals are
    exact integer cents, so the order statistic and the coverage counts
    are engine-exact. One event scan + type-sized broadcasts."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select(
        "event_type",
        F.floor(sec / 86400).cast("long").alias("_day"),
        cents.alias("_c"),
    )
    d0 = e.agg(F.min("_day").alias("_d0"))
    e2 = e.crossJoin(F.broadcast(d0)).withColumn(
        "_split",
        F.when(
            F.col("_day") < F.col("_d0") + CONF_TRAIN_D, F.lit("train")
        )
        .when(
            F.col("_day") < F.col("_d0") + CONF_TRAIN_D + CONF_CALIB_D,
            F.lit("calib"),
        )
        .otherwise(F.lit("test")),
    )
    model = (
        e2.filter(F.col("_split") == "train")
        .groupBy("event_type")
        .agg(
            (F.sum("_c").cast("double") / F.count("*")).alias("_mu")
        )
    )
    calib = (
        e2.filter(F.col("_split") == "calib")
        .join(F.broadcast(model), "event_type")
        .select(
            "event_type",
            F.abs(F.col("_c").cast("double") - F.col("_mu")).alias("_r"),
        )
    )
    wq = Window.partitionBy("event_type").orderBy("_r")
    nn = calib.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_calib")
    )
    k = F.ceil((F.col("n_calib") + 1) * (1.0 - CONF_ALPHA)).cast("long")
    qhat = (
        calib.withColumn("_rn", F.row_number().over(wq))
        .join(F.broadcast(nn), "event_type")
        .filter(
            F.col("_rn")
            == F.least(k, F.col("n_calib"))
        )
        .select("event_type", "n_calib", F.col("_r").alias("_qhat"))
    )
    test = e2.filter(F.col("_split") == "test").join(
        F.broadcast(model), "event_type"
    ).join(F.broadcast(qhat), "event_type")
    return (
        test.groupBy("event_type", "n_calib")
        .agg(
            F.count("*").cast("long").alias("n_test"),
            F.round(F.max("_qhat") / 100.0, 6).alias("qhat"),
            F.round(
                F.sum(
                    (
                        F.abs(F.col("_c").cast("double") - F.col("_mu"))
                        <= F.col("_qhat")
                    ).cast("long")
                ).cast("double")
                / F.count("*"),
                6,
            ).alias("coverage"),
        )
        .orderBy("event_type")
    )


O_CONFORMAL_COVERAGE = f"""
WITH e AS (SELECT event_type,
                  floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  round(value * 100)::bigint AS c
           FROM events),
d0 AS (SELECT min(day) AS d0 FROM e),
e2 AS (SELECT event_type, c,
              CASE WHEN day < d0 + {CONF_TRAIN_D} THEN 'train'
                   WHEN day < d0 + {CONF_TRAIN_D + CONF_CALIB_D}
                     THEN 'calib'
                   ELSE 'test' END AS split
       FROM e CROSS JOIN d0),
model AS (SELECT event_type, sum(c)::double / count(*) AS mu
          FROM e2 WHERE split = 'train' GROUP BY 1),
calib AS (SELECT e2.event_type, abs(c::double - mu) AS r
          FROM e2 JOIN model USING (event_type) WHERE split = 'calib'),
nn AS (SELECT event_type, count(*)::bigint AS n_calib
       FROM calib GROUP BY 1),
qhat AS (SELECT event_type, n_calib, r AS qh FROM (
           SELECT calib.event_type, nn.n_calib, r,
                  row_number() OVER (PARTITION BY calib.event_type
                    ORDER BY r) AS rn
           FROM calib JOIN nn USING (event_type))
         WHERE rn = least(ceil((n_calib + 1) * {1 - CONF_ALPHA!r})::bigint,
                          n_calib))
SELECT e2.event_type, n_calib, count(*)::bigint AS n_test,
       round(max(qh) / 100.0, 6) AS qhat,
       round(sum((abs(c::double - mu) <= qh)::int)::double / count(*), 6)
         AS coverage
FROM e2 JOIN model USING (event_type) JOIN qhat USING (event_type)
WHERE split = 'test'
GROUP BY 1, 2 ORDER BY event_type
"""


def q_theil_sen_trend(spark, sf_dir):
    """Theil–Sen robust trend of the daily event count (the
    outlier-immune alternative to the OLS slope a monitoring system
    prefers): slope = median over ALL pairwise slopes
    (c_j−c_i)/(day_j−day_i), i<j, intercept = median(c_i − slope·day_i).
    The pair set is calendar², bounded at any corpus scale; every slope
    is a ratio of exact integers so the interpolated medians are
    float-identical across engines. Two histogram-sized self-joins, no
    data-sized work after the day groupBy."""
    daily = _daily_counts(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(b, F.col("b.day") > F.col("a.day")).select(
        (
            (F.col("b.cnt") - F.col("a.cnt")).cast("double")
            / (F.col("b.day") - F.col("a.day"))
        ).alias("slope")
    )
    med = slopes.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.expr("percentile(slope, 0.5D)").alias("_slope"),
    )
    resid = daily.crossJoin(F.broadcast(med)).select(
        "n_pairs",
        "_slope",
        (F.col("cnt").cast("double") - F.col("_slope") * F.col("day")).alias(
            "_r"
        ),
    )
    return resid.groupBy("n_pairs", "_slope").agg(
        F.expr("percentile(_r, 0.5D)").alias("_icpt")
    ).select(
        "n_pairs",
        F.round("_slope", 6).alias("slope"),
        F.round("_icpt", 6).alias("intercept"),
    )


O_THEIL_SEN_TREND = f"""
WITH {O_DAILY_CTE},
pairs AS (SELECT (b.cnt - a.cnt)::double / (b.day - a.day) AS slope
          FROM d a JOIN d b ON b.day > a.day),
med AS (SELECT count(*)::bigint AS n_pairs,
               quantile_cont(slope, 0.5) AS slope
        FROM pairs),
resid AS (SELECT n_pairs, med.slope,
                 cnt::double - med.slope * day AS r
          FROM d CROSS JOIN med)
SELECT n_pairs, round(slope, 6) AS slope,
       round(quantile_cont(r, 0.5), 6) AS intercept
FROM resid GROUP BY n_pairs, slope
"""


def q_mann_kendall(spark, sf_dir):
    """Mann–Kendall trend test on the daily event count (the
    non-parametric 'is this metric trending' gate, the inferential
    sibling of theil_sen_trend): S = Σ_{{i<j}} sign(c_j − c_i), tie-
    corrected variance [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18, and the
    continuity-corrected z. Everything is exact int64 until the final
    z division; the pair join is calendar²-bounded. Verdict thresholds
    at |z| ≥ 1.96 (5% two-sided)."""
    daily = _daily_counts(spark, sf_dir)
    a = daily.alias("a")
    b = daily.alias("b")
    s = a.join(b, F.col("b.day") > F.col("a.day")).agg(
        F.sum(
            F.signum(
                (F.col("b.cnt") - F.col("a.cnt")).cast("double")
            ).cast("long")
        ).alias("s")
    )
    nrow = daily.agg(F.count("*").cast("long").alias("n"))
    ties = (
        daily.groupBy("cnt")
        .agg(F.count("*").cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t")
                    * (F.col("t") - 1)
                    * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            ).alias("tt")
        )
    )
    j = s.crossJoin(F.broadcast(nrow)).crossJoin(F.broadcast(ties))
    var = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tt")
    ).cast("double") / 18.0
    z = F.when(
        F.col("s") > 0, (F.col("s") - 1) / F.sqrt(var)
    ).when(F.col("s") < 0, (F.col("s") + 1) / F.sqrt(var)).otherwise(
        F.lit(0.0)
    )
    zr = F.round(z, 6)
    return j.select(
        "n",
        "s",
        F.round(var, 6).alias("var_s"),
        zr.alias("z_score"),
        F.when(zr >= 1.96, F.lit("increasing"))
        .when(zr <= -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


O_MANN_KENDALL = f"""
WITH {O_DAILY_CTE},
sgn AS (SELECT sum(CASE WHEN b.cnt > a.cnt THEN 1
                        WHEN b.cnt < a.cnt THEN -1 ELSE 0 END)::bigint
          AS s
        FROM d a JOIN d b ON b.day > a.day),
nn AS (SELECT count(*)::bigint AS n FROM d),
ties AS (SELECT coalesce(sum(t * (t - 1) * (2 * t + 5)), 0)::bigint AS tt
         FROM (SELECT count(*)::bigint AS t FROM d GROUP BY cnt
               HAVING count(*) > 1)),
j AS (SELECT s, n, tt,
             (n * (n - 1) * (2 * n + 5) - tt)::double / 18.0 AS var_s
      FROM sgn CROSS JOIN nn CROSS JOIN ties)
SELECT n, s, round(var_s, 6) AS var_s,
       round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                  WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                  ELSE 0.0 END, 6) AS z_score,
       CASE WHEN round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                            WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                            ELSE 0.0 END, 6) >= 1.96 THEN 'increasing'
            WHEN round(CASE WHEN s > 0 THEN (s - 1) / sqrt(var_s)
                            WHEN s < 0 THEN (s + 1) / sqrt(var_s)
                            ELSE 0.0 END, 6) <= -1.96 THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM j
"""


ASSOC_TOP = 15
ASSOC_MIN_CO = 3


def q_assoc_rules(spark, sf_dir):
    """Association rules over market baskets (the Apriori output stage
    on top of frequent_pairs): baskets are orders, items are the
    DISTINCT part brands in the order; for each ordered rule X→Y with
    co-support ≥ {ASSOC_MIN_CO}, support = c/n, confidence = c/c_X,
    lift = c·n/(c_X·c_Y); top-{ASSOC_TOP} by (lift, confidence) with
    6dp-rounded keys. Every measure is a ratio of exact integers. Plan:
    one distinct (order, brand) projection, a per-order self-join whose
    fanout is brands-per-order², brand-count-sized dims broadcast back."""
    li = _lineitem(spark, sf_dir)
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet")).select(
        "p_partkey", "p_brand"
    )
    ob = (
        li.select("l_orderkey", "l_partkey")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_orderkey", F.col("p_brand").alias("item"))
        .distinct()
    )
    n_orders = ob.select("l_orderkey").distinct().count()
    isup = ob.groupBy("item").agg(F.count("*").cast("long").alias("ci"))
    a = ob.alias("a")
    b = ob.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.item") != F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("x"), F.col("b.item").alias("y")
        )
        .agg(F.count("*").cast("long").alias("c"))
        .filter(F.col("c") >= ASSOC_MIN_CO)
    )
    cx = isup.select(F.col("item").alias("x"), F.col("ci").alias("cx"))
    cy = isup.select(F.col("item").alias("y"), F.col("ci").alias("cy"))
    nn = float(n_orders)
    r = (
        co.join(F.broadcast(cx), "x")
        .join(F.broadcast(cy), "y")
        .select(
            "x",
            "y",
            "c",
            F.round(F.col("c") / F.lit(nn), 6).alias("support"),
            F.round(
                F.col("c").cast("double") / F.col("cx"), 6
            ).alias("confidence"),
            F.round(
                F.col("c") * F.lit(nn)
                / (F.col("cx").cast("double") * F.col("cy")),
                6,
            ).alias("lift"),
        )
    )
    return r.orderBy(
        F.desc("lift"), F.desc("confidence"), F.asc("x"), F.asc("y")
    ).limit(ASSOC_TOP)


O_ASSOC_RULES = f"""
WITH ob AS (SELECT DISTINCT l_orderkey, p_brand AS item
            FROM lineitem JOIN part ON p_partkey = l_partkey),
nn AS (SELECT count(DISTINCT l_orderkey)::double AS n FROM ob),
isup AS (SELECT item, count(*)::bigint AS ci FROM ob GROUP BY 1),
co AS (SELECT a.item AS x, b.item AS y, count(*)::bigint AS c
       FROM ob a JOIN ob b
         ON a.l_orderkey = b.l_orderkey AND a.item <> b.item
       GROUP BY 1, 2 HAVING count(*) >= {ASSOC_MIN_CO})
SELECT x, y, c,
       round(c / n, 6) AS support,
       round(c::double / cx.ci, 6) AS confidence,
       round(c * n / (cx.ci::double * cy.ci), 6) AS lift
FROM co CROSS JOIN nn
JOIN isup cx ON cx.item = co.x
JOIN isup cy ON cy.item = co.y
ORDER BY lift DESC, confidence DESC, x ASC, y ASC LIMIT {ASSOC_TOP}
"""



def q_cumulative_sum_daily(spark, sf_dir):
    """ES cumulative_sum pipeline aggregation over the daily date
    histogram, plus the normalized running share (cumulative % of the
    period's volume — the 'pacing' panel). The running window is over
    BUCKETS, not events: its input is calendar-bounded (one row per
    day), so the unpartitioned ordered window is a constant-size
    driver-side triviality at any corpus scale — the aggregation
    underneath is the only data-sized job."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()
    return (
        daily.select(
            "day",
            "cnt",
            F.sum("cnt").over(w).cast("long").alias("cum_cnt"),
            F.round(
                F.sum("cnt").over(w).cast("double")
                / F.sum("cnt").over(total),
                6,
            ).alias("cum_share"),
        )
        .orderBy("day")
    )


O_CUMULATIVE_SUM_DAILY = f"""
WITH {O_DAILY_CTE}
SELECT day, cnt,
       sum(cnt) OVER (ORDER BY day)::bigint AS cum_cnt,
       round(sum(cnt) OVER (ORDER BY day)::double
             / sum(cnt) OVER (), 6) AS cum_share
FROM d ORDER BY day
"""


def q_stats_bucket(spark, sf_dir):
    """ES stats_bucket pipeline aggregation: min/max/avg/sum over the
    per-day VALUE SUMS (the sibling metric, not the raw rows) — 'which
    day grossed the most'. Daily sums fold as exact integer cents, so
    min/max/sum are exact and avg is one exact-int division; the final
    reduce is over a calendar-bounded bucket set."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(
            F.floor(sec / 86400).cast("long").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("day")
        .agg(F.sum("_c").alias("day_cents"))
    )
    return daily.agg(
        F.count("*").cast("long").alias("n_buckets"),
        (F.min("day_cents").cast("double") / 100.0).alias("min_day_value"),
        (F.max("day_cents").cast("double") / 100.0).alias("max_day_value"),
        F.round(
            F.sum("day_cents").cast("double") / F.count("*") / 100.0, 6
        ).alias("avg_day_value"),
        F.round(F.sum("day_cents").cast("double") / 100.0, 6).alias(
            "sum_value"
        ),
    )


O_STATS_BUCKET = """
WITH d AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  sum(round(value * 100)::bigint) AS day_cents
           FROM events GROUP BY 1)
SELECT count(*)::bigint AS n_buckets,
       min(day_cents)::double / 100.0 AS min_day_value,
       max(day_cents)::double / 100.0 AS max_day_value,
       round(sum(day_cents)::double / count(*) / 100.0, 6)
         AS avg_day_value,
       round(sum(day_cents)::double / 100.0, 6) AS sum_value
FROM d
"""


def q_percentiles_bucket(spark, sf_dir):
    """ES percentiles_bucket pipeline aggregation: interpolated
    p25/p50/p75/p90 of the per-day event counts — 'what does a typical
    day look like'. Integer bucket counts + the same linear
    interpolation rule on both engines (Spark percentile ≡ DuckDB
    quantile_cont) make this exact; the percentile pass sees one row
    per calendar day."""
    daily = _daily_counts(spark, sf_dir)
    return daily.agg(
        F.count("*").cast("long").alias("n_buckets"),
        F.round(F.expr("percentile(cnt, 0.25D)"), 6).alias("p25"),
        F.round(F.expr("percentile(cnt, 0.5D)"), 6).alias("p50"),
        F.round(F.expr("percentile(cnt, 0.75D)"), 6).alias("p75"),
        F.round(F.expr("percentile(cnt, 0.9D)"), 6).alias("p90"),
    )


O_PERCENTILES_BUCKET = f"""
WITH {O_DAILY_CTE}
SELECT count(*)::bigint AS n_buckets,
       round(quantile_cont(cnt, 0.25), 6) AS p25,
       round(quantile_cont(cnt, 0.5), 6) AS p50,
       round(quantile_cont(cnt, 0.75), 6) AS p75,
       round(quantile_cont(cnt, 0.9), 6) AS p90
FROM d
"""


def q_anova_value(spark, sf_dir):
    """One-way ANOVA of event value across event types (the 'does the
    metric differ by segment' test an experimentation platform runs):
    F statistic and effect size η² from the sum-of-squares identities
    SSB = Σ S_g²/n_g − T²/n, SSW = Q − Σ S_g²/n_g. Every S_g, Q, T is
    an EXACT int64 cent-sum (one map-side-combined groupBy over the
    fact table; k+1 rows thereafter), so both engines run the same
    float ops on identical integers — deterministic to the 6dp
    rounding."""
    cents = F.round(F.col("value") * 100).cast("long")
    g = (
        _events(spark, sf_dir)
        .select("event_type", cents.alias("_c"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_g"),
            F.sum("_c").alias("s_g"),
            F.sum(F.col("_c") * F.col("_c")).alias("q_g"),
        )
    )
    k = F.count("*").cast("long")
    n = F.sum("n_g").cast("long")
    t = F.sum("s_g").cast("double")
    q = F.sum("q_g").cast("double")
    within = F.sum(
        F.col("s_g").cast("double") * F.col("s_g") / F.col("n_g")
    )
    ssb = within - t * t / n
    ssw = q - within
    return g.agg(
        k.alias("k_groups"),
        n.alias("n_rows"),
        F.round((ssb / (k - 1)) / (ssw / (n - k)), 6).alias("f_stat"),
        F.round(ssb / (q - t * t / n), 6).alias("eta_sq"),
    )


O_ANOVA_VALUE = """
WITH g AS (SELECT event_type, count(*)::bigint AS n_g,
                  sum(round(value * 100)::bigint) AS s_g,
                  sum(round(value * 100)::bigint
                      * round(value * 100)::bigint) AS q_g
           FROM events GROUP BY 1),
a AS (SELECT count(*)::bigint AS k, sum(n_g)::bigint AS n,
             sum(s_g)::double AS t, sum(q_g)::double AS q,
             sum(s_g::double * s_g / n_g) AS w
      FROM g)
SELECT k AS k_groups, n AS n_rows,
       round(((w - t * t / n) / (k - 1))
             / ((q - w) / (n - k)), 6) AS f_stat,
       round((w - t * t / n) / (q - t * t / n), 6) AS eta_sq
FROM a
"""


def q_cramers_v(spark, sf_dir):
    """Cramér's V association between event type and day-of-week (the
    'is traffic mix weekday-dependent' check): χ² over the k×7
    contingency table INCLUDING structurally-empty cells (zero observed
    still contributes its expectation), then V = √(χ²/(n·min(r−1,c−1))).
    The table is built with one fact groupBy; the dense cell grid is a
    tiny dim×dim cross join. Weekday = epoch-day mod 7, the repo's
    timezone-free convention."""
    sec = F.col("ts").cast("timestamp").cast("long")
    obs = (
        _events(spark, sf_dir)
        .select(
            "event_type",
            (F.floor(sec / 86400) % 7).cast("long").alias("dow"),
        )
        .groupBy("event_type", "dow")
        .agg(F.count("*").cast("long").alias("o"))
    )
    rows = obs.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols = obs.groupBy("dow").agg(F.sum("o").alias("ct"))
    grid = rows.crossJoin(cols)
    cells = grid.join(obs, ["event_type", "dow"], "left").withColumn(
        "o", F.coalesce(F.col("o"), F.lit(0))
    )
    # chi2 per cell needs the global n: total is a constant once the
    # grid exists — fold it via a 1-row broadcast.
    tot = cells.agg(
        F.sum("o").cast("long").alias("_n"),
        F.countDistinct("event_type").cast("long").alias("_r"),
        F.countDistinct("dow").cast("long").alias("_c"),
    )
    cc = cells.crossJoin(F.broadcast(tot))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("_n")
    chi2 = F.sum((F.col("o") - e) * (F.col("o") - e) / e)
    dmin = F.least(F.max("_r") - 1, F.max("_c") - 1).cast("double")
    return cc.agg(
        F.max("_n").alias("n_rows"),
        F.round(chi2, 6).alias("chi2"),
        F.round(F.sqrt(chi2 / (F.max("_n") * dmin)), 6).alias("cramers_v"),
    )


O_CRAMERS_V = """
WITH obs AS (SELECT event_type,
                    (floor(floor(epoch(ts))::bigint / 86400) % 7)::bigint
                      AS dow,
                    count(*)::bigint AS o
             FROM events GROUP BY 1, 2),
r AS (SELECT event_type, sum(o)::bigint AS rt FROM obs GROUP BY 1),
c AS (SELECT dow, sum(o)::bigint AS ct FROM obs GROUP BY 1),
cells AS (SELECT r.event_type, c.dow, r.rt, c.ct,
                 coalesce(o.o, 0)::bigint AS o
          FROM r CROSS JOIN c
          LEFT JOIN obs o ON o.event_type = r.event_type
                         AND o.dow = c.dow),
tot AS (SELECT sum(o)::bigint AS n,
               count(DISTINCT event_type)::bigint AS nr,
               count(DISTINCT dow)::bigint AS nc
        FROM cells)
SELECT max(n)::bigint AS n_rows,
       round(sum((o - rt::double * ct / n) * (o - rt::double * ct / n)
                 / (rt::double * ct / n)), 6) AS chi2,
       round(sqrt(sum((o - rt::double * ct / n)
                      * (o - rt::double * ct / n)
                      / (rt::double * ct / n))
                  / (max(n) * least(max(nr) - 1, max(nc) - 1))), 6)
         AS cramers_v
FROM cells CROSS JOIN tot
"""


def q_spearman_qty_price(spark, sf_dir):
    """Spearman rank correlation between quantity and price per
    returnflag (the monotone-association twin of the Pearson in
    stats_moments — robust to the price tail). Average ranks carry as
    EXACT integers via 2·avgrank = 2·rank + ties − 1 (rank/count
    windows partitioned by flag, so each flag's ranking shuffles
    independently); ρ comes from the 6 exact int64 rank sums per flag
    — both engines run identical float ops on identical integers."""
    li = _lineitem(spark, sf_dir)
    v = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_quantity")).cast("long").alias("_q"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("_p"),
    )
    r2 = lambda c: (  # noqa: E731
        2 * F.rank().over(Window.partitionBy("flag").orderBy(c))
        + F.count("*").over(Window.partitionBy("flag", c))
        - 1
    ).cast("long")
    r = v.select(
        "flag", r2("_q").alias("rx"), r2("_p").alias("ry")
    )
    s = r.groupBy("flag").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("rx").alias("sx"),
        F.sum("ry").alias("sy"),
        F.sum(F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("rx") * F.col("ry")).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    num = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(
        "flag", "n", F.round(num / den, 6).alias("spearman_rho")
    ).orderBy("flag")


O_SPEARMAN_QTY_PRICE = """
WITH v AS (SELECT l_returnflag AS flag,
                  round(l_quantity)::bigint AS q,
                  round(l_extendedprice * 100)::bigint AS p
           FROM lineitem),
r AS (SELECT flag,
             (2 * rank() OVER (PARTITION BY flag ORDER BY q)
              + count(*) OVER (PARTITION BY flag, q) - 1)::bigint AS rx,
             (2 * rank() OVER (PARTITION BY flag ORDER BY p)
              + count(*) OVER (PARTITION BY flag, p) - 1)::bigint AS ry
      FROM v),
s AS (SELECT flag, count(*)::bigint AS n,
             sum(rx)::bigint AS sx, sum(ry)::bigint AS sy,
             sum(rx * rx)::bigint AS sxx, sum(ry * ry)::bigint AS syy,
             sum(rx * ry)::bigint AS sxy
      FROM r GROUP BY 1)
SELECT flag, n,
       round((n::double * sxy - sx::double * sy)
             / sqrt((n::double * sxx - sx::double * sx)
                    * (n::double * syy - sy::double * sy)), 6)
         AS spearman_rho
FROM s ORDER BY flag
"""


ACF_LAGS = [1, 2, 3, 7]


def q_acf_daily(spark, sf_dir):
    """Autocorrelation function of the daily event count at lags
    {ACF_LAGS} (the seasonality detector feeding seasonal_decompose's
    period choice). Lags are BUCKET positions (row_number over the day
    histogram), matching ES serial_diff convention. The whole
    computation reduces to integer sums — n²·num and n·den clear every
    division, so acf = [n²Sxy − nT(Sx+Sy) + KT²] / [n(nQ − T²)] is one
    float division over exact int64s. The lagged self-join runs on the
    calendar-sized histogram, never on raw events."""
    daily = _daily_counts(spark, sf_dir)
    w = Window.orderBy("day")
    d = daily.select(
        F.row_number().over(w).alias("rn"), "cnt"
    )
    tot = d.agg(
        F.count("*").cast("long").alias("_n"),
        F.sum("cnt").cast("long").alias("_t"),
        F.sum(F.col("cnt") * F.col("cnt")).cast("long").alias("_q"),
    )
    lags = spark.createDataFrame([(lg,) for lg in ACF_LAGS], "lag long")
    a = d.alias("a")
    b = d.alias("b")
    pairs = lags.crossJoin(a).join(
        b, F.col("b.rn") == F.col("a.rn") + F.col("lag")
    )
    s = pairs.groupBy("lag").agg(
        F.count("*").cast("long").alias("k_pairs"),
        F.sum(F.col("a.cnt") * F.col("b.cnt")).cast("long").alias("sxy"),
        F.sum(F.col("a.cnt")).cast("long").alias("sx"),
        F.sum(F.col("b.cnt")).cast("long").alias("sy"),
    )
    sc = s.crossJoin(F.broadcast(tot))
    nd = F.col("_n").cast("double")
    num = (
        nd * nd * F.col("sxy")
        - nd * F.col("_t") * (F.col("sx") + F.col("sy"))
        + F.col("k_pairs").cast("double") * F.col("_t") * F.col("_t")
    )
    den = nd * (nd * F.col("_q") - F.col("_t").cast("double") * F.col("_t"))
    return sc.select(
        "lag", "k_pairs", F.round(num / den, 6).alias("acf")
    ).orderBy("lag")


O_ACF_DAILY = f"""
WITH {O_DAILY_CTE},
dr AS (SELECT row_number() OVER (ORDER BY day) AS rn, cnt FROM d),
tot AS (SELECT count(*)::bigint AS n, sum(cnt)::bigint AS t,
               sum(cnt * cnt)::bigint AS q
        FROM dr),
lags AS (SELECT unnest({ACF_LAGS}) AS lag),
s AS (SELECT lag, count(*)::bigint AS k_pairs,
             sum(a.cnt * b.cnt)::bigint AS sxy,
             sum(a.cnt)::bigint AS sx, sum(b.cnt)::bigint AS sy
      FROM lags, dr a, dr b
      WHERE b.rn = a.rn + lag
      GROUP BY 1)
SELECT lag, k_pairs,
       round((n::double * n * sxy - n::double * t * (sx + sy)
              + k_pairs::double * t * t)
             / (n::double * (n::double * q - t::double * t)), 6) AS acf
FROM s CROSS JOIN tot ORDER BY lag
"""


def q_holt_forecast(spark, sf_dir):
    """ES moving_fn(MovingFunctions.holt, α=0.5, β=0.5) — double
    exponential smoothing over the daily value-sum histogram, the trend
    step up from event_ewma: per day the running level, trend, and
    one-step forecast (level + trend). The two-state recurrence
    l_i = α·x_i + (1−α)(l_{i−1}+t_{i−1}),
    t_i = β(l_i − l_{i−1}) + (1−β)t_{i−1} folds IN DAY ORDER over the
    bucket array with a STRUCT accumulator (Spark `aggregate` HOF,
    init l=x₁,t=0), exactly the event_ewma contract extended to two
    states; α=β=0.5 keeps every step an exact binary operation on
    exact-cents daily sums. The oracle uses a recursive CTE instead of
    `list_reduce` — DuckDB 1.0 struct accumulators alias fields in
    declaration order (a later field reads the already-overwritten
    earlier one), so multi-state folds are only safe row-recursive
    there. Histogram-sized work only after the one data-sized
    groupBy."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(
            F.floor(sec / 86400).cast("long").alias("day"),
            cents.alias("_c"),
        )
        .groupBy("day")
        .agg(F.sum("_c").alias("s"))
    )
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "s"))).alias("a")
    )
    ex = arr.select("a", F.posexplode("a").alias("pos", "e"))
    prefix = F.transform(
        F.slice(F.col("a"), 1, F.col("pos") + 1),
        lambda e: e["s"].cast("double"),
    )
    init = F.struct(
        F.lit(None).cast("double").alias("l"), F.lit(0.0).alias("t")
    )

    def step(acc, x):
        nl = 0.5 * x + 0.5 * (acc["l"] + acc["t"])
        nt = 0.5 * (nl - acc["l"]) + 0.5 * acc["t"]
        return F.when(
            acc["l"].isNull(),
            F.struct(x.alias("l"), F.lit(0.0).alias("t")),
        ).otherwise(F.struct(nl.alias("l"), nt.alias("t")))

    fold = F.aggregate(prefix, init, step)
    return ex.select(
        F.col("e.day").alias("day"),
        (F.col("e.s").cast("double") / 100.0).alias("raw"),
        F.round(fold["l"] / 100.0, 6).alias("level"),
        F.round(fold["t"] / 100.0, 6).alias("trend"),
        F.round((fold["l"] + fold["t"]) / 100.0, 6).alias("forecast"),
    ).orderBy("day")


O_HOLT_FORECAST = """
WITH RECURSIVE
daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                 sum(round(value * 100)::bigint)::bigint AS s
          FROM events GROUP BY 1),
dr AS (SELECT row_number() OVER (ORDER BY day) AS rn, day, s FROM daily),
h AS (
  SELECT rn, day, s, s::double AS l, 0.0::double AS t
  FROM dr WHERE rn = 1
  UNION ALL
  SELECT d.rn, d.day, d.s,
         0.5 * d.s + 0.5 * (h.l + h.t),
         0.5 * ((0.5 * d.s + 0.5 * (h.l + h.t)) - h.l) + 0.5 * h.t
  FROM h JOIN dr d ON d.rn = h.rn + 1)
SELECT day, s::double / 100.0 AS raw,
       round(l / 100.0, 6) AS level,
       round(t / 100.0, 6) AS trend,
       round((l + t) / 100.0, 6) AS forecast
FROM h ORDER BY day
"""


TRI_VOCAB = 150
TRI_MIN_DF = 5
TRI_MIN_CODOCS = 3
TRI_MIN_LIFT = 1.05


def _lift_edges(spark, sf_dir):
    """Shared term-association graph: undirected edges (u < v) between
    top-{TRI_VOCAB} by-df terms whose co-occurrence LIFT (observed
    co-docs / independence expectation df_u·df_v/n) clears
    {TRI_MIN_LIFT} with ≥ {TRI_MIN_CODOCS} co-docs. Raw co-occurrence
    alone saturates to a complete graph on any head-heavy vocabulary;
    lift keeps only genuinely-correlated pairs. Plan: distinct doc→term
    pairs, a per-doc self-join restricted to the broadcast bounded
    vocabulary (fanout ≤ C(vocab,2), never data²), lift rounded to 6dp
    BEFORE the threshold compare (the repo's cross-engine selection
    rule)."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    dt = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
        .distinct()
    )
    nd = dt.agg(F.countDistinct("doc_id").cast("long").alias("_nd"))
    vocab = (
        dt.groupBy("term")
        .agg(F.count("*").cast("long").alias("df"))
        .filter(F.col("df") >= TRI_MIN_DF)
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(TRI_VOCAB)
    )
    dtv = dt.join(F.broadcast(vocab.select("term")), "term")
    a = dtv.alias("a")
    b = dtv.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.term") < F.col("b.term")),
        )
        .groupBy(F.col("a.term").alias("u"), F.col("b.term").alias("v"))
        .agg(F.count("*").cast("long").alias("codocs"))
    )
    du = vocab.select(
        F.col("term").alias("u"), F.col("df").alias("_dfu")
    )
    dv = vocab.select(
        F.col("term").alias("v"), F.col("df").alias("_dfv")
    )
    lift = F.round(
        F.col("codocs").cast("double")
        * F.col("_nd")
        / (F.col("_dfu").cast("double") * F.col("_dfv")),
        6,
    )
    return (
        co.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .crossJoin(F.broadcast(nd))
        .filter(
            (F.col("codocs") >= TRI_MIN_CODOCS) & (lift >= TRI_MIN_LIFT)
        )
        .select("u", "v")
    )


def q_triangle_count(spark, sf_dir):
    """Graph analytics over the lift-edged term association graph (see
    _lift_edges): the global triangle census — nodes/edges/wedges/
    triangles + transitivity = 3Δ/wedges. Spark shape is the standard
    distributed triangle count: edges materialize once (persisted),
    each triangle counted once via a<b<c edge orientation — the
    ordering trick that bounds the join; wedges come from the exact
    degree sum Σd(d−1)/2."""
    edges = _lift_edges(spark, sf_dir).persist()
    deg = (
        edges.select(F.col("u").alias("t"))
        .union(edges.select(F.col("v").alias("t")))
        .groupBy("t")
        .agg(F.count("*").alias("d"))
    )
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.v") == F.col("e2.u"))
        .join(
            e3,
            (F.col("e3.u") == F.col("e1.u"))
            & (F.col("e3.v") == F.col("e2.v")),
        )
        .agg(F.count("*").cast("long").alias("n_triangles"))
    )
    summary = deg.agg(
        F.count("*").cast("long").alias("n_nodes"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2)
        .cast("long")
        .alias("n_wedges"),
    ).crossJoin(edges.agg(F.count("*").cast("long").alias("n_edges")))
    out = summary.crossJoin(F.broadcast(tri)).select(
        "n_nodes",
        "n_edges",
        "n_wedges",
        "n_triangles",
        F.round(
            3.0 * F.col("n_triangles") / F.col("n_wedges"), 6
        ).alias("transitivity"),
    )
    return out


O_LIFT_EDGES_CTES = f"""dt AS MATERIALIZED (SELECT DISTINCT doc_id, unnest({TOK_SQL}) AS term
            FROM documents),
nd AS (SELECT count(DISTINCT doc_id)::bigint AS n FROM dt),
vocab AS MATERIALIZED (SELECT term, count(*)::bigint AS df FROM dt GROUP BY term
          HAVING count(*) >= {TRI_MIN_DF}
          ORDER BY df DESC, term ASC LIMIT {TRI_VOCAB}),
dtv AS MATERIALIZED (SELECT dt.doc_id, dt.term FROM dt JOIN vocab USING (term)),
co AS MATERIALIZED (SELECT a.term AS u, b.term AS v, count(*)::bigint AS codocs
       FROM dtv a JOIN dtv b
         ON a.doc_id = b.doc_id AND a.term < b.term
       GROUP BY 1, 2),
edges AS MATERIALIZED (SELECT u, v
          FROM co, nd, vocab du, vocab dv
          WHERE du.term = co.u AND dv.term = co.v
            AND codocs >= {TRI_MIN_CODOCS}
            AND round(codocs::double * n / (du.df::double * dv.df), 6)
                >= {TRI_MIN_LIFT})"""


O_TRIANGLE_COUNT = f"""
WITH {O_LIFT_EDGES_CTES},
deg AS (SELECT t, count(*)::bigint AS d
        FROM (SELECT u AS t FROM edges
              UNION ALL SELECT v AS t FROM edges)
        GROUP BY 1),
tri AS (SELECT count(*)::bigint AS n_triangles
        FROM edges e1
        JOIN edges e2 ON e1.v = e2.u
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v),
s AS (SELECT count(*)::bigint AS n_nodes,
             (sum(d * (d - 1)) / 2)::bigint AS n_wedges
      FROM deg),
ec AS (SELECT count(*)::bigint AS n_edges FROM edges)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       round(3.0 * n_triangles / n_wedges, 6) AS transitivity
FROM s CROSS JOIN ec CROSS JOIN tri
"""


LPA_ROUNDS = 3


def q_label_propagation(spark, sf_dir):
    """Community detection on the lift-edged term association graph
    (see _lift_edges): {LPA_ROUNDS} rounds of SYNCHRONOUS label
    propagation — every node simultaneously adopts the most frequent
    label among its neighbors, ties broken by minimum label (Raghavan
    et al. 2007, made deterministic: no random order, no random
    tie-break). Output is the community size histogram. Spark shape:
    each round is one adjacency⋈labels join + one (node, label) count
    + one per-node WindowGroupLimit argmax — the round count is fixed
    and small, so the lineage stays bounded (at real scale you'd
    checkpoint between rounds; 3 rounds needs none)."""
    _, labels = _lpa_final_labels(spark, sf_dir)
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(F.count("*").cast("long").alias("size"))
        .orderBy(F.desc("size"), F.asc("community"))
    )


def _lpa_final_labels(spark, sf_dir):
    """(edges, labels) after {LPA_ROUNDS} synchronous LPA rounds over
    the lift-edged term graph — shared by label_propagation and
    modularity_score."""
    edges = _lift_edges(spark, sf_dir).persist()
    adj = edges.union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).toDF("t", "nb").persist()
    labels = adj.select("t").distinct().withColumn("label", F.col("t"))
    w = Window.partitionBy("t").orderBy(F.desc("c"), F.asc("label"))
    for _ in range(LPA_ROUNDS):
        cand = (
            adj.join(
                labels.select(F.col("t").alias("nb"), "label"), "nb"
            )
            .groupBy("t", "label")
            .agg(F.count("*").alias("c"))
        )
        labels = (
            cand.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("t", "label")
        )
    return edges, labels


def q_modularity_score(spark, sf_dir):
    """Newman modularity of the LPA communities (Newman & Girvan 2004
    — the quality score every community detector reports): per
    community c, Q_c = e_c/m − (d_c/2m)², with e_c intra-community
    edges, d_c total degree, m the edge count. All three are exact
    integer counts folded over the BOUNDED edge list (≤ C(vocab,2)
    rows), so the final IEEE formula is engine-identical. Spark shape:
    two broadcast label joins onto the edge list + one degree union —
    nothing ∝ corpus after the shared _lift_edges job."""
    edges, labels = _lpa_final_labels(spark, sf_dir)
    lab = labels.select(F.col("t"), F.col("label"))
    m_df = edges.agg(F.count("*").cast("long").alias("_m"))
    intra = (
        edges.join(
            F.broadcast(lab.toDF("u", "_lu")), "u"
        )
        .join(F.broadcast(lab.toDF("v", "_lv")), "v")
        .filter(F.col("_lu") == F.col("_lv"))
        .groupBy(F.col("_lu").alias("community"))
        .agg(F.count("*").cast("long").alias("intra_edges"))
    )
    deg = (
        edges.select(F.col("u").alias("t"))
        .union(edges.select(F.col("v").alias("t")))
        .join(F.broadcast(lab), "t")
        .groupBy(F.col("label").alias("community"))
        .agg(F.count("*").cast("long").alias("degree"))
    )
    half = F.col("degree").cast("double") / (
        F.lit(2) * F.col("_m")
    ).cast("double")
    return (
        deg.join(intra, "community", "left")
        .crossJoin(F.broadcast(m_df))
        .select(
            "community",
            F.coalesce(F.col("intra_edges"), F.lit(0)).cast("long").alias(
                "intra_edges"
            ),
            "degree",
            (
                F.coalesce(F.col("intra_edges"), F.lit(0)).cast("double")
                / F.col("_m").cast("double")
                - half * half
            ).alias("modularity"),
        )
        .orderBy("community")
    )


def _lpa_round_ctes() -> str:
    parts = [
        "adj AS MATERIALIZED (SELECT u AS t, v AS nb FROM edges "
        "UNION ALL SELECT v, u FROM edges)",
        "l0 AS MATERIALIZED (SELECT DISTINCT t, t AS label FROM adj)",
    ]
    for r in range(1, LPA_ROUNDS + 1):
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT adj.t, lp.label, count(*) AS c\n"
            f"      FROM adj JOIN l{r - 1} lp ON lp.t = adj.nb"
            " GROUP BY 1, 2)"
        )
        parts.append(
            f"l{r} AS MATERIALIZED (SELECT t, label FROM (\n"
            "      SELECT t, label, row_number() OVER (PARTITION BY t"
            " ORDER BY c DESC, label ASC) AS rn\n"
            f"      FROM c{r}) WHERE rn = 1)"
        )
    return ",\n".join(parts)


O_LABEL_PROPAGATION = f"""
WITH {O_LIFT_EDGES_CTES},
{_lpa_round_ctes()}
SELECT label AS community, count(*)::bigint AS size
FROM l{LPA_ROUNDS} GROUP BY 1 ORDER BY size DESC, community ASC
"""


O_MODULARITY_SCORE = f"""
WITH {O_LIFT_EDGES_CTES},
{_lpa_round_ctes()},
lab AS MATERIALIZED (SELECT t, label FROM l{LPA_ROUNDS}),
mm AS (SELECT count(*)::bigint AS m FROM edges),
intra AS (SELECT lu.label AS community, count(*)::bigint AS e
          FROM edges
          JOIN lab lu ON u = lu.t
          JOIN lab lv ON v = lv.t AND lu.label = lv.label
          GROUP BY 1),
deg AS (SELECT label AS community, count(*)::bigint AS d
        FROM (SELECT u AS t FROM edges UNION ALL SELECT v AS t FROM edges) e
        JOIN lab ON e.t = lab.t GROUP BY 1)
SELECT community, coalesce(e, 0)::bigint AS intra_edges, d AS degree,
       coalesce(e, 0)::double / m::double
         - (d::double / (2 * m)::double) * (d::double / (2 * m)::double)
         AS modularity
FROM deg LEFT JOIN intra USING (community) CROSS JOIN mm
ORDER BY community
"""


KCORE_K = 12
KCORE_ROUNDS = 3


def q_kcore_peel(spark, sf_dir):
    """k-core decomposition trajectory on the lift-edged term graph
    (the density-skeleton view next to triangle_count/
    label_propagation): {KCORE_ROUNDS} synchronous peeling rounds --
    every round simultaneously removes nodes with CURRENT degree <
    {KCORE_K} -- reporting (round, nodes, edges) after each peel. The
    edge list is BOUNDED by construction (<= C({TRI_VOCAB},2) rows from
    the vocab cap), so after the ONE distributed edge job the peel runs
    driver-side over the collected list -- six distributed actions of
    re-planned semi-joins measured 38 s at sf0.1 for a graph that fits
    in a Python set (for an UNBOUNDED graph the same rounds are
    degree-aggregate + semi-join pairs with a checkpoint per round)."""
    from nlp4l_spark.plans.caps import assert_driver_cap

    edge_rows = [
        (r["u"], r["v"]) for r in _lift_edges(spark, sf_dir).collect()
    ]
    # executable precondition for the driver-side peel (plans/caps.py)
    assert_driver_cap(
        len(edge_rows), TRI_VOCAB * (TRI_VOCAB - 1) // 2, "kcore_peel edges"
    )
    out_rows = []
    cur = set(edge_rows)
    for rnd in range(1, KCORE_ROUNDS + 1):
        deg: dict[str, int] = {}
        for u, v in cur:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        keep = {t for t, d in deg.items() if d >= KCORE_K}
        cur = {(u, v) for u, v in cur if u in keep and v in keep}
        nodes = len({t for e in cur for t in e})
        out_rows.append((rnd, nodes, len(cur)))
    return spark.createDataFrame(
        out_rows, "round long, nodes long, edges long"
    ).orderBy("round")


def _o_kcore() -> str:
    parts = [f"e0 AS MATERIALIZED (SELECT u, v FROM edges)"]
    for r in range(1, KCORE_ROUNDS + 1):
        parts.append(
            f"d{r} AS MATERIALIZED (SELECT t, count(*) AS d FROM (\n"
            f"      SELECT u AS t FROM e{r - 1}"
            f" UNION ALL SELECT v FROM e{r - 1}) GROUP BY 1)"
        )
        parts.append(
            f"k{r} AS MATERIALIZED (SELECT t FROM d{r} WHERE d >= {KCORE_K})"
        )
        parts.append(
            f"e{r} AS MATERIALIZED (SELECT u, v FROM e{r - 1}\n"
            f"      WHERE u IN (SELECT t FROM k{r})"
            f" AND v IN (SELECT t FROM k{r}))"
        )
        parts.append(
            f"s{r} AS (SELECT {r}::bigint AS round,\n"
            f"      (SELECT count(DISTINCT t) FROM (SELECT u AS t FROM e{r}"
            f" UNION ALL SELECT v FROM e{r}))::bigint AS nodes,\n"
            f"      (SELECT count(*) FROM e{r})::bigint AS edges)"
        )
    sel = " UNION ALL ".join(
        f"SELECT * FROM s{r}" for r in range(1, KCORE_ROUNDS + 1)
    )
    return ",\n".join(parts) + f"\n{sel} ORDER BY round"


O_KCORE_PEEL = f"""
WITH {O_LIFT_EDGES_CTES},
{_o_kcore()}
"""


EIG_ROUNDS = 2
EIG_TOP = 10


def q_eigencentrality(spark, sf_dir):
    """Eigenvector centrality on the lift-edged term graph ({EIG_ROUNDS}
    unrolled power iterations, max-normalized each round — the
    undamped sibling of textrank's PageRank): x ← A·x / max(A·x),
    started from all-ones. Scores are integer-valued until the single
    normalizing division per round (the max is exact), so the fold is
    engine-exact; top-{EIG_TOP} by 6dp-rounded score, term-asc ties.
    Each round is one adjacency⋈scores join + one sum — graph-sized."""
    edges = _lift_edges(spark, sf_dir).persist()
    adj = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).toDF("t", "nb")
    scores = adj.select("t").distinct().withColumn(
        "x", F.lit(1.0)
    )
    for _ in range(EIG_ROUNDS):
        nxt = (
            adj.join(
                scores.select(F.col("t").alias("nb"), "x"), "nb"
            )
            .groupBy("t")
            .agg(F.sum("x").alias("_ax"))
        )
        mx = nxt.agg(F.max("_ax").alias("_mx"))
        scores = nxt.crossJoin(F.broadcast(mx)).select(
            "t", (F.col("_ax") / F.col("_mx")).alias("x")
        )
    return (
        scores.select("t", F.round("x", 6).alias("centrality"))
        .orderBy(F.desc("centrality"), F.asc("t"))
        .limit(EIG_TOP)
    )


def _o_eig() -> str:
    parts = [
        "adj AS MATERIALIZED (SELECT u AS t, v AS nb FROM edges"
        " UNION ALL SELECT v, u FROM edges)",
        "x0 AS MATERIALIZED (SELECT DISTINCT t, 1.0::double AS x FROM adj)",
    ]
    for r in range(1, EIG_ROUNDS + 1):
        parts.append(
            f"a{r} AS MATERIALIZED (SELECT adj.t, sum(xp.x) AS ax\n"
            f"      FROM adj JOIN x{r - 1} xp ON xp.t = adj.nb"
            " GROUP BY 1)"
        )
        parts.append(
            f"x{r} AS MATERIALIZED (SELECT t, ax / (SELECT max(ax) FROM a{r}) AS x"
            f" FROM a{r})"
        )
    return ",\n".join(parts)


O_EIGENCENTRALITY = f"""
WITH {O_LIFT_EDGES_CTES},
{_o_eig()}
SELECT t, round(x, 6) AS centrality
FROM x{EIG_ROUNDS}
ORDER BY centrality DESC, t ASC LIMIT {EIG_TOP}
"""


KMEANS_K = 4
KMEANS_ROUNDS = 3


def q_kmeans_1d(spark, sf_dir):
    """Lloyd's k-means as a pure DataFrame program (1-D, k={KMEANS_K},
    {KMEANS_ROUNDS} unrolled rounds — the deterministic core of the ES
    variable_width_histogram agg): seeds are the exact interpolated
    odd-eighth quantiles of event cents (spread, deterministic);
    each round assigns every value to the nearest centroid (tie →
    lower cluster id) and recomputes centroids as exact-cents means.
    Assignment is a codegen expression per row (k comparisons — no
    crossJoin row blowup), centroid updates are k-row aggregates; the
    only data-sized work per round is one scan+groupBy, the canonical
    distributed k-means shape. Output: cluster, n, centroid, min, max."""
    cents = F.round(F.col("value") * 100).cast("long")
    v = _events(spark, sf_dir).select(cents.alias("x"))
    seeds_row = v.agg(
        *[
            F.expr(f"percentile(x, {(2 * i + 1) / (2.0 * KMEANS_K)}D)").alias(
                f"c{i}"
            )
            for i in range(KMEANS_K)
        ]
    ).collect()[0]
    centroids = [float(seeds_row[f"c{i}"]) for i in range(KMEANS_K)]

    def assign_col(cs):
        best_i = F.lit(0)
        best_d = F.abs(F.col("x").cast("double") - F.lit(cs[0]))
        for i in range(1, KMEANS_K):
            d = F.abs(F.col("x").cast("double") - F.lit(cs[i]))
            best_i = F.when(d < best_d, F.lit(i)).otherwise(best_i)
            best_d = F.when(d < best_d, d).otherwise(best_d)
        return best_i

    for _ in range(KMEANS_ROUNDS):
        agg = (
            v.withColumn("c", assign_col(centroids))
            .groupBy("c")
            .agg(F.sum("x").alias("s"), F.count("*").alias("n"))
            .collect()
        )
        upd = {int(r["c"]): float(r["s"]) / int(r["n"]) for r in agg}
        centroids = [
            upd.get(i, centroids[i]) for i in range(KMEANS_K)
        ]
    final = v.withColumn("c", assign_col(centroids))
    return (
        final.groupBy("c")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.round(
                F.sum("x").cast("double") / F.count("*") / 100.0, 6
            ).alias("centroid"),
            (F.min("x").cast("double") / 100.0).alias("min_value"),
            (F.max("x").cast("double") / 100.0).alias("max_value"),
        )
        .select(
            F.col("c").cast("long").alias("cluster"),
            "n",
            "centroid",
            "min_value",
            "max_value",
        )
        .orderBy("cluster")
    )


def _km_best_case() -> str:
    """argmin-with-lowest-index-tie over d0..d{{k-1}} as a nested CASE —
    provably equal to the Spark loop's strict-improvement fold."""
    best = "0"
    run = "d0"
    for i in range(1, KMEANS_K):
        best = f"CASE WHEN d{i} < least({run}) THEN {i} ELSE {best} END"
        run += f", d{i}"
    return best


def _km_assign_cte(name: str, src: str) -> str:
    d = ", ".join(
        f"abs(x::double - {src}.c{i}) AS d{i}" for i in range(KMEANS_K)
    )
    return (
        f"{name} AS MATERIALIZED (SELECT x, ({_km_best_case()}) AS c FROM\n"
        f"      (SELECT x, {d} FROM v CROSS JOIN {src}))"
    )


def _o_kmeans() -> str:
    seeds = ", ".join(
        f"quantile_cont(x, {(2 * i + 1) / (2.0 * KMEANS_K)!r}) AS c{i}"
        for i in range(KMEANS_K)
    )
    parts = [f"s0 AS MATERIALIZED (SELECT {seeds} FROM v)"]
    for r in range(1, KMEANS_ROUNDS + 1):
        prev = f"s{r - 1}"
        parts.append(_km_assign_cte(f"a{r}", prev))
        parts.append(
            f"g{r} AS (SELECT c, sum(x)::double AS s,"
            f" count(*)::double AS n FROM a{r} GROUP BY 1)"
        )
        upd = ", ".join(
            f"coalesce(max(CASE WHEN c = {i} THEN s END)"
            f" / max(CASE WHEN c = {i} THEN n END),"
            f" max({prev}.c{i})) AS c{i}"
            for i in range(KMEANS_K)
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT {upd} FROM g{r} CROSS JOIN {prev})"
        )
    parts.append(_km_assign_cte("final", f"s{KMEANS_ROUNDS}"))
    return ",\n".join(parts)


O_KMEANS_1D = f"""
WITH v AS MATERIALIZED (SELECT round(value * 100)::bigint AS x FROM events),
{_o_kmeans()}
SELECT c::bigint AS cluster, count(*)::bigint AS n,
       round(sum(x)::double / count(*) / 100.0, 6) AS centroid,
       min(x)::double / 100.0 AS min_value,
       max(x)::double / 100.0 AS max_value
FROM final GROUP BY 1 ORDER BY cluster
"""


KME_K = 8
KME_ROUNDS = 2


def q_kmeans_embeddings(spark, sf_dir):
    """Distributed k-means over the 64-dim embedding column (k={KME_K},
    {KME_ROUNDS} unrolled Lloyd rounds, euclidean) — the clustering
    primitive under IVF training, semantic dedup buckets, and topic
    discovery, expressed as the canonical Spark plan: centroids are a
    k-row BROADCAST, assignment is one codegen HOF distance argmin per
    vector (k distances — fanout ×k via the broadcast join, never
    data²), and the centroid update is one (cluster, dim) posexplode
    aggregate — vectors are never shuffled whole. Determinism: seeds
    are the first {KME_K} vectors (the ann_ivf_topk quantizer
    convention), distances are exact float64 expressions, ties break to
    the lower cluster id, and updated centroid components round to 6dp
    before the next round (the label_centroids order-independence
    rule). Output: per-cluster size, inertia (Σ squared distance,
    rounded), and centroid norm."""
    emb = _embeddings(spark, sf_dir)

    def sqdist(a, b):
        return F.aggregate(
            F.zip_with(
                a,
                b,
                lambda x, y: (x.cast("double") - y)
                * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    cents = emb.filter(F.col("vec_id") < KME_K).select(
        F.col("vec_id").cast("long").alias("cid"),
        F.transform(
            "embedding", lambda x: F.round(x.cast("double"), 6)
        ).alias("cv"),
    )
    for _ in range(KME_ROUNDS):
        wa = Window.partitionBy("vec_id").orderBy(
            F.asc("_d"), F.asc("cid")
        )
        assign = (
            emb.crossJoin(F.broadcast(cents))
            .withColumn("_d", sqdist(F.col("embedding"), F.col("cv")))
            .withColumn("_r", F.row_number().over(wa))
            .filter(F.col("_r") == 1)
            .select("vec_id", "embedding", "cid")
        )
        cents = (
            assign.select(
                "cid", F.posexplode("embedding").alias("pos", "v")
            )
            .groupBy("cid", "pos")
            .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "c"))),
                    lambda s: s["c"],
                ).alias("cv")
            )
        )
    wa = Window.partitionBy("vec_id").orderBy(F.asc("_d"), F.asc("cid"))
    final = (
        emb.crossJoin(F.broadcast(cents))
        .withColumn("_d", sqdist(F.col("embedding"), F.col("cv")))
        .withColumn("_r", F.row_number().over(wa))
        .filter(F.col("_r") == 1)
    )
    cnorm = F.sqrt(
        F.aggregate(
            F.transform("cv", lambda c: c * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    # per-vector distances fold as exact integer micros — a plain double
    # sum would be partition-order-dependent at the last ulp
    d_micro = F.round(F.col("_d") * 1e6).cast("long")
    return (
        final.groupBy("cid")
        .agg(
            F.count("*").cast("long").alias("n_vecs"),
            F.round(F.sum(d_micro).cast("double") / 1e6, 6).alias(
                "inertia"
            ),
            F.round(F.max(cnorm), 6).alias("centroid_norm"),
        )
        .select(
            F.col("cid").alias("cluster"),
            "n_vecs",
            "inertia",
            "centroid_norm",
        )
        .orderBy("cluster")
    )


def _sqdist_sql(a: str, b: str) -> str:
    return (
        f"list_aggregate(list_transform(range(1, len({a}) + 1),"
        f" i -> ({a}[i]::double - {b}[i]) * ({a}[i]::double - {b}[i])),"
        f" 'sum')"
    )


def _o_kme() -> str:
    parts = [
        f"""c0 AS MATERIALIZED (
  SELECT vec_id::bigint AS cid,
         list_transform(embedding, x -> round(x::double, 6)) AS cv
  FROM embeddings WHERE vec_id < {KME_K})"""
    ]
    for r in range(1, KME_ROUNDS + 1):
        prev = f"c{r - 1}"
        parts.append(
            f"""a{r} AS MATERIALIZED (
  SELECT vec_id, embedding, cid FROM (
    SELECT e.vec_id, e.embedding, {prev}.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_sqdist_sql("e.embedding", f"{prev}.cv")} ASC,
                      {prev}.cid ASC) AS rn
    FROM embeddings e CROSS JOIN {prev}) WHERE rn = 1)"""
        )
        parts.append(
            f"""u{r} AS MATERIALIZED (
  SELECT cid, i, round(avg(v), 6) AS c FROM (
    SELECT cid, z[1] AS i, z[2]::double AS v FROM (
      SELECT cid,
             unnest(list_zip(range(1, len(embedding) + 1), embedding))
               AS z
      FROM a{r}))
  GROUP BY 1, 2)"""
        )
        parts.append(
            f"c{r} AS MATERIALIZED (SELECT cid, list(c ORDER BY i) AS cv"
            f" FROM u{r} GROUP BY cid)"
        )
    return ",\n".join(parts)


O_KMEANS_EMBEDDINGS = f"""
WITH {_o_kme()},
final AS MATERIALIZED (
  SELECT vec_id, cid, d FROM (
    SELECT e.vec_id, c{KME_ROUNDS}.cid,
           {_sqdist_sql("e.embedding", f"c{KME_ROUNDS}.cv")} AS d,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY {_sqdist_sql("e.embedding", f"c{KME_ROUNDS}.cv")}
                      ASC, c{KME_ROUNDS}.cid ASC) AS rn
    FROM embeddings e CROSS JOIN c{KME_ROUNDS}) WHERE rn = 1),
norms AS (SELECT cid,
                 sqrt(list_aggregate(list_transform(cv, x -> x * x),
                                     'sum')) AS cn
          FROM c{KME_ROUNDS})
SELECT f.cid AS cluster, count(*)::bigint AS n_vecs,
       round(sum(round(f.d * 1e6)::bigint)::double / 1e6, 6) AS inertia,
       round(max(norms.cn), 6) AS centroid_norm
FROM final f JOIN norms USING (cid)
GROUP BY 1 ORDER BY cluster
"""


MI_MIN_DF = 5
MI_TOP = 20


def q_mutual_info_terms(spark, sf_dir):
    """Mutual-information feature selection (the information-theoretic
    sibling of CommonProcessor.selectFeatures' χ²): top-{MI_TOP} terms
    by I(presence; lang) = Σ_s Σ_{{b∈0,1}} (n_bs/N)·ln(n_bs·N/(n_b·n_s)),
    zero cells contributing 0 (x·ln x → 0). Needs the DENSE term×lang
    grid — a term ABSENT from a language still contributes through its
    absence cell — built as bounded-vocab × lang-count cross join with
    the observed joint left-joined on. All probabilities come from
    exact integer counts; MI is rounded to 6dp BEFORE the top-k
    selection (tie: term asc)."""
    dt = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", F.explode(
            STANDARD_ANALYZER.tokens_expr("text")
        ).alias("term"))
        .select("doc_id", "lang", "term")
        .distinct()
    )
    docs = _docs(spark, sf_dir)
    nn = docs.count()
    langs = (
        docs.groupBy("lang").agg(F.count("*").cast("long").alias("ns"))
    )
    tdf = (
        dt.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("n1"))
        .filter(F.col("n1") >= MI_MIN_DF)
    )
    joint = dt.groupBy("term", "lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n1s")
    )
    grid = (
        tdf.crossJoin(F.broadcast(langs))
        .join(joint, ["term", "lang"], "left")
        .withColumn("n1s", F.coalesce(F.col("n1s"), F.lit(0)))
    )
    N = F.lit(float(nn))
    n0 = nn - F.col("n1")
    n0s = F.col("ns") - F.col("n1s")
    mi_cell = lambda nbs, nb: F.when(  # noqa: E731
        (nbs > 0) & (nb > 0),
        (nbs.cast("double") / N)
        * F.log(
            nbs.cast("double")
            * N
            / (nb.cast("double") * F.col("ns"))
        ),
    ).otherwise(F.lit(0.0))
    mi = mi_cell(F.col("n1s"), F.col("n1")) + mi_cell(n0s, n0)
    return (
        grid.groupBy("term")
        .agg(F.round(F.sum(mi), 6).alias("mi"))
        .orderBy(F.desc("mi"), F.asc("term"))
        .limit(MI_TOP)
    )


O_MUTUAL_INFO_TERMS = f"""
WITH dt AS (SELECT DISTINCT d.doc_id, d.lang, t.term
            FROM documents d, unnest({TOK_SQL}) AS t(term)),
nd AS (SELECT count(*)::bigint AS nn FROM documents),
langs AS (SELECT lang, count(*)::bigint AS ns FROM documents GROUP BY 1),
tdf AS (SELECT term, count(DISTINCT doc_id)::bigint AS n1 FROM dt
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= {MI_MIN_DF}),
joint AS (SELECT term, lang, count(DISTINCT doc_id)::bigint AS n1s
          FROM dt GROUP BY 1, 2),
grid AS (SELECT tdf.term, langs.lang, tdf.n1, langs.ns,
                coalesce(joint.n1s, 0)::bigint AS n1s, nd.nn
         FROM tdf CROSS JOIN langs CROSS JOIN nd
         LEFT JOIN joint ON joint.term = tdf.term
                        AND joint.lang = langs.lang),
mi AS (SELECT term,
         round(sum(
           (CASE WHEN n1s > 0 AND n1 > 0 THEN
              (n1s::double / nn) * ln(n1s::double * nn / (n1::double * ns))
            ELSE 0 END)
           + (CASE WHEN (ns - n1s) > 0 AND (nn - n1) > 0 THEN
                ((ns - n1s)::double / nn)
                * ln((ns - n1s)::double * nn / ((nn - n1)::double * ns))
              ELSE 0 END)), 6) AS mi
       FROM grid GROUP BY 1)
SELECT term, mi FROM mi ORDER BY mi DESC, term ASC LIMIT {MI_TOP}
"""


BH_ALPHA = 0.05
BH_MIN_DF = 5


def q_bh_significant_terms(spark, sf_dir):
    """Benjamini–Hochberg FDR-controlled significant terms: χ² of term
    presence × language over the dense 2×L contingency grid (same grid
    as mutual_info_terms), EXACT p-values from the closed-form χ²
    survival at df = 4 (five fixture languages; even df ⇒
    S(x) = e^(−x/2)·Σ_{{i<df/2}} (x/2)^i/i!, here e^(−x/2)(1+x/2) — no
    incomplete-gamma needed), then the BH step-up rule: reject the
    smallest k* p-values where k* = max{{i : p_(i) ≤ α·i/m}},
    α = {BH_ALPHA}. Output: the top-10 hypotheses by rank with p, the
    BH critical value α·i/m, and the rejection flag — the synthetic
    fixture is null by construction (term presence ⫫ language), so
    the flag is honestly false there; a signal-bearing corpus flips
    it. The multiple-testing machinery is all window arithmetic over
    the m-sized p-vector; p is rounded to 9dp before ranking
    (cross-engine selection rule)."""
    dt = (
        _docs(spark, sf_dir)
        .select("doc_id", "lang", F.explode(
            STANDARD_ANALYZER.tokens_expr("text")
        ).alias("term"))
        .select("doc_id", "lang", "term")
        .distinct()
    )
    docs = _docs(spark, sf_dir)
    nn = docs.count()
    langs = docs.groupBy("lang").agg(
        F.count("*").cast("long").alias("ns")
    )
    tdf = (
        dt.groupBy("term")
        .agg(F.countDistinct("doc_id").cast("long").alias("n1"))
        .filter(F.col("n1") >= BH_MIN_DF)
    )
    joint = dt.groupBy("term", "lang").agg(
        F.countDistinct("doc_id").cast("long").alias("n1s")
    )
    grid = (
        tdf.crossJoin(F.broadcast(langs))
        .join(joint, ["term", "lang"], "left")
        .withColumn("n1s", F.coalesce(F.col("n1s"), F.lit(0)))
    )
    N = F.lit(float(nn))
    cell = lambda o, nb: F.when(  # noqa: E731
        nb > 0,
        (o.cast("double") - nb.cast("double") * F.col("ns") / N)
        * (o.cast("double") - nb.cast("double") * F.col("ns") / N)
        / (nb.cast("double") * F.col("ns") / N),
    ).otherwise(F.lit(0.0))
    chi = cell(F.col("n1s"), F.col("n1")) + cell(
        F.col("ns") - F.col("n1s"), nn - F.col("n1")
    )
    per_term = grid.groupBy("term").agg(F.sum(chi).alias("chi2"))
    p = F.round(
        F.exp(-F.col("chi2") / 2) * (1 + F.col("chi2") / 2), 9
    )
    ranked = per_term.select(
        "term", F.round("chi2", 6).alias("chi2"), p.alias("p_value")
    ).withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.asc("p_value"), F.asc("term"))),
    )
    m = ranked.agg(F.count("*").cast("long").alias("_m"))
    flagged = ranked.crossJoin(F.broadcast(m)).withColumn(
        "_ok",
        F.col("p_value") <= BH_ALPHA * F.col("rank") / F.col("_m"),
    )
    kstar = flagged.agg(
        F.max(F.when(F.col("_ok"), F.col("rank")).otherwise(F.lit(0)))
        .alias("_k")
    )
    return (
        flagged.crossJoin(F.broadcast(kstar))
        .select(
            "rank",
            "term",
            "chi2",
            "p_value",
            F.round(
                F.lit(BH_ALPHA) * F.col("rank") / F.col("_m"), 9
            ).alias("bh_critical"),
            (F.col("rank") <= F.col("_k")).alias("significant"),
        )
        .orderBy("rank")
        .limit(10)
    )


O_BH_SIGNIFICANT_TERMS = f"""
WITH dt AS (SELECT DISTINCT d.doc_id, d.lang, t.term
            FROM documents d, unnest({TOK_SQL}) AS t(term)),
nd AS (SELECT count(*)::bigint AS nn FROM documents),
langs AS (SELECT lang, count(*)::bigint AS ns FROM documents GROUP BY 1),
tdf AS (SELECT term, count(DISTINCT doc_id)::bigint AS n1 FROM dt
        GROUP BY 1 HAVING count(DISTINCT doc_id) >= {BH_MIN_DF}),
joint AS (SELECT term, lang, count(DISTINCT doc_id)::bigint AS n1s
          FROM dt GROUP BY 1, 2),
grid AS (SELECT tdf.term, langs.lang, tdf.n1, langs.ns,
                coalesce(joint.n1s, 0)::bigint AS n1s, nd.nn
         FROM tdf CROSS JOIN langs CROSS JOIN nd
         LEFT JOIN joint ON joint.term = tdf.term
                        AND joint.lang = langs.lang),
chi AS (SELECT term,
          sum(
            (CASE WHEN n1 > 0 THEN
               (n1s - n1::double * ns / nn) * (n1s - n1::double * ns / nn)
               / (n1::double * ns / nn) ELSE 0 END)
            + (CASE WHEN (nn - n1) > 0 THEN
                 ((ns - n1s) - (nn - n1)::double * ns / nn)
                 * ((ns - n1s) - (nn - n1)::double * ns / nn)
                 / ((nn - n1)::double * ns / nn) ELSE 0 END)) AS chi2
        FROM grid GROUP BY 1),
ranked AS (SELECT term, round(chi2, 6) AS chi2,
                  round(exp(-chi2 / 2) * (1 + chi2 / 2), 9) AS p_value
           FROM chi),
rk AS (SELECT term, chi2, p_value,
              row_number() OVER (ORDER BY p_value ASC, term ASC) AS rank,
              count(*) OVER () AS m
       FROM ranked),
ks AS (SELECT max(CASE WHEN p_value <= {BH_ALPHA} * rank / m
                  THEN rank ELSE 0 END) AS kstar
       FROM rk)
SELECT rank, term, chi2, p_value,
       round({BH_ALPHA} * rank / m, 9) AS bh_critical,
       (rank <= kstar) AS significant
FROM rk CROSS JOIN ks ORDER BY rank LIMIT 10
"""


def q_reply_latency(spark, sf_dir):
    """Inter-event reply latency per FOLLOWING event type: for each
    user's consecutive event pairs, the gap in seconds attributed to
    the second event's type, with exact interpolated median and p90
    (the 'how long until the next purchase' panel). ONE user-keyed
    window (lag) + one type-keyed percentile groupBy over integer
    seconds."""
    sec = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", sec.alias("_t")
    )
    gaps = e.select(
        "event_type",
        (F.col("_t") - F.lag("_t").over(w)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return (
        gaps.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_gaps"),
            F.round(F.expr("percentile(gap, 0.5D)"), 6).alias("median_gap_s"),
            F.round(F.expr("percentile(gap, 0.9D)"), 6).alias("p90_gap_s"),
        )
        .orderBy("event_type")
    )


O_REPLY_LATENCY = """
WITH e AS (SELECT user_id, event_id, event_type,
                  floor(epoch(ts))::bigint AS t FROM events),
g AS (SELECT event_type,
             t - lag(t) OVER (PARTITION BY user_id
                              ORDER BY t, event_id) AS gap
      FROM e)
SELECT event_type, count(*)::bigint AS n_gaps,
       round(quantile_cont(gap, 0.5), 6) AS median_gap_s,
       round(quantile_cont(gap, 0.9), 6) AS p90_gap_s
FROM g WHERE gap IS NOT NULL
GROUP BY 1 ORDER BY event_type
"""


def q_middle_out_truncate(spark, sf_dir):
    """Middle-out context truncation (ops/chatqc.middle_out_truncate —
    the 'lost in the middle' mitigation, Liu et al. 2023): keep the
    conversation's FIRST turn plus the longest later-turn suffix within
    the {CTX_BUDGET}-token budget; the middle drops first. Same
    single-shuffle window shape as q_truncate_context, with the
    first-turn anchor carried by an in-partition max-over."""
    from nlp4l_spark.ops.chatqc import middle_out_truncate

    return middle_out_truncate(_chat_turns(spark, sf_dir), budget=CTX_BUDGET)


O_MIDDLE_OUT_TRUNCATE = rf"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx,
        len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+'))::bigint
            AS n_tokens
      FROM chat),
s1 AS (SELECT conv_id, turn_idx, n_tokens,
        sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC
            ROWS UNBOUNDED PRECEDING) AS suffix,
        min(turn_idx) OVER (PARTITION BY conv_id) AS first_idx
       FROM t),
s AS (SELECT *,
        max(CASE WHEN turn_idx = first_idx THEN n_tokens END)
            OVER (PARTITION BY conv_id) AS first_tok
      FROM s1),
k AS (SELECT conv_id, turn_idx, n_tokens,
        (first_tok <= {CTX_BUDGET}
         AND (turn_idx = first_idx
              OR first_tok + suffix <= {CTX_BUDGET})) AS keep
      FROM s)
SELECT conv_id::bigint AS conv_id, count(*)::bigint AS n_turns,
       sum(n_tokens)::bigint AS total_tokens,
       sum(keep::bigint)::bigint AS kept_turns,
       coalesce(sum(n_tokens) FILTER (keep), 0)::bigint AS kept_tokens,
       (count(*) - sum(keep::bigint))::bigint AS dropped_middle
FROM k GROUP BY conv_id ORDER BY conv_id
"""


K_ANON = 20


def q_k_anonymity(spark, sf_dir):
    """k-anonymity report over the quasi-identifier pair (lang, source)
    — the privacy-release gate a corpus publisher runs: equivalence
    classes smaller than k={K_ANON} are re-identification risks. Output:
    the risky classes (size < k) plus their share of the corpus. One
    keyed groupBy + a broadcast-scalar total."""
    d = _docs(spark, sf_dir)
    total = d.count()
    return (
        d.groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("class_size"))
        .filter(F.col("class_size") < K_ANON)
        .select(
            "lang",
            "source",
            "class_size",
            F.round(F.col("class_size") / F.lit(float(total)), 6).alias(
                "risk_share"
            ),
        )
        .orderBy("lang", "source")
    )


O_K_ANONYMITY = f"""
WITH tot AS (SELECT count(*)::double AS n FROM documents),
c AS (SELECT lang, source, count(*)::bigint AS class_size
      FROM documents GROUP BY 1, 2)
SELECT lang, source, class_size,
       round(class_size / (SELECT n FROM tot), 6) AS risk_share
FROM c WHERE class_size < {K_ANON}
ORDER BY lang, source
"""


# --------------------------------------------------------------------- #
