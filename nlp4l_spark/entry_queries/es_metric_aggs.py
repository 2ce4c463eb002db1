# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    BM25_K, BM25_TERMS, F, STANDARD_ANALYZER, TOKS_CTE, TOK_SQL, Window,
    _corpus, _docs, _embeddings, _events, _lineitem, math, os, pd, similarity,
    sketches,
)
from nlp4l_spark.entry_queries.search import (  # noqa: F401
    _bm25_corpus_stats, _bm25_per_doc, _bm25_score_col,
)
from nlp4l_spark.entry_queries.search_ext import (  # noqa: F401
    SUGGEST_PREFIX,
)
from nlp4l_spark.entry_queries.ja_unicode import (  # noqa: F401
    _index_cache_dir,
)
# ES metric-agg twins (boxplot, median_absolute_deviation, matrix_stats),
# categorize_text log templates, frequent_item_sets pair support,
# constant_score / match_bool_prefix queries, and DPO preference pairs.
# --------------------------------------------------------------------- #


def q_boxplot_value(spark, sf_dir):
    """ES boxplot aggregation per event_type: min, q1, median, q3, max
    (BoxplotAggregationBuilder's response surface). ES computes the
    quartiles from a TDigest; the twin computes EXACT linearly
    interpolated percentiles (Spark `percentile` == DuckDB
    `quantile_cont`, both index = p*(n-1)) over integer cents so the
    interpolated doubles are bit-identical cross-engine. One
    map-side-combined groupBy; percentile is a sorted-list fold per
    group, bounded by group size."""
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select("event_type", cents.alias("c"))
    agg = e.groupBy("event_type").agg(
        F.min("c").alias("_mn"),
        F.expr("percentile(c, array(0.25D, 0.5D, 0.75D))").alias("_q"),
        F.max("c").alias("_mx"),
    )
    return agg.select(
        "event_type",
        (F.col("_mn").cast("double") / 100.0).alias("min_value"),
        F.round(F.col("_q")[0] / 100.0, 6).alias("q1"),
        F.round(F.col("_q")[1] / 100.0, 6).alias("q2"),
        F.round(F.col("_q")[2] / 100.0, 6).alias("q3"),
        (F.col("_mx").cast("double") / 100.0).alias("max_value"),
    ).orderBy("event_type")


O_BOXPLOT_VALUE = """
WITH e AS (SELECT event_type, round(value * 100)::bigint AS c FROM events)
SELECT event_type,
       min(c)::double / 100.0 AS min_value,
       round(quantile_cont(c, 0.25) / 100.0, 6) AS q1,
       round(quantile_cont(c, 0.50) / 100.0, 6) AS q2,
       round(quantile_cont(c, 0.75) / 100.0, 6) AS q3,
       max(c)::double / 100.0 AS max_value
FROM e GROUP BY 1 ORDER BY event_type
"""


def q_mad_value(spark, sf_dir):
    """ES median_absolute_deviation aggregation per event_type:
    median(|x - median(x)|), the robust dispersion panel. Exactness
    trick: medians of integer cents interpolate to halves at worst, so
    2*median is an exact integer and |2c - 2median| is an exact long —
    the second median runs over longs and the final /200 is one exact
    division. Two aggregations + one broadcast join of the tiny
    per-type median table back onto events (ES pays the same two
    passes conceptually via TDigest merge)."""
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select("event_type", cents.alias("c"))
    med = e.groupBy("event_type").agg(
        F.round(F.expr("percentile(c, 0.5D)") * 2).cast("long").alias("_m2")
    )
    dev = e.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("c") * 2 - F.col("_m2")).alias("dev2"),
    )
    return (
        dev.groupBy("event_type")
        .agg(F.round(F.expr("percentile(dev2, 0.5D)") / 200.0, 6).alias("mad"))
        .orderBy("event_type")
    )


O_MAD_VALUE = """
WITH e AS (SELECT event_type, round(value * 100)::bigint AS c FROM events),
m AS (SELECT event_type, round(quantile_cont(c, 0.5) * 2)::bigint AS m2
      FROM e GROUP BY 1),
d AS (SELECT e.event_type, abs(c * 2 - m2)::bigint AS dev2
      FROM e JOIN m USING (event_type))
SELECT event_type, round(quantile_cont(dev2, 0.5) / 200.0, 6) AS mad
FROM d GROUP BY 1 ORDER BY event_type
"""


_MATRIX_FIELDS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def q_matrix_stats_fields(spark, sf_dir):
    """ES matrix_stats aggregation over lineitem's four numeric fields:
    population covariance and Pearson correlation for every ordered
    field pair. All moments derive from EXACT integer sums: each field
    is 2-decimal by construction, so cents are longs, pairwise products
    fit int64, and the sums accumulate in decimal(38,0) (Spark) /
    HUGEINT (DuckDB) — order-independent exact folds; the covariance /
    correlation doubles then come from the IDENTICAL expression over
    identical exact operands on both engines. ONE map-side-combined
    corpus aggregation produces every sum; the 6 pair rows explode from
    that single row (no per-pair rescan)."""
    li = _lineitem(spark, sf_dir).select(
        *[
            F.round(F.col(f) * 100).cast("long").alias(f"c{i}")
            for i, f in enumerate(_MATRIX_FIELDS)
        ]
    )
    aggs = [F.count("*").cast("double").alias("n")]
    for i in range(len(_MATRIX_FIELDS)):
        aggs.append(
            F.sum(F.col(f"c{i}").cast("decimal(38,0)")).cast("double").alias(f"s{i}")
        )
        for j in range(i, len(_MATRIX_FIELDS)):
            aggs.append(
                F.sum((F.col(f"c{i}") * F.col(f"c{j}")).cast("decimal(38,0)"))
                .cast("double")
                .alias(f"s{i}{j}")
            )
    a = li.agg(*aggs)

    def _cov(i, j):
        lo, hi = min(i, j), max(i, j)
        return (
            F.col(f"s{lo}{hi}") / F.col("n")
            - (F.col(f"s{i}") / F.col("n")) * (F.col(f"s{j}") / F.col("n"))
        )

    rows = []
    for i in range(len(_MATRIX_FIELDS)):
        for j in range(i + 1, len(_MATRIX_FIELDS)):
            rows.append(
                F.struct(
                    F.lit(_MATRIX_FIELDS[i]).alias("field_x"),
                    F.lit(_MATRIX_FIELDS[j]).alias("field_y"),
                    F.round(_cov(i, j) / 10000.0, 6).alias("covariance"),
                    F.round(
                        _cov(i, j) / F.sqrt(_cov(i, i) * _cov(j, j)), 6
                    ).alias("correlation"),
                )
            )
    return (
        a.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("field_x", "field_y")
    )


def _o_matrix_stats():
    n_f = len(_MATRIX_FIELDS)
    sums = ["count(*)::double AS n"]
    for i, f in enumerate(_MATRIX_FIELDS):
        sums.append(f"sum(c{i})::double AS s{i}")
        for j in range(i, n_f):
            sums.append(f"sum(c{i} * c{j})::double AS s{i}{j}")
    cents = ", ".join(
        f"round({f} * 100)::bigint AS c{i}" for i, f in enumerate(_MATRIX_FIELDS)
    )

    def cov(i, j):
        lo, hi = min(i, j), max(i, j)
        return f"(s{lo}{hi} / n - (s{i} / n) * (s{j} / n))"

    selects = []
    for i in range(n_f):
        for j in range(i + 1, n_f):
            selects.append(
                f"SELECT '{_MATRIX_FIELDS[i]}' AS field_x,"
                f" '{_MATRIX_FIELDS[j]}' AS field_y,"
                f" round({cov(i, j)} / 10000.0, 6) AS covariance,"
                f" round({cov(i, j)} / sqrt({cov(i, i)} * {cov(j, j)}), 6)"
                f" AS correlation FROM a"
            )
    body = " UNION ALL ".join(selects)
    return (
        f"WITH c AS (SELECT {cents} FROM lineitem),\n"
        f"a AS (SELECT {', '.join(sums)} FROM c)\n"
        f"SELECT * FROM ({body}) ORDER BY field_x, field_y"
    )


O_MATRIX_STATS_FIELDS = _o_matrix_stats()


def q_log_templates(spark, sf_dir):
    """ES categorize_text aggregation (CategorizeTextAggregationBuilder):
    cluster semi-structured messages into templates by dropping the
    variable (digit-bearing) tokens and grouping on what remains. ES
    uses an incremental token-similarity tree; the twin uses the
    deterministic core of that contract — tokens containing digits are
    variables, the remaining token sequence IS the category key — which
    reproduces ES exactly on messages that differ only in numerics.
    Pure JVM HOF scan (filter + array_join) + one groupBy; top 20
    buckets by count."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    tmpl = F.array_join(
        F.filter(toks, lambda t: ~t.rlike("[0-9]")), " "
    ).alias("template")
    return (
        _docs(spark, sf_dir)
        .select(tmpl)
        .groupBy("template")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("template"))
        .limit(20)
    )


O_LOG_TEMPLATES = f"""
WITH t AS (SELECT array_to_string(
               list_filter({TOK_SQL}, t -> NOT regexp_matches(t, '[0-9]')),
               ' ') AS template
           FROM documents)
SELECT template, count(*)::bigint AS cnt
FROM t GROUP BY 1 ORDER BY cnt DESC, template ASC LIMIT 20
"""


def q_frequent_pairs(spark, sf_dir):
    """ES frequent_item_sets aggregation restricted to 2-itemsets (the
    dominant practical case): which event_type pairs co-occur for the
    same user, with support = co-occurring users / all users — the
    market-basket panel. Distinct (user, type) first (one shuffle),
    then an equality self-join on user_id with item_a < item_b: per-user
    type sets are tiny (≤ #event types), so the join fans out k² per
    user, never all-pairs across users. The user count joins in as a
    broadcast scalar."""
    ut = (
        _events(spark, sf_dir)
        .select("user_id", "event_type")
        .distinct()
    )
    n_users = ut.select("user_id").distinct().count()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"),
            F.col("b.event_type").alias("item_b"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
        .select(
            "item_a",
            "item_b",
            "cnt",
            F.round(F.col("cnt") / F.lit(float(n_users)), 6).alias("support"),
        )
        .orderBy(F.desc("cnt"), F.asc("item_a"), F.asc("item_b"))
        .limit(20)
    )


O_FREQUENT_PAIRS = """
WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
nu AS (SELECT count(DISTINCT user_id)::double AS n FROM events),
p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
             count(*)::bigint AS cnt
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
SELECT item_a, item_b, cnt,
       round(cnt / (SELECT n FROM nu), 6) AS support
FROM p ORDER BY cnt DESC, item_a ASC, item_b ASC LIMIT 20
"""


def q_preference_pairs(spark, sf_dir):
    """DPO/RLHF preference-pair construction: per user, pair the
    highest-valued event (chosen) against the lowest-valued (rejected)
    with the value margin — the standard 'best vs worst response'
    mining step for preference-tuning data. Deterministic argmax/argmin
    via struct max/min over exact cents (ties break to the smaller
    event_id on both sides); users whose events all tie produce no pair
    (margin must be > 0). ONE groupBy(user_id) — no window, no join."""
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", cents.alias("c")
    )
    agg = e.groupBy("user_id").agg(
        F.max(F.struct(F.col("c"), (-F.col("event_id")).alias("_ni"))).alias("_ch"),
        F.min(F.struct(F.col("c"), F.col("event_id"))).alias("_rj"),
    )
    return (
        agg.select(
            "user_id",
            (-F.col("_ch._ni")).alias("chosen_id"),
            F.col("_rj.event_id").alias("rejected_id"),
            F.round(
                (F.col("_ch.c") - F.col("_rj.c")).cast("double") / 100.0, 6
            ).alias("margin"),
        )
        .filter(F.col("margin") > 0)
        .orderBy("user_id")
    )


O_PREFERENCE_PAIRS = """
WITH e AS (SELECT user_id, event_id, round(value * 100)::bigint AS c
           FROM events),
ch AS (SELECT user_id, event_id AS chosen_id, c AS c_ch,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY c DESC, event_id ASC) AS rn
       FROM e),
rj AS (SELECT user_id, event_id AS rejected_id, c AS c_rj,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY c ASC, event_id ASC) AS rn
       FROM e)
SELECT ch.user_id, chosen_id, rejected_id,
       round((c_ch - c_rj)::double / 100.0, 6) AS margin
FROM ch JOIN rj ON ch.user_id = rj.user_id AND ch.rn = 1 AND rj.rn = 1
WHERE c_ch > c_rj
ORDER BY ch.user_id
"""


CONST_SCORE_BOOST = 1.5


def q_constant_score_topk(spark, sf_dir):
    """Lucene ConstantScoreQuery / ES constant_score: a filter-context
    bool (MUST term 'join', MUST_NOT term 'slow') whose every match
    scores exactly the boost — no tf/idf computed at all, which is the
    entire point of the query (Lucene skips the Similarity). The twin
    is a pure map-membership scan over the per-doc term map; ordering
    falls back to doc_id as in Lucene's constant-score hit order."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    return (
        per_doc.filter(
            F.col("m")["join"].isNotNull() & F.col("m")["slow"].isNull()
        )
        .select(
            "doc_id",
            F.lit(float(CONST_SCORE_BOOST)).alias("score"),
        )
        .orderBy("doc_id")
        .limit(BM25_K)
    )


O_CONSTANT_SCORE_TOPK = f"""
WITH {TOKS_CTE},
dm AS (SELECT doc_id,
              bool_or(term = 'join') AS has_join,
              bool_or(term = 'slow') AS has_slow
       FROM toks GROUP BY 1)
SELECT doc_id, {float(CONST_SCORE_BOOST)}::double AS score
FROM dm WHERE has_join AND NOT has_slow
ORDER BY doc_id LIMIT {BM25_K}
"""


MBP_TERM = "merge"
MBP_PREFIX = "vec"


def q_match_bool_prefix_topk(spark, sf_dir):
    """ES match_bool_prefix: the query text's last token becomes a
    PrefixQuery, the rest become term queries, all SHOULD-joined. Per
    Lucene's default rewrite the prefix clause is CONSTANT-scored (1.0)
    while the full terms score BM25 — so score = BM25('merge') +
    1.0·[any term starts with 'vec'], match requires at least one
    clause. Same one-tokenize corpus shape as q_bm25_topk; the prefix
    test is an `exists` HOF over the per-doc term-map keys (no second
    tokenize, no join)."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, [MBP_TERM])
    s_term = F.when(
        F.col("m")[MBP_TERM].isNotNull(),
        _bm25_score_col([MBP_TERM], n, avgdl, dfs),
    ).otherwise(F.lit(0.0))
    s_prefix = F.when(
        F.exists(F.map_keys("m"), lambda k: k.startswith(MBP_PREFIX)),
        F.lit(1.0),
    ).otherwise(F.lit(0.0))
    return (
        per_doc.withColumn("score", F.round(s_term + s_prefix, 6))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", "score")
    )


O_MATCH_BOOL_PREFIX_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
dfm AS (SELECT count(DISTINCT doc_id)::double AS df FROM dt
        WHERE term = '{MBP_TERM}'),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt CROSS JOIN dfm JOIN dl USING (doc_id) CROSS JOIN st
       WHERE dt.term = '{MBP_TERM}'
       GROUP BY dt.doc_id),
px AS (SELECT DISTINCT doc_id FROM toks WHERE term LIKE '{MBP_PREFIX}%'),
merged AS (SELECT coalesce(sc.doc_id, px.doc_id) AS doc_id,
                  round(coalesce(s, 0)
                        + CASE WHEN px.doc_id IS NOT NULL
                               THEN 1.0 ELSE 0.0 END, 6) AS score
           FROM sc FULL JOIN px ON sc.doc_id = px.doc_id)
SELECT doc_id, score FROM merged
WHERE score > 0
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


# --------------------------------------------------------------------- #
# ES moving_fn EWMA, span_multi (wildcard-in-span), Kneser-Ney bigram LM,
# and the distance_feature recency query.
# --------------------------------------------------------------------- #


def q_event_ewma(spark, sf_dir):
    """ES moving_fn(MovingFunctions.ewma, alpha=0.5) pipeline agg over a
    daily date_histogram: exponentially weighted moving average of the
    day's value sum. The recurrence s_t = α·x_t + (1−α)·s_{t−1} folds
    IN DAY ORDER over the bucket array (a histogram is bucket-count
    sized by construction, so collecting it into one array is bounded
    regardless of corpus size — same contract as ES, where pipeline
    aggs run driver-side over the reduced buckets). Cross-engine
    determinism: daily sums are exact cents; the fold is the identical
    null-init recurrence on both engines (Spark `aggregate` HOF, DuckDB
    `list_reduce` with first-element init), α=0.5 so every step is an
    exact binary halving."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"), cents.alias("_c"))
        .groupBy("day")
        .agg(F.sum("_c").alias("s"))
    )
    arr = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "s"))).alias("a")
    )
    ex = arr.select("a", F.posexplode("a").alias("pos", "e"))
    prefix = F.transform(
        F.slice(F.col("a"), 1, F.col("pos") + 1), lambda e: e["s"].cast("double")
    )
    fold = F.aggregate(
        prefix,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(acc.isNull(), x).otherwise(0.5 * x + 0.5 * acc),
    )
    return ex.select(
        F.col("e.day").alias("day"),
        (F.col("e.s").cast("double") / 100.0).alias("raw"),
        F.round(fold / 100.0, 6).alias("ewma"),
    ).orderBy("day")


O_EVENT_EWMA = """
WITH daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                      sum(round(value * 100)::bigint)::bigint AS s
               FROM events GROUP BY 1),
arr AS (SELECT list(struct_pack(day := day, s := s) ORDER BY day) AS a
        FROM daily),
ex AS (SELECT unnest(a) AS e, generate_subscripts(a, 1) AS p, a FROM arr)
SELECT e.day AS day,
       e.s::double / 100.0 AS raw,
       round(list_reduce(list_transform(a[1:p], x -> x.s::double),
                         (acc, x) -> 0.5 * x + 0.5 * acc) / 100.0, 6) AS ewma
FROM ex ORDER BY day
"""


SPAN_MULTI_PREFIX = "vec"
SPAN_MULTI_TERM = "join"
SPAN_MULTI_SLOP = 3


def q_span_multi_search(spark, sf_dir):
    """Lucene SpanMultiTermQueryWrapper: a multi-term query (here
    PrefixQuery '{SPAN_MULTI_PREFIX}*') lifted into span algebra and
    composed in a SpanNearQuery — any token starting with the prefix
    followed in order by '{SPAN_MULTI_TERM}' within slop
    {SPAN_MULTI_SLOP}. Same full-token-stream position contract as the
    other span twins (stopword holes preserved); n_spans = qualifying
    start positions. The wrapper's term expansion costs nothing here —
    the prefix test runs inside the same position-extraction HOF."""
    win = SPAN_MULTI_SLOP + 1
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    pa = F.filter(
        F.transform(
            ft,
            lambda x, i: F.when(
                x.startswith(SPAN_MULTI_PREFIX), i
            ).otherwise(F.lit(None)),
        ),
        lambda v: v.isNotNull(),
    )
    pb = F.filter(
        F.transform(
            ft,
            lambda x, i: F.when(x == SPAN_MULTI_TERM, i).otherwise(F.lit(None)),
        ),
        lambda v: v.isNotNull(),
    )
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


O_SPAN_MULTI_SEARCH = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1),
                    i -> ft[i] LIKE '{SPAN_MULTI_PREFIX}%') AS pa,
        list_filter(range(1, len(ft) + 1),
                    i -> ft[i] = '{SPAN_MULTI_TERM}') AS pb
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb,
              p1 -> p1 > p0 AND p1 - p0 <= {SPAN_MULTI_SLOP + 1})) > 0
        ))::bigint AS n_spans
      FROM p)
SELECT doc_id, n_spans FROM s WHERE n_spans > 0 ORDER BY doc_id ASC LIMIT 20
"""


KN_DISCOUNT = 0.75
KN_MIN_COUNT = 5


def q_kneser_ney_bigrams(spark, sf_dir):
    """Interpolated Kneser-Ney bigram probabilities (Kneser & Ney 1995,
    the Chen-Goodman formulation with a fixed discount D=0.75), the
    classic n-gram-LM smoothing a perplexity-filter pipeline trains:
    P(w2|w1) = max(c12−D, 0)/c1 + (D·N1+(w1·)/c1) · N1+(·w2)/T, where
    N1+ are continuation-type counts and T = distinct bigram types. Top
    20 bigrams with c12 ≥ {KN_MIN_COUNT} by smoothed probability. One
    explode shuffle builds the bigram-type table; everything after is
    keyed joins on that (vocab²-bounded) table plus a broadcast-scalar
    T — the corpus is never rescanned."""
    from pyspark.sql import types as T

    tokenize = STANDARD_ANALYZER.tokenize

    # Arrow pass for per-doc bigram COUNTS: the declarative
    # sequence/element_at struct HOF is evaluated interpreted and
    # measured 26.6 s at sf0.1; this is the dedup.shingles_udf precedent
    # (oracle-identical output — consecutive pairs of the same analyzed
    # stream), with counts kept so c12 sums them.
    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("w1", T.StringType()),
                    T.StructField("w2", T.StringType()),
                    T.StructField("c", T.LongType()),
                ]
            )
        )
    )
    def _bigram_counts(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tokenize(t)
            counts: dict[tuple, int] = {}
            for a, b in zip(toks, toks[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + 1
            out.append([(a, b, c) for (a, b), c in counts.items()])
        return pd.Series(out)

    bg = (
        _docs(spark, sf_dir)
        .select(F.explode(_bigram_counts(F.col("text"))).alias("b"))
        .select("b.*")
    )
    # persist the reduced bigram-type table: c1/c2/T and the final join
    # all derive from it, and without the cache each branch would re-run
    # the corpus tokenize+explode (measured 76 s unfixed at sf0.1)
    c12 = (
        bg.groupBy("w1", "w2")
        .agg(F.sum("c").cast("double").alias("c12"))
        .persist()
    )
    c1 = c12.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count("*").cast("double").alias("n1fw")
    )
    c2 = c12.groupBy("w2").agg(F.count("*").cast("double").alias("n1bw"))
    t_types = float(c12.count())  # also materializes the cache
    d = float(KN_DISCOUNT)
    p_kn = (
        F.greatest(F.col("c12") - d, F.lit(0.0)) / F.col("c1")
        + (d * F.col("n1fw") / F.col("c1")) * (F.col("n1bw") / t_types)
    )
    return (
        c12.join(c1, "w1")
        .join(c2, "w2")
        .filter(F.col("c12") >= KN_MIN_COUNT)
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("cnt"),
            F.round(p_kn, 6).alias("p_kn"),
        )
        .orderBy(F.desc("p_kn"), F.asc("w1"), F.asc("w2"))
        .limit(20)
    )


O_KNESER_NEY_BIGRAMS = f"""
WITH t AS (SELECT doc_id, unnest({TOK_SQL}) AS term,
                  generate_subscripts({TOK_SQL}, 1) AS p
           FROM documents),
bg AS (SELECT a.term AS w1, b.term AS w2
       FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.p = a.p + 1),
c12 AS (SELECT w1, w2, count(*)::double AS c12 FROM bg GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12)::double AS c1, count(*)::double AS n1fw
       FROM c12 GROUP BY 1),
c2 AS (SELECT w2, count(*)::double AS n1bw FROM c12 GROUP BY 1),
tt AS (SELECT count(*)::double AS t FROM c12)
SELECT w1, w2, c12::bigint AS cnt,
       round(greatest(c12 - {KN_DISCOUNT}, 0.0) / c1
             + ({KN_DISCOUNT} * n1fw / c1) * (n1bw / t), 6) AS p_kn
FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN tt
WHERE c12 >= {KN_MIN_COUNT}
ORDER BY p_kn DESC, w1 ASC, w2 ASC LIMIT 20
"""


DF_ORIGIN_SEC = 1706745600  # 2024-02-01T00:00:00Z, after the event window
DF_PIVOT_SEC = 7 * 86400
DF_BOOST = 2.0


def q_distance_feature_topk(spark, sf_dir):
    """ES distance_feature query on a date field: score = boost ·
    pivot / (pivot + |origin − ts|) — the saturation-shaped recency
    boost (DistanceFeatureQueryBuilder), distinct from the gaussian
    decay of function_score (q_decay_gauss_topk). Filter context =
    event_type 'click'; top 20 most-recent-weighted events. Single
    filtered scan + TakeOrdered, the whole score is one JVM projection."""
    sec = F.col("ts").cast("timestamp").cast("long")
    score = F.round(
        F.lit(DF_BOOST)
        * F.lit(float(DF_PIVOT_SEC))
        / (F.lit(float(DF_PIVOT_SEC)) + F.abs(F.lit(DF_ORIGIN_SEC) - sec)),
        6,
    )
    return (
        _events(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select("event_id", score.alias("score"))
        .orderBy(F.desc("score"), F.asc("event_id"))
        .limit(20)
    )


O_DISTANCE_FEATURE_TOPK = f"""
SELECT event_id,
       round({DF_BOOST} * {float(DF_PIVOT_SEC)}
             / ({float(DF_PIVOT_SEC)}
                + abs({DF_ORIGIN_SEC} - floor(epoch(ts))::bigint)), 6) AS score
FROM events WHERE event_type = 'click'
ORDER BY score DESC, event_id ASC LIMIT 20
"""


# --------------------------------------------------------------------- #
# min_doc_count=0 dense histogram, Solr spellcheck.collate, the Solr
# cross-collection join qparser, and Solr's scale() function query.
# --------------------------------------------------------------------- #


def q_dense_histogram(spark, sf_dir):
    """ES histogram aggregation with min_doc_count=0: EMPTY buckets
    between the min and max observed bucket are emitted with cnt 0 (the
    sparkline-friendly dense form; q_value_histogram is the
    min_doc_count=1 twin). One corpus groupBy + a generated bucket
    spine (bounded by the value range / interval, never by corpus
    size) left-joined against the counts — ES does exactly this densify
    step in the reduce phase."""
    e = _events(spark, sf_dir).select(
        F.floor(F.col("value")).cast("long").alias("bucket")
    )
    c = e.groupBy("bucket").agg(F.count("*").cast("long").alias("_n"))
    mn, mx = e.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    spine = spark.range(int(mn), int(mx) + 1).select(
        F.col("id").alias("bucket")
    )
    return (
        spine.join(c, "bucket", "left")
        .select("bucket", F.coalesce(F.col("_n"), F.lit(0)).cast("long").alias("cnt"))
        .orderBy("bucket")
    )


O_DENSE_HISTOGRAM = """
WITH e AS (SELECT floor(value)::bigint AS bucket FROM events),
c AS (SELECT bucket, count(*)::bigint AS cnt FROM e GROUP BY 1),
b AS (SELECT unnest(generate_series((SELECT min(bucket) FROM e),
                                    (SELECT max(bucket) FROM e))) AS bucket)
SELECT b.bucket, coalesce(cnt, 0)::bigint AS cnt
FROM b LEFT JOIN c USING (bucket) ORDER BY bucket
"""


COLLATE_WORDS = ("spakr", "window")


def q_spellcheck_collate(spark, sf_dir):
    """Solr spellcheck.collate: for a two-word misspelled query, take
    the top-3 correction candidates per word (the gram-overlap +
    levenshtein suggest ranking), form every collated query, and verify
    each against the corpus — hits = docs containing BOTH corrections
    (AND semantics), collations ranked by hits (Solr only returns
    collations with hits > 0; the twin keeps zeros visible for the
    contract). Two term-dictionary suggest scans + ONE distinct
    (doc_id, term) pass semi-pruned to the ≤6 candidate terms; the 3×3
    combo table is broadcast-tiny."""
    from nlp4l_spark.ops import spellcheck

    terms = (
        _corpus(spark, sf_dir)
        .tokens()
        .select(F.explode("tokens").alias("term"))
        .distinct()
    )
    top1 = spellcheck.suggest(terms, COLLATE_WORDS[0], k=3).select(
        F.col("term").alias("s1")
    )
    top2 = spellcheck.suggest(terms, COLLATE_WORDS[1], k=3).select(
        F.col("term").alias("s2")
    )
    toks = STANDARD_ANALYZER.tokens_expr("text")
    dt = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
        .distinct()
    )
    x = dt.join(F.broadcast(top1), dt["term"] == F.col("s1")).select("doc_id", "s1")
    y = dt.join(F.broadcast(top2), dt["term"] == F.col("s2")).select(
        F.col("doc_id").alias("_d2"), "s2"
    )
    pc = (
        x.join(y, x["doc_id"] == y["_d2"])
        .groupBy("s1", "s2")
        .agg(F.count("*").cast("long").alias("_h"))
    )
    combos = top1.crossJoin(top2)
    return (
        combos.join(pc, ["s1", "s2"], "left")
        .select(
            "s1",
            "s2",
            F.coalesce(F.col("_h"), F.lit(0)).cast("long").alias("hits"),
        )
        .orderBy(F.desc("hits"), F.asc("s1"), F.asc("s2"))
        .limit(5)
    )


def _grams_sql(w: str) -> str:
    grams = sorted({w[i : i + 2] for i in range(max(len(w) - 1, 1))})
    return "[" + ", ".join(f"'{g}'" for g in grams) + "]"


def _o_collate():
    w1, w2 = COLLATE_WORDS
    return f"""
WITH {TOKS_CTE},
terms AS (SELECT DISTINCT term FROM toks),
g AS (SELECT term,
        list_distinct(list_transform(
          generate_series(1, greatest(length(term) - 1, 1)),
          i -> substr(term, i, 2))) AS grams
      FROM terms),
r1 AS (SELECT term AS s1,
              row_number() OVER (
                ORDER BY len(list_intersect(grams, {_grams_sql(w1)})) DESC,
                         levenshtein(term, '{w1}') ASC, term ASC) AS rn
       FROM g WHERE len(list_intersect(grams, {_grams_sql(w1)})) >= 1),
r2 AS (SELECT term AS s2,
              row_number() OVER (
                ORDER BY len(list_intersect(grams, {_grams_sql(w2)})) DESC,
                         levenshtein(term, '{w2}') ASC, term ASC) AS rn
       FROM g WHERE len(list_intersect(grams, {_grams_sql(w2)})) >= 1),
t1 AS (SELECT s1 FROM r1 WHERE rn <= 3),
t2 AS (SELECT s2 FROM r2 WHERE rn <= 3),
dt AS (SELECT DISTINCT doc_id, term FROM toks),
pc AS (SELECT x.term AS s1, y.term AS s2, count(*)::bigint AS h
       FROM dt x JOIN dt y ON x.doc_id = y.doc_id
       WHERE x.term IN (SELECT s1 FROM t1) AND y.term IN (SELECT s2 FROM t2)
       GROUP BY 1, 2)
SELECT t1.s1, t2.s2, coalesce(h, 0)::bigint AS hits
FROM t1 CROSS JOIN t2 LEFT JOIN pc ON pc.s1 = t1.s1 AND pc.s2 = t2.s2
ORDER BY hits DESC, t1.s1 ASC, t2.s2 ASC LIMIT 5
"""


O_SPELLCHECK_COLLATE = _o_collate()


JOIN_PRICE_MIN = 300000.0


def q_solr_join_filter(spark, sf_dir):
    """Solr's cross-collection join qparser ({{!join from=o_custkey
    to=c_custkey}}o_totalprice:[{JOIN_PRICE_MIN} TO *]) / Lucene
    joinutil JoinUtil.createJoinQuery with ScoreMode.None: filter one
    collection by a query on another via a shared key, constant-scored.
    Spark shape: the inner query reduces to a distinct key set that
    SEMI-joins the outer collection — broadcastable when the inner hit
    set is small, sort-merge-safe otherwise; never a row-multiplying
    join (ScoreMode.None ignores child multiplicity)."""
    keys = (
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_totalprice") > JOIN_PRICE_MIN)
        .select("o_custkey")
        .distinct()
    )
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    return (
        cust.join(keys, cust["c_custkey"] == keys["o_custkey"], "left_semi")
        .select("c_custkey", F.lit(1.0).alias("score"))
        .orderBy("c_custkey")
        .limit(20)
    )


O_SOLR_JOIN_FILTER = f"""
SELECT c_custkey, 1.0::double AS score FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders
                    WHERE o_totalprice > {JOIN_PRICE_MIN})
ORDER BY c_custkey LIMIT 20
"""


def q_scale_score_topk(spark, sf_dir):
    """Solr's scale(query({{!...}}),0,1) function query / ES min-max
    score normalization (the normalizer step of linear hybrid fusion):
    BM25 scores of the matching set rescaled to [0,1] by the set's own
    min/max. Scores are 6dp-rounded BEFORE the min/max and the rescale
    (the repo's round-before-select determinism rule), so both engines
    scale identical operands. Two jobs: the usual one-tokenize stats
    pass + one scoring scan; the min/max is a 2-value scalar agg."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    matched = (
        per_doc.withColumn(
            "s", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .select("doc_id", "s")
    )
    mn, mx = matched.agg(F.min("s"), F.max("s")).collect()[0]
    scaled = F.round((F.col("s") - F.lit(mn)) / F.lit(mx - mn), 6)
    return (
        matched.select("doc_id", scaled.alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(BM25_K)
    )


O_SCALE_SCORE_TOPK = f"""
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
mm AS (SELECT min(s) AS mn, max(s) AS mx FROM sc)
SELECT doc_id, round((s - mn) / (mx - mn), 6) AS score
FROM sc CROSS JOIN mm
ORDER BY score DESC, doc_id ASC LIMIT {BM25_K}
"""


# --------------------------------------------------------------------- #
# Bool percolation (must/must_not/should+msm stored queries), the ES
# rate aggregation, and the max_bucket sibling pipeline aggregation.
# --------------------------------------------------------------------- #
PERC_BOOL_QUERIES = [
    # (query_id, must, must_not, should, min_should)
    (1, ["join"], ["slow"], [], 0),
    (2, [], [], ["vector", "hash", "scan"], 2),
    (3, ["merge"], [], ["spark", "window"], 1),
    (4, [], ["data"], [], 0),
    (5, ["nosuchterm"], [], [], 0),
]


def q_percolate_bool(spark, sf_dir):
    """Bool percolation (ops/percolate.py::percolate_bool; the full ES
    bool percolator): stored queries with MUST / MUST_NOT / SHOULD
    clause lists and minimum_should_match, matched against every doc in
    ONE tokenize scan under a necessity prune (must-overlap, or
    should-overlap when msm>0, else match-all). Queries broadcast, zero
    corpus shuffle — the alerting/routing hot path at stream scale."""
    from nlp4l_spark.ops.percolate import percolate_bool

    q = spark.createDataFrame(
        PERC_BOOL_QUERIES,
        "query_id int, must_terms array<string>, must_not_terms array<string>,"
        " should_terms array<string>, min_should int",
    )
    return percolate_bool(_docs(spark, sf_dir), q).orderBy(
        "doc_id", "query_id"
    )


def _o_percolate_bool() -> str:
    def lst(terms):
        return "[" + ", ".join(f"'{t}'" for t in terms) + "]::varchar[]"

    values = ", ".join(
        f"({qid}, {lst(m)}, {lst(mn)}, {lst(sh)}, {msm})"
        for qid, m, mn, sh, msm in PERC_BOOL_QUERIES
    )
    return f"""
WITH d AS (SELECT doc_id, list_distinct({TOK_SQL}) AS toks FROM documents),
q AS (SELECT * FROM (VALUES {values})
      AS t(query_id, must, mnot, should, msm))
SELECT doc_id, query_id FROM d JOIN q
  ON list_has_all(toks, must)
 AND NOT list_has_any(toks, mnot)
 AND len(list_intersect(toks, should)) >= msm
ORDER BY doc_id, query_id
"""


O_PERCOLATE_BOOL = _o_percolate_bool()


def q_rate_agg(spark, sf_dir):
    """ES rate aggregation (unit=day) inside a weekly date_histogram:
    per-week event count and value sum normalized to a per-day rate —
    the 'requests per day, bucketed by week' dashboard panel. ES
    divides by the bucket's duration in rate units (7 days) regardless
    of partial buckets; the twin does the same. Exact cents sums; one
    keyed groupBy."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        _events(spark, sf_dir)
        .select(
            F.floor(F.floor(sec / 86400) / 7).cast("long").alias("week"),
            cents.alias("_c"),
        )
        .groupBy("week")
        .agg(
            F.round(F.count("*") / 7.0, 6).alias("count_rate"),
            F.round(F.sum("_c") / 100.0 / 7.0, 6).alias("value_rate"),
        )
        .orderBy("week")
    )


O_RATE_AGG = """
SELECT floor(floor(floor(epoch(ts))::bigint / 86400) / 7)::bigint AS week,
       round(count(*) / 7.0, 6) AS count_rate,
       round(sum(round(value * 100)::bigint) / 100.0 / 7.0, 6) AS value_rate
FROM events GROUP BY 1 ORDER BY week
"""


def q_max_bucket(spark, sf_dir):
    """ES max_bucket sibling pipeline aggregation: which daily bucket
    of a date_histogram has the largest sum(value), returning the
    bucket key and the metric (ties broken to the earliest day; ES
    returns all tied keys — the twin's deterministic single-key form).
    One keyed groupBy + a 1-row TakeOrdered over the bucket table."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"), cents.alias("_c"))
        .groupBy("day")
        .agg(F.sum("_c").alias("_s"))
        .select("day", (F.col("_s").cast("double") / 100.0).alias("max_sum"))
        .orderBy(F.desc("max_sum"), F.asc("day"))
        .limit(1)
    )


O_MAX_BUCKET = """
WITH daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                      sum(round(value * 100)::bigint)::bigint AS s
               FROM events GROUP BY 1)
SELECT day, s::double / 100.0 AS max_sum
FROM daily ORDER BY max_sum DESC, day ASC LIMIT 1
"""


# --------------------------------------------------------------------- #
# DDSketch percentiles: the mergeable relative-error quantile sketch
# (ES `percentiles` hdr mode analogue; ops/sketches.py::dd_*).
# --------------------------------------------------------------------- #
DDS_QS = [0.5, 0.9, 0.99]


def q_dds_percentiles(spark, sf_dir):
    """ES percentiles aggregation in its sketched (HDR-mode) form,
    implemented as a DDSketch (Masson 2019): exponential buckets
    ceil(ln(v)/ln(gamma)) over exact cents, quantile = first bucket
    whose cumulative count reaches ceil(q·n), estimate = the bucket
    midpoint (alpha=2% relative-error bound, asserted against exact
    quantiles in tests/test_sketches.py). The sketch groupBy is
    map-side combinable with a bucket-count-bounded key space and
    merges by count addition (dd_merge) — the scale path where the
    exact `percentile` sorts of q_boxplot_value would spill. Oracle =
    the IDENTICAL bucket/pick/midpoint math in DuckDB."""
    from nlp4l_spark.ops import sketches

    cents = F.round(F.col("value") * 100).cast("long")
    v = _events(spark, sf_dir).select(cents.alias("c"))
    sk = sketches.dd_sketch(v, "c")
    return sketches.dd_quantiles(sk, DDS_QS, scale=100.0)


def _o_dds() -> str:
    from nlp4l_spark.ops import sketches

    gamma = sketches.dd_gamma()
    lg = math.log(gamma)
    qs = ", ".join(repr(q) for q in DDS_QS)
    return f"""
WITH v AS (SELECT round(value * 100)::bigint AS c FROM events),
s AS (SELECT ceil(round(ln(c::double) / {lg!r}, 6))::bigint AS bucket,
             count(*)::bigint AS cnt
      FROM v GROUP BY 1),
cu AS (SELECT bucket, sum(cnt) OVER (ORDER BY bucket) AS cum,
              sum(cnt) OVER () AS n
       FROM s),
q AS (SELECT unnest([{qs}]::double[]) AS pct),
pick AS (SELECT pct, min(bucket)::bigint AS bucket
         FROM q JOIN cu ON cum >= ceil(pct * n) GROUP BY 1)
SELECT pct, bucket,
       round(2.0 * exp(bucket * {lg!r}) / ({gamma!r} + 1.0) / 100.0, 6)
         AS estimate
FROM pick ORDER BY pct
"""


O_DDS_PERCENTILES = _o_dds()


# --------------------------------------------------------------------- #
# Trailing z-score anomaly days, code-vs-prose detection, and the ES
# terms-agg ordered-by-sub-aggregation contract.
# --------------------------------------------------------------------- #


def q_anomaly_days(spark, sf_dir):
    """Anomaly detection over the daily value series (the ES ML
    single-metric-job panel, deterministic twin): a day is anomalous
    when its sum deviates from the TRAILING 7-day window mean by more
    than 2 trailing standard deviations. Mean and std derive from exact
    integer-cents sum/sumsq window folds (ROWS BETWEEN 7 PRECEDING AND
    1 PRECEDING), so both engines z-score identical operands; the first
    7 days have no full window and are never flagged. One groupBy to
    days + one ordered window over the day-count-sized series."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"), cents.alias("_c"))
        .groupBy("day")
        .agg(F.sum("_c").alias("s"))
    )
    w = Window.orderBy("day").rowsBetween(-7, -1)
    n = F.count("s").over(w).cast("double")
    s1 = F.sum("s").over(w).cast("double")
    s2 = F.sum(F.col("s") * F.col("s")).over(w).cast("double")
    mean = s1 / n
    var = s2 / n - mean * mean
    z = (F.col("s").cast("double") - mean) / F.sqrt(var)
    return (
        daily.select(
            "day",
            (F.col("s").cast("double") / 100.0).alias("day_sum"),
            F.when(n >= 7, F.round(z, 6)).alias("z"),
        )
        .filter(F.abs(F.col("z")) > 2.0)
        .orderBy("day")
    )


O_ANOMALY_DAYS = """
WITH daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                      sum(round(value * 100)::bigint)::bigint AS s
               FROM events GROUP BY 1),
w AS (SELECT day, s,
             count(s) OVER tw AS n,
             sum(s) OVER tw AS s1,
             sum(s * s) OVER tw AS s2
      FROM daily
      WINDOW tw AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)),
z AS (SELECT day, s::double / 100.0 AS day_sum,
             CASE WHEN n >= 7 THEN
               round((s::double - s1::double / n)
                     / sqrt(s2::double / n
                            - (s1::double / n) * (s1::double / n)), 6)
             END AS z
      FROM w)
SELECT day, day_sum, z FROM z WHERE abs(z) > 2.0 ORDER BY day
"""


def q_code_detect(spark, sf_dir):
    """Code-vs-prose detection (the StarCoder/CodeParrot corpus-split
    heuristic): per document, symbol density (braces/semicolons/equals
    per char), keyword hits (def/class/import/return/if), and
    whitespace-indented-line fraction fold into a code score; per
    source, the flagged fraction. Pure JVM regexp counts in one scan +
    one source-keyed groupBy — the pre-filter a code-corpus pipeline
    runs before expensive AST parsing."""
    sym = F.length(F.regexp_replace(F.col("text"), r"[^{};=()\[\]<>]", ""))
    kw = F.size(
        F.expr(
            r"regexp_extract_all(text,"
            r" '\\b(def|class|import|return|if|for|while)\\b', 0)"
        )
    )
    lines = F.split(F.col("text"), "\n")
    indented = F.size(F.filter(lines, lambda l: l.rlike("^(    |\t)")))
    score = (
        F.round(
            sym.cast("double") / F.greatest(F.col("n_chars"), F.lit(1))
            * 10.0
            + kw.cast("double") / 10.0
            + indented.cast("double")
            / F.greatest(F.size(lines), F.lit(1)),
            6,
        )
    )
    d = _docs(spark, sf_dir).select(
        "source", score.alias("_sc")
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum((F.col("_sc") > 0.3).cast("long")).alias("n_code"),
            F.round(F.avg("_sc"), 6).alias("avg_code_score"),
        )
        .orderBy("source")
    )


O_CODE_DETECT = r"""
WITH d AS (SELECT source,
  round(length(regexp_replace(text, '[^{};=()\[\]<>]', '', 'g'))::double
          / greatest(n_chars, 1) * 10.0
        + len(regexp_extract_all(text,
              '\b(def|class|import|return|if|for|while)\b', 0))::double
          / 10.0
        + len(list_filter(string_split(text, chr(10)),
              l -> regexp_matches(l, '^(    |\t)')))::double
          / greatest(len(string_split(text, chr(10))), 1), 6) AS sc
  FROM documents)
SELECT source, count(*)::bigint AS n_docs,
       sum((sc > 0.3)::bigint)::bigint AS n_code,
       round(avg(sc), 6) AS avg_code_score
FROM d GROUP BY 1 ORDER BY source
"""


def q_terms_by_metric(spark, sf_dir):
    """ES terms aggregation ORDERED BY A SUB-AGGREGATION (order:
    {avg_value: desc}) — the contract where bucket ranking follows a
    metric, not doc count (and the classic shard-approximation footgun;
    the exact form here is the oracle the `terms_shard_approx` twin
    bounds). Exact cents sums; avg = one division per bucket; ties
    break on the key. One keyed groupBy + TakeOrdered."""
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        _events(spark, sf_dir)
        .select("event_type", cents.alias("_c"))
        .groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.round(F.sum("_c").cast("double") / F.count("*") / 100.0, 6).alias(
                "avg_value"
            ),
        )
        .orderBy(F.desc("avg_value"), F.asc("event_type"))
        .limit(10)
    )


O_TERMS_BY_METRIC = """
SELECT event_type, count(*)::bigint AS cnt,
       round(sum(round(value * 100)::bigint)::double / count(*) / 100.0, 6)
         AS avg_value
FROM events GROUP BY 1 ORDER BY avg_value DESC, event_type ASC LIMIT 10
"""


def q_dds_by_type(spark, sf_dir):
    """Grouped DDSketch percentiles (the ES percentiles-agg-inside-terms
    shape): p50/p90 per event_type from per-group bucket sketches — the
    grouped form of q_dds_percentiles, exercising the
    group-partitioned cumulative windows in ops/sketches.dd_quantiles.
    Identical bucket/pick/midpoint math in the DuckDB oracle."""
    from nlp4l_spark.ops import sketches

    cents = F.round(F.col("value") * 100).cast("long")
    v = _events(spark, sf_dir).select("event_type", cents.alias("c"))
    sk = sketches.dd_sketch(v, "c", group_cols=["event_type"])
    return sketches.dd_quantiles(
        sk, [0.5, 0.9], scale=100.0, group_cols=["event_type"]
    )


def _o_dds_by_type() -> str:
    from nlp4l_spark.ops import sketches

    gamma = sketches.dd_gamma()
    lg = math.log(gamma)
    return f"""
WITH v AS (SELECT event_type, round(value * 100)::bigint AS c FROM events),
s AS (SELECT event_type,
             ceil(round(ln(c::double) / {lg!r}, 6))::bigint AS bucket,
             count(*)::bigint AS cnt
      FROM v GROUP BY 1, 2),
cu AS (SELECT event_type, bucket,
              sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket) AS cum,
              sum(cnt) OVER (PARTITION BY event_type) AS n
       FROM s),
q AS (SELECT unnest([0.5, 0.9]::double[]) AS pct),
pick AS (SELECT event_type, pct, min(bucket)::bigint AS bucket
         FROM cu JOIN q ON cum >= ceil(pct * n) GROUP BY 1, 2)
SELECT event_type, pct, bucket,
       round(2.0 * exp(bucket * {lg!r}) / ({gamma!r} + 1.0) / 100.0, 6)
         AS estimate
FROM pick ORDER BY event_type, pct
"""


O_DDS_BY_TYPE = _o_dds_by_type()


# --------------------------------------------------------------------- #
# Context-filtered completion suggester, MinHash-LSH tuning curve, and
# the C4-style wordlist screen.
# --------------------------------------------------------------------- #
SUGGEST_CTX_SOURCE = "src0"


def q_suggest_context(spark, sf_dir):
    """ES completion suggester with CONTEXTS (CategoryContextMapping):
    completions of the prefix ranked by collection frequency, but only
    counting occurrences inside documents whose `source` matches the
    query context — the 'autocomplete within my tenant' shape. The
    context is a pushed equality filter on the stored field BEFORE the
    tokenize, so the suggest scan touches only the context's partition
    of the corpus (at scale: a partition-pruned directory read when the
    corpus is partitioned by tenant)."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .filter(F.col("source") == SUGGEST_CTX_SOURCE)
        .select(F.explode(toks).alias("term"))
        .filter(F.col("term").startswith(SUGGEST_PREFIX))
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(10)
    )


O_SUGGEST_CONTEXT = f"""
WITH toks AS (SELECT unnest({TOK_SQL}) AS term FROM documents
              WHERE source = '{SUGGEST_CTX_SOURCE}')
SELECT term, count(*)::bigint AS cf FROM toks
WHERE term LIKE '{SUGGEST_PREFIX}%'
GROUP BY term ORDER BY cf DESC, term ASC LIMIT 10
"""


LSH_BANDS = 16
LSH_ROWS = 8


def q_lsh_tuning_curve(spark, sf_dir):
    """MinHash-LSH design table: for the deployed banding (b={LSH_BANDS}
    bands × r={LSH_ROWS} rows — the geometry `dedup_minhash` runs), the
    probability a pair at Jaccard similarity s lands in >=1 shared
    bucket: P(s) = 1 − (1 − s^r)^b (Leskovec/Rajaraman/Ullman, MMDS
    ch.3). The curve is what a pipeline owner reads to pick b,r for a
    target threshold; emitting it from the engine keeps the tuning and
    the implementation in one place. Pure generated table — no data
    scan at all."""
    s = (F.col("id").cast("double") / 20.0)
    p = 1.0 - F.pow(
        1.0 - F.pow(s, F.lit(float(LSH_ROWS))), F.lit(float(LSH_BANDS))
    )
    return (
        spark.range(1, 20)
        .select(
            F.round(s, 2).alias("similarity"),
            F.round(p, 6).alias("p_detect"),
        )
        .orderBy("similarity")
    )


O_LSH_TUNING_CURVE = f"""
SELECT round(i / 20.0, 2) AS similarity,
       round(1.0 - pow(1.0 - pow(i / 20.0, {float(LSH_ROWS)}),
                       {float(LSH_BANDS)}), 6) AS p_detect
FROM (SELECT unnest(generate_series(1, 19))::double AS i)
ORDER BY similarity
"""


SCREEN_LEXICON = ["slow", "error", "dup"]


def q_wordlist_screen(spark, sf_dir):
    """C4's bad-words screen (the 'List of Dirty, Naughty …' filter
    stage), lexicon-pluggable: per source, how many documents contain
    ANY lexicon token and the screen-out rate — the report a corpus
    curator reads before dropping. Token-level membership against the
    analyzed stream (not substring — C4 matches words), one
    arrays_overlap scan + one source-keyed groupBy."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    hit = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in SCREEN_LEXICON])
    ).cast("long")
    d = _docs(spark, sf_dir).select("source", hit.alias("_h"))
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_h").alias("n_flagged"),
            F.round(F.sum("_h") / F.count("*"), 6).alias("flag_rate"),
        )
        .orderBy("source")
    )


def _o_wordlist_screen() -> str:
    lex = "[" + ", ".join(f"'{w}'" for w in SCREEN_LEXICON) + "]"
    return f"""
WITH d AS (SELECT source,
                  (list_has_any({TOK_SQL}, {lex}))::bigint AS h
           FROM documents)
SELECT source, count(*)::bigint AS n_docs,
       sum(h)::bigint AS n_flagged,
       round(sum(h) / count(*), 6) AS flag_rate
FROM d GROUP BY 1 ORDER BY source
"""


O_WORDLIST_SCREEN = _o_wordlist_screen()


# --------------------------------------------------------------------- #
# Bradley-Terry strength fit over the mined preference pairs (the
# RLHF reward-model analytics step), 2 unrolled MM iterations.
# --------------------------------------------------------------------- #
BT_ITERS = 2


def q_bradley_terry(spark, sf_dir):
    """Bradley-Terry player strengths from the preference pairs that
    q_preference_pairs mines: each user's (chosen, rejected) events
    become a win of the chosen event_type over the rejected one, and
    {BT_ITERS} unrolled Zermelo/MM iterations fit the strengths —
    p_i ← W_i / Σ_j n_ij/(p_i+p_j), normalized to sum 1 (Hunter 2004,
    the fit behind RLHF preference-strength dashboards). Cross-engine
    float contract: every per-player denominator and the normalizer
    fold in EXPLICIT j-order (Spark `aggregate` HOF over a sorted
    struct array == DuckDB `list_reduce` over `list(... ORDER BY)`),
    and p is rounded to 6 dp after every stage, so both engines iterate
    identical operands. The pair/win tables are event-type² bounded;
    the corpus contributes one groupBy(user)."""
    cents = F.round(F.col("value") * 100).cast("long")
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", "event_type", cents.alias("c")
    )
    agg = e.groupBy("user_id").agg(
        F.max(
            F.struct(F.col("c"), (-F.col("event_id")).alias("_ni"),
                     F.col("event_type").alias("t"))
        ).alias("_ch"),
        F.min(
            F.struct(F.col("c"), F.col("event_id"),
                     F.col("event_type").alias("t"))
        ).alias("_rj"),
    )
    m = agg.filter(
        (F.col("_ch.c") > F.col("_rj.c")) & (F.col("_ch.t") != F.col("_rj.t"))
    ).select(F.col("_ch.t").alias("w"), F.col("_rj.t").alias("l"))
    d = m.groupBy("w", "l").agg(F.count("*").cast("double").alias("n"))
    g = (
        d.select(F.col("w").alias("i"), F.col("l").alias("j"), "n")
        .unionByName(d.select(F.col("l").alias("i"), F.col("w").alias("j"), "n"))
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n"))
    )
    wins = d.groupBy(F.col("w").alias("i")).agg(F.sum("n").alias("wn"))

    def _ordered_sum(pairs_col):
        return F.aggregate(
            F.transform(F.array_sort(pairs_col), lambda s: s["v"]),
            F.lit(0.0),
            lambda a, x: a + x,
        )

    p = g.select("i").distinct().select("i", F.lit(1.0).alias("p"))
    for _ in range(BT_ITERS):
        pi = p.select(F.col("i"), F.col("p").alias("_pi"))
        pj = p.select(F.col("i").alias("j"), F.col("p").alias("_pj"))
        terms = (
            g.join(F.broadcast(pi), "i")
            .join(F.broadcast(pj), "j")
            .select(
                "i",
                F.struct(
                    F.col("j").alias("k"),
                    (F.col("n") / (F.col("_pi") + F.col("_pj"))).alias("v"),
                ).alias("_t"),
            )
        )
        den = terms.groupBy("i").agg(
            _ordered_sum(F.collect_list("_t")).alias("_den")
        )
        raw = (
            F.broadcast(wins)
            .join(den, "i")
            .select("i", F.round(F.col("wn") / F.col("_den"), 6).alias("_raw"))
        )
        tot = raw.agg(
            _ordered_sum(
                F.collect_list(F.struct(F.col("i").alias("k"),
                                        F.col("_raw").alias("v")))
            ).alias("_tot")
        )
        p = raw.crossJoin(F.broadcast(tot)).select(
            "i", F.round(F.col("_raw") / F.col("_tot"), 6).alias("p")
        )
    return (
        p.select(F.col("i").alias("event_type"), F.col("p").alias("strength"))
        .orderBy(F.desc("strength"), F.asc("event_type"))
    )


def _o_bradley_terry() -> str:
    fold = lambda expr, order: (  # noqa: E731
        f"list_reduce(list_prepend(0.0::double, list({expr} ORDER BY {order})),"
        f" (a, b) -> a + b)"
    )
    iters = []
    prev = "p0"
    for t in range(1, BT_ITERS + 1):
        iters.append(f"""
t{t} AS (SELECT g.i, g.j, g.n / (pi.p + pj.p) AS term
         FROM g JOIN {prev} pi ON pi.i = g.i JOIN {prev} pj ON pj.i = g.j),
den{t} AS (SELECT i, {fold('term', 'j')} AS den FROM t{t} GROUP BY i),
r{t} AS (SELECT w.i, round(w.wn / den, 6) AS raw
         FROM wins w JOIN den{t} USING (i)),
tot{t} AS (SELECT {fold('raw', 'i')} AS tot FROM r{t}),
p{t} AS (SELECT i, round(raw / tot, 6) AS p FROM r{t} CROSS JOIN tot{t})""")
        prev = f"p{t}"
    return f"""
WITH e AS (SELECT user_id, event_id, event_type,
                  round(value * 100)::bigint AS c FROM events),
ch AS (SELECT user_id, event_type AS t, c,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY c DESC, event_id ASC) AS rn FROM e),
rj AS (SELECT user_id, event_type AS t, c,
              row_number() OVER (PARTITION BY user_id
                                 ORDER BY c ASC, event_id ASC) AS rn FROM e),
m AS (SELECT ch.t AS w, rj.t AS l
      FROM ch JOIN rj ON ch.user_id = rj.user_id AND ch.rn = 1 AND rj.rn = 1
      WHERE ch.c > rj.c AND ch.t <> rj.t),
d AS (SELECT w, l, count(*)::double AS n FROM m GROUP BY 1, 2),
g AS (SELECT i, j, sum(n) AS n FROM (
        SELECT w AS i, l AS j, n FROM d
        UNION ALL SELECT l AS i, w AS j, n FROM d) GROUP BY 1, 2),
wins AS (SELECT w AS i, sum(n)::double AS wn FROM d GROUP BY 1),
p0 AS (SELECT DISTINCT i, 1.0::double AS p FROM g),{','.join(iters)}
SELECT i AS event_type, p AS strength FROM p{BT_ITERS}
ORDER BY strength DESC, event_type ASC
"""


O_BRADLEY_TERRY = _o_bradley_terry()


# --------------------------------------------------------------------- #
# Time-series panel: ES change_point, TSDB counter_rate, day-of-week
# seasonality, DAU/MAU stickiness, and a moving median.
# --------------------------------------------------------------------- #


def q_change_point(spark, sf_dir):
    """ES change_point aggregation (the step-change detector), exact
    twin: over the daily value-sum series, the split day d maximizing
    |mean(before d) - mean(from d)| with both sides >= 3 days — a
    deterministic single-changepoint scan (the CUSUM family's argmax
    form). Prefix sums come from exact cents via an ordered window, so
    both engines score identical operands; ties break to the earliest
    day. One groupBy to days + one window + a 1-row TakeOrdered."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"), cents.alias("_c"))
        .groupBy("day")
        .agg(F.sum("_c").alias("s"))
    )
    w = Window.orderBy("day")
    d = daily.select(
        "day",
        "s",
        F.sum("s").over(w).alias("_cum"),
        F.row_number().over(w).alias("_i"),
        F.sum("s").over(Window.partitionBy()).alias("_tot"),
        F.count("*").over(Window.partitionBy()).alias("_n"),
    )
    before_n = (F.col("_i") - 1).cast("double")
    after_n = (F.col("_n") - F.col("_i") + 1).cast("double")
    before_mean = (F.col("_cum") - F.col("s")).cast("double") / before_n
    after_mean = (F.col("_tot") - F.col("_cum") + F.col("s")).cast(
        "double"
    ) / after_n
    shift = F.round(F.abs(after_mean - before_mean) / 100.0, 6)
    return (
        d.filter((before_n >= 3) & (after_n >= 3))
        .select("day", shift.alias("mean_shift"))
        .orderBy(F.desc("mean_shift"), F.asc("day"))
        .limit(1)
    )


O_CHANGE_POINT = """
WITH daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                      sum(round(value * 100)::bigint)::bigint AS s
               FROM events GROUP BY 1),
d AS (SELECT day, s,
             sum(s) OVER (ORDER BY day) AS cum,
             row_number() OVER (ORDER BY day) AS i,
             sum(s) OVER () AS tot,
             count(*) OVER () AS n
      FROM daily)
SELECT day,
       round(abs((tot - cum + s)::double / (n - i + 1)
                 - (cum - s)::double / (i - 1)) / 100.0, 6) AS mean_shift
FROM d WHERE i - 1 >= 3 AND n - i + 1 >= 3
ORDER BY mean_shift DESC, day ASC LIMIT 1
"""


def q_counter_rate(spark, sf_dir):
    """ES TSDB counter_rate / Prometheus rate(): treat each user's
    running `value` stream as a monotonic counter WITH RESETS — the
    per-user rate is the sum of positive deltas between consecutive
    observations (a reset, i.e. a negative delta, contributes the new
    absolute value, the Prometheus extrapolation-free core). Exact
    cents deltas via lag over (user, ts-order); top 10 users by total
    increase. ONE window shuffle keyed by user."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", sec.alias("_t"), cents.alias("_c")
    )
    delta = F.col("_c") - F.lag("_c").over(w)
    inc = F.when(F.lag("_c").over(w).isNull(), F.lit(0)).otherwise(
        F.when(delta >= 0, delta).otherwise(F.col("_c"))
    )
    return (
        e.select("user_id", inc.alias("_inc"))
        .groupBy("user_id")
        .agg((F.sum("_inc").cast("double") / 100.0).alias("total_increase"))
        .orderBy(F.desc("total_increase"), F.asc("user_id"))
        .limit(10)
    )


O_COUNTER_RATE = """
WITH e AS (SELECT user_id, event_id, floor(epoch(ts))::bigint AS t,
                  round(value * 100)::bigint AS c FROM events),
d AS (SELECT user_id, c,
             lag(c) OVER (PARTITION BY user_id ORDER BY t, event_id) AS pc
      FROM e),
i AS (SELECT user_id,
             CASE WHEN pc IS NULL THEN 0
                  WHEN c - pc >= 0 THEN c - pc
                  ELSE c END AS inc
      FROM d)
SELECT user_id, sum(inc)::double / 100.0 AS total_increase
FROM i GROUP BY 1 ORDER BY total_increase DESC, user_id ASC LIMIT 10
"""


def q_dow_profile(spark, sf_dir):
    """Day-of-week seasonality profile (the Kibana heatmap row): count
    and exact-cents average value per weekday, weekday = epoch-day mod 7
    (timezone-free — day 0 is a Thursday, the same on both engines, so
    no locale/DOW-convention drift). One keyed groupBy."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        _events(spark, sf_dir)
        .select(
            (F.floor(sec / 86400) % 7).cast("long").alias("dow"),
            cents.alias("_c"),
        )
        .groupBy("dow")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            F.round(F.sum("_c").cast("double") / F.count("*") / 100.0, 6).alias(
                "avg_value"
            ),
        )
        .orderBy("dow")
    )


O_DOW_PROFILE = """
SELECT (floor(floor(epoch(ts))::bigint / 86400) % 7)::bigint AS dow,
       count(*)::bigint AS cnt,
       round(sum(round(value * 100)::bigint)::double / count(*) / 100.0, 6)
         AS avg_value
FROM events GROUP BY 1 ORDER BY dow
"""


DAU_MAU_WINDOW = 7


def q_dau_mau(spark, sf_dir):
    """Product-analytics stickiness: per day, DAU / trailing-{DAU_MAU_WINDOW}-day
    active users (the DAU/MAU ratio at a window the one-month fixture
    can fill). Exact form: distinct (day, user) once, then a bounded
    day-range self-join (each day joins its <= {DAU_MAU_WINDOW} trailing
    days — fanout is WINDOW×, never data²) and a distinct-user count per
    anchor day. Warm-up days (fewer than {DAU_MAU_WINDOW} prior days in
    the data) are emitted too — the ratio is still well-defined."""
    sec = F.col("ts").cast("timestamp").cast("long")
    du = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"), "user_id")
        .distinct()
    )
    days = du.select("day").distinct()
    a = days.alias("a")
    b = du.alias("b")
    joined = a.join(
        b,
        (F.col("b.day") <= F.col("a.day"))
        & (F.col("b.day") > F.col("a.day") - DAU_MAU_WINDOW),
    )
    wau = joined.groupBy(F.col("a.day").alias("day")).agg(
        F.countDistinct("b.user_id").cast("long").alias("wau")
    )
    dau = du.groupBy("day").agg(
        F.countDistinct("user_id").cast("long").alias("dau")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
        .orderBy("day")
    )


O_DAU_MAU = f"""
WITH du AS (SELECT DISTINCT
              floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
              user_id
            FROM events),
days AS (SELECT DISTINCT day FROM du),
wau AS (SELECT a.day, count(DISTINCT b.user_id)::bigint AS wau
        FROM days a JOIN du b
          ON b.day <= a.day AND b.day > a.day - {DAU_MAU_WINDOW}
        GROUP BY 1),
dau AS (SELECT day, count(DISTINCT user_id)::bigint AS dau
        FROM du GROUP BY 1)
SELECT day, dau, wau, round(dau / wau::double, 6) AS stickiness
FROM dau JOIN wau USING (day) ORDER BY day
"""


def q_moving_median(spark, sf_dir):
    """ES moving_fn with a median window function: trailing 7-day
    median (window INCLUDES the current day, ES's default window
    alignment) of the daily value sum. Exact interpolated percentile
    over integer cents inside the frame — the same Spark `percentile`
    == DuckDB `quantile_cont` identity as q_boxplot_value, applied as a
    window aggregate over the day-count-sized series."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"), cents.alias("_c"))
        .groupBy("day")
        .agg(F.sum("_c").alias("s"))
    )
    w = Window.orderBy("day").rowsBetween(-6, 0)
    med = F.expr("percentile(s, 0.5D)").over(w)
    return daily.select(
        "day",
        (F.col("s").cast("double") / 100.0).alias("day_sum"),
        F.round(med / 100.0, 6).alias("moving_median"),
    ).orderBy("day")


O_MOVING_MEDIAN = """
WITH daily AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                      sum(round(value * 100)::bigint)::bigint AS s
               FROM events GROUP BY 1)
SELECT day, s::double / 100.0 AS day_sum,
       round(quantile_cont(s, 0.5) OVER
               (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
             / 100.0, 6) AS moving_median
FROM daily ORDER BY day
"""


# --------------------------------------------------------------------- #
# Keyword-field index facet: the dictionary-only facet path, oracled.
# --------------------------------------------------------------------- #


def q_index_keyword_facet(spark, sf_dir):
    """Dictionary-only keyword facets from a real index
    (Searcher.facet_keyword over IndexBuilder(keyword_fields=...)):
    documents indexed with `source` as a keyword field, bucket counts
    read from the TERM DICTIONARY's df column alone — zero postings or
    stored bytes (plan-asserted in tests/test_keyword_fields.py). The
    oracle is the plain stored-side groupBy, so a green row proves the
    namespaced keyword postings carry exact per-value doc counts
    through the whole build/merge pipeline."""
    from nlp4l_spark.index import IndexBuilder
    from nlp4l_spark.index.catalog import IndexCatalog
    from nlp4l_spark.search import Searcher

    idx = _index_cache_dir(sf_dir) + "_kw1"
    cat = IndexCatalog(idx)
    if not cat.is_committed("field_stats"):
        IndexBuilder(
            sort_cols=("doc_id",), keyword_fields=("source",)
        ).build(_docs(spark, sf_dir), idx)
    return (
        Searcher(spark, idx)
        .facet_keyword("source")
        .select("value", "cnt")
        .orderBy(F.desc("cnt"), F.asc("value"))
    )


O_INDEX_KEYWORD_FACET = """
SELECT source AS value, count(*)::bigint AS cnt
FROM documents GROUP BY 1 ORDER BY cnt DESC, value ASC
"""


# --------------------------------------------------------------------- #
# Ranking-comparison metrics: RBO and Kendall tau between two scorers.
# --------------------------------------------------------------------- #
RBO_P = 0.9
RBO_K = 10


def _two_rankings(spark, sf_dir):
    """Top-{RBO_K} rankings of the SAME query under two scorers: BM25
    (rank_a) and raw tf-sum (rank_b), both 6dp/tiebreak-deterministic."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    tf_sum = None
    for t in BM25_TERMS:
        x = F.coalesce(F.col("m")[t].cast("long"), F.lit(0))
        tf_sum = x if tf_sum is None else tf_sum + x
    matched = (
        per_doc.withColumn(
            "sa", F.round(_bm25_score_col(BM25_TERMS, n, avgdl, dfs), 6)
        )
        .withColumn("sb", tf_sum)
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .select("doc_id", "sa", "sb")
        # both rank branches and their join read this table — cached so
        # the tokenize pass runs once, not once per branch
        .persist()
    )
    wa = Window.orderBy(F.desc("sa"), F.asc("doc_id"))
    wb = Window.orderBy(F.desc("sb"), F.asc("doc_id"))
    ra = (
        matched.select("doc_id", F.row_number().over(wa).alias("rank_a"))
        .filter(F.col("rank_a") <= RBO_K)
    )
    rb = (
        matched.select("doc_id", F.row_number().over(wb).alias("rank_b"))
        .filter(F.col("rank_b") <= RBO_K)
    )
    return ra, rb


_RANKINGS_SQL = f"""
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
sc AS (SELECT dt.doc_id,
              round(sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))), 6) AS sa,
              sum(tf)::bigint AS sb
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
ra AS (SELECT doc_id, rank_a FROM (
         SELECT doc_id, row_number() OVER (ORDER BY sa DESC, doc_id ASC) AS rank_a
         FROM sc) WHERE rank_a <= {RBO_K}),
rb AS (SELECT doc_id, rank_b FROM (
         SELECT doc_id, row_number() OVER (ORDER BY sb DESC, doc_id ASC) AS rank_b
         FROM sc) WHERE rank_b <= {RBO_K})
"""


def q_rbo_rankings(spark, sf_dir):
    """Rank-biased overlap (Webber, Moffat & Zobel 2010) between the
    BM25 and tf-sum rankings of the same query — the standard metric
    for 'how much did my ranker change', truncated at depth {RBO_K}
    without extrapolation (the lower-bound estimate): RBO = (1−p) ·
    Σ_d p^(d−1)·|A_d ∩ B_d|/d, p={RBO_P}. Per-depth intersection sizes
    come from a depth-spine × rank-pair join (both tables are k rows);
    the final ≤{RBO_K}-term sum folds in explicit depth order so both
    engines add identical operands identically."""
    ra, rb = _two_rankings(spark, sf_dir)
    both = ra.join(rb, "doc_id")
    depths = spark.range(1, RBO_K + 1).select(F.col("id").alias("d"))
    xd = (
        depths.join(
            both,
            (F.col("rank_a") <= F.col("d")) & (F.col("rank_b") <= F.col("d")),
            "left",
        )
        .groupBy("d")
        .agg(F.count("doc_id").cast("double").alias("x"))
    )
    term = F.struct(
        F.col("d").alias("k"),
        (
            F.pow(F.lit(RBO_P), F.col("d") - 1) * F.col("x") / F.col("d")
        ).alias("v"),
    )
    folded = xd.agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(term)), lambda s: s["v"]
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("_s")
    )
    return folded.select(
        F.round(F.lit(1.0 - RBO_P) * F.col("_s"), 6).alias("rbo")
    )


O_RBO_RANKINGS = f"""
WITH {TOKS_CTE},
{_RANKINGS_SQL},
both_r AS (SELECT ra.doc_id, rank_a, rank_b FROM ra JOIN rb USING (doc_id)),
depths AS (SELECT unnest(generate_series(1, {RBO_K}))::bigint AS d),
xd AS (SELECT d, count(doc_id)::double AS x
       FROM depths LEFT JOIN both_r
         ON rank_a <= d AND rank_b <= d
       GROUP BY d),
terms AS (SELECT d, pow({RBO_P}, d - 1) * x / d AS v FROM xd),
folded AS (SELECT list_reduce(
             list_prepend(0.0::double, list(v ORDER BY d)),
             (a, b) -> a + b) AS s FROM terms)
SELECT round((1.0 - {RBO_P}) * s, 6) AS rbo FROM folded
"""


def q_rank_correlation(spark, sf_dir):
    """Kendall tau-a between the two rankings over their COMMON top-{RBO_K}
    docs: concordant minus discordant ordered pairs over n(n−1)/2 — the
    rank-stability number an A/B ranking change reports next to RBO.
    Exact integer pair counts; one k²-bounded self-join."""
    ra, rb = _two_rankings(spark, sf_dir)
    both = ra.join(rb, "doc_id")
    a = both.alias("a")
    b = both.alias("b")
    pairs = a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
    sgn = (F.col("a.rank_a") - F.col("b.rank_a")) * (
        F.col("a.rank_b") - F.col("b.rank_b")
    )
    agg = pairs.agg(
        F.sum((sgn > 0).cast("long")).alias("c"),
        F.sum((sgn < 0).cast("long")).alias("d"),
        F.count("*").cast("long").alias("np"),
    )
    return agg.select(
        F.round(
            (F.col("c") - F.col("d")).cast("double") / F.col("np"), 6
        ).alias("tau"),
        F.col("np").alias("n_pairs"),
    )


O_RANK_CORRELATION = f"""
WITH {TOKS_CTE},
{_RANKINGS_SQL},
both_r AS (SELECT ra.doc_id, rank_a, rank_b FROM ra JOIN rb USING (doc_id)),
p AS (SELECT (a.rank_a - b.rank_a) * (a.rank_b - b.rank_b) AS sgn
      FROM both_r a JOIN both_r b ON a.doc_id < b.doc_id)
SELECT round((sum((sgn > 0)::bigint) - sum((sgn < 0)::bigint))::double
             / count(*), 6) AS tau,
       count(*)::bigint AS n_pairs
FROM p
"""


# --------------------------------------------------------------------- #
# Matryoshka truncation quality: recall@k of half-dimension cosine
# retrieval against the full-dimension ranking.
# --------------------------------------------------------------------- #
MR_DIM = 32
MR_QUERIES = 5
MR_K = 10


def q_matryoshka_recall(spark, sf_dir):
    """Matryoshka-embedding truncation report (Kusupati et al. 2022 —
    the 'can I serve the first {MR_DIM} of 64 dims' decision): for each
    of {MR_QUERIES} query vectors, recall@{MR_K} of the truncated-dim
    exact cosine top-k against the full-dim top-k. Rankings reuse the
    oracled brute-force cosine path (6dp round + id tiebreak) on the
    full and sliced vectors; the per-query overlap is a {MR_K}-row
    driver fold (bounded collects, the MMR convention). Note the
    fixture embeddings are random — truncation recall is LOW here by
    construction; the operator's contract is the measurement, which the
    oracle reproduces exactly."""
    from nlp4l_spark.ops import similarity

    emb = _embeddings(spark, sf_dir)
    qrows = {
        r["vec_id"]: list(r["embedding"])
        for r in emb.filter(F.col("vec_id") < MR_QUERIES)
        .select("vec_id", "embedding")
        .collect()
    }
    trunc = emb.select(
        "vec_id", F.slice("embedding", 1, MR_DIM).alias("embedding")
    )
    rows = []
    for qid in sorted(qrows):
        full_ids = {
            r["vec_id"]
            for r in similarity.brute_force_cosine_topk(
                emb, qrows[qid], k=MR_K
            ).collect()
        }
        tr_ids = {
            r["vec_id"]
            for r in similarity.brute_force_cosine_topk(
                trunc, qrows[qid][:MR_DIM], k=MR_K
            ).collect()
        }
        rows.append((qid, round(len(full_ids & tr_ids) / MR_K, 6)))
    return spark.createDataFrame(rows, "query_id long, recall double").orderBy(
        "query_id"
    )


def _o_matryoshka() -> str:
    def cos(prefix_len: int | None) -> str:
        if prefix_len is None:
            rng, a, b = "range(1, len(embedding) + 1)", "embedding", "qe"
        else:
            rng, a, b = f"range(1, {prefix_len + 1})", "embedding", "qe"
        return (
            f"list_aggregate(list_transform({rng},"
            f" i -> {a}[i]::double * {b}[i]::double), 'sum')"
            f" / (sqrt(list_aggregate(list_transform("
            f"{a if prefix_len is None else f'{a}[1:{prefix_len}]'},"
            f" x -> x::double * x::double), 'sum'))"
            f" * sqrt(list_aggregate(list_transform("
            f"{b if prefix_len is None else f'{b}[1:{prefix_len}]'},"
            f" x -> x::double * x::double), 'sum')))"
        )

    return f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
           WHERE vec_id < {MR_QUERIES}),
sc AS (SELECT qid, vec_id,
              round({cos(None)}, 6) AS cf,
              round({cos(MR_DIM)}, 6) AS ct
       FROM embeddings CROSS JOIN q),
fa AS (SELECT qid, vec_id FROM (
         SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY cf DESC, vec_id ASC) AS rn
         FROM sc) WHERE rn <= {MR_K}),
tb AS (SELECT qid, vec_id FROM (
         SELECT qid, vec_id,
                row_number() OVER (PARTITION BY qid
                                   ORDER BY ct DESC, vec_id ASC) AS rn
         FROM sc) WHERE rn <= {MR_K})
SELECT fa.qid AS query_id,
       round(count(*) / {float(MR_K)}, 6) AS recall
FROM fa JOIN tb ON fa.qid = tb.qid AND fa.vec_id = tb.vec_id
GROUP BY fa.qid ORDER BY query_id
"""


O_MATRYOSHKA_RECALL = _o_matryoshka()


# --------------------------------------------------------------------- #
# Sequential patterns, contrastive hard negatives, and content-defined
# chunking stats.
# --------------------------------------------------------------------- #


def q_frequent_sequences(spark, sf_dir):
    """Frequent 3-step behavioral sequences (the GSP/PrefixSpan report
    restricted to consecutive triples): per user, consecutive
    event_type triples in (ts, event_id) order, top 10 by support —
    the funnel-mining extension of `event_transitions` (which stops at
    pairs). ONE user-keyed window shuffle produces both leads; the
    triple table groupBy is event-type³ bounded."""
    sec = F.col("ts").cast("timestamp").cast("long")
    w = Window.partitionBy("user_id").orderBy("_t", "event_id")
    e = _events(spark, sf_dir).select(
        "user_id", "event_id", sec.alias("_t"), "event_type"
    )
    tri = e.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("e1"), F.asc("e2"), F.asc("e3"))
        .limit(10)
    )


O_FREQUENT_SEQUENCES = """
WITH e AS (SELECT user_id, event_id, floor(epoch(ts))::bigint AS t,
                  event_type FROM events),
tri AS (SELECT event_type AS e1,
               lead(event_type, 1) OVER w AS e2,
               lead(event_type, 2) OVER w AS e3
        FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
SELECT e1, e2, e3, count(*)::bigint AS cnt
FROM tri WHERE e3 IS NOT NULL
GROUP BY 1, 2, 3 ORDER BY cnt DESC, e1, e2, e3 LIMIT 10
"""


def q_hard_negatives(spark, sf_dir):
    """Contrastive hard-negative mining (the DPR/SimCSE training-data
    step): for each of the first {MR_QUERIES} query vectors, the
    single most-similar vector with a DIFFERENT label — the negative a
    contrastive loss learns the most from. Exact cosine on the oracled
    brute-force expression, 6dp round + id tiebreak; the label
    inequality is a pushed filter per query. At scale this runs on the
    ANN index's candidate set instead of the full corpus (same
    contract, pruned candidates)."""
    from nlp4l_spark.ops import similarity

    emb = _embeddings(spark, sf_dir)
    qrows = [
        (r["vec_id"], list(r["embedding"]), r["label"])
        for r in emb.filter(F.col("vec_id") < MR_QUERIES)
        .select("vec_id", "embedding", "label")
        .collect()
    ]
    out = None
    for qid, qvec, qlabel in sorted(qrows):
        top = (
            similarity.brute_force_cosine_topk(
                emb, qvec, k=1, where=(F.col("label") != qlabel)
            )
            .select(
                F.lit(qid).cast("long").alias("query_id"),
                F.col("vec_id").alias("neg_id"),
                F.col("cosine"),
            )
        )
        out = top if out is None else out.unionByName(top)
    return out.orderBy("query_id")


O_HARD_NEGATIVES = f"""
WITH q AS (SELECT vec_id AS qid, embedding AS qe, label AS ql
           FROM embeddings WHERE vec_id < {MR_QUERIES}),
sc AS (SELECT qid, vec_id,
              round(list_aggregate(list_transform(
                        range(1, len(embedding) + 1),
                        i -> embedding[i]::double * qe[i]::double), 'sum')
                    / (sqrt(list_aggregate(list_transform(embedding,
                          x -> x::double * x::double), 'sum'))
                       * sqrt(list_aggregate(list_transform(qe,
                          x -> x::double * x::double), 'sum'))), 6) AS c
       FROM embeddings CROSS JOIN q
       WHERE label <> ql),
r AS (SELECT qid, vec_id, c,
             row_number() OVER (PARTITION BY qid
                                ORDER BY c DESC, vec_id ASC) AS rn
      FROM sc)
SELECT qid AS query_id, vec_id AS neg_id, c AS cosine
FROM r WHERE rn = 1 ORDER BY query_id
"""


CDC_MASK = 16


def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking stats (the FastCDC/rsync boundary idea
    on the analyzed token stream — the Spark-native form a
    dedup-friendly corpus store uses so edits don't shift every chunk):
    a token ENDS a chunk when hash(token) % {CDC_MASK} == 0, giving
    expected chunk length {CDC_MASK}; per source, doc count, total
    chunks, and bytes-stable average chunk length from EXACT integer
    sums (sum dl / sum chunks — never an average of per-doc doubles).
    The hash is the repo's cross-engine md5-32 contract; at scale
    you'd swap xxhash64 (same semantics, cheaper). One tokenize scan +
    one source groupBy."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    h32 = lambda c: F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast(  # noqa: E731
        "long"
    )
    boundaries = F.size(
        F.filter(toks, lambda t: h32(t) % CDC_MASK == F.lit(0))
    )
    dl = F.size(toks)
    d = _docs(spark, sf_dir).select(
        "source",
        dl.alias("_dl"),
        F.when(dl > 0, boundaries + 1).otherwise(F.lit(0)).alias("_nc"),
    )
    return (
        d.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("_nc").cast("long").alias("total_chunks"),
            F.round(
                F.sum("_dl").cast("double") / F.sum("_nc"), 6
            ).alias("avg_chunk_len"),
        )
        .orderBy("source")
    )


O_CDC_CHUNKS = f"""
WITH d AS (SELECT source,
                  len({TOK_SQL}) AS dl,
                  CASE WHEN len({TOK_SQL}) > 0 THEN
                    len(list_filter({TOK_SQL},
                        t -> ('0x' || substr(md5(t), 1, 8))::bigint
                             % {CDC_MASK} = 0)) + 1
                  ELSE 0 END AS nc
           FROM documents)
SELECT source, count(*)::bigint AS n_docs,
       sum(nc)::bigint AS total_chunks,
       round(sum(dl)::double / sum(nc), 6) AS avg_chunk_len
FROM d GROUP BY 1 ORDER BY source
"""


# --------------------------------------------------------------------- #
