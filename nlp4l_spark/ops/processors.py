"""Built-in processor parity: the reference's framework/builtin operators
re-expressed as DataFrame transformations (SURVEY.md §2.3/§2.4/§2.5).

Each function documents the reference operator it reproduces (file:line in
/root/reference). All are pure DataFrame ops — Catalyst handles pushdown,
partial aggregation and broadcast; none of these materialize on the driver
(the reference materializes every Dictionary in driver memory,
ProcessorChain.scala:65-98 — the rebuild's biggest semantic upgrade).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def unique(df: DataFrame, col: str) -> DataFrame:
    """UniqueProcessor (FeaturedProcessors.scala:61-92): drop records whose
    key equals the previous record's on sorted input == distinct-by-key."""
    w = Window.partitionBy(col).orderBy(*[c for c in df.columns])
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def merge_records(
    df: DataFrame, key: str, glue: str = " ", value_cols: list[str] | None = None
) -> DataFrame:
    """MergeProcessor (InternalProcessors.scala:92-116 + DataModels.scala:
    52-64): merge records with equal key, concatenating string cells with a
    glue. Sorted-adjacent in the reference == groupBy on unique keys."""
    value_cols = value_cols or [c for c in df.columns if c != key]
    aggs = [
        F.concat_ws(glue, F.collect_list(c)).alias(c) for c in value_cols
    ]
    return df.groupBy(key).agg(*aggs)


def replay(
    df: DataFrame,
    *,
    modified: DataFrame | None = None,
    deleted_hashes: list | None = None,
    added: DataFrame | None = None,
    hash_col: str = "record_hash",
) -> DataFrame:
    """ReplayProcessor (InternalProcessors.scala:129-149): overlay user
    edits keyed by record hash — deletes drop, mods replace, adds append.
    == MERGE INTO: anti-join deletes, anti-join+union mods, union adds."""
    out = df
    if deleted_hashes:
        out = out.filter(~F.col(hash_col).isin(list(deleted_hashes)))
    if modified is not None:
        out = out.join(
            modified.select(hash_col), hash_col, "left_anti"
        ).unionByName(modified)
    if added is not None:
        out = out.unionByName(added)
    return out


def record_hash(df: DataFrame, business_cols: list[str], out_col: str = "record_hash") -> DataFrame:
    """The Record.hashCode stable-identity concept (DataModels.scala:130-135)
    as a deterministic xxhash64 over business-key columns (SURVEY.md §1.1)."""
    return df.withColumn(out_col, F.xxhash64(*business_cols))


def stop_words(df: DataFrame, col: str, stopwords: frozenset[str] | list[str]) -> DataFrame:
    """StopWordsProcessor (FeaturedProcessors.scala:228-259): drop records
    whose cell value is in the stopword set."""
    return df.filter(~F.col(col).isin(list(stopwords)))


def sort_processor(df: DataFrame, col: str, order: str = "asc") -> DataFrame:
    """SortProcessor (InternalProcessors.scala:48-73) — the reference ships
    the whole dataset to an RDBMS to sort; here it's one Spark range-
    partitioned sort."""
    return df.orderBy(F.col(col).asc() if order == "asc" else F.col(col).desc())


def regex_validator(df: DataFrame, col: str, accept_regex: str) -> tuple[bool, int]:
    """RegexValidator (FeaturedValidators.scala:88-130): all values must
    match. Returns (ok, violation_count) — an aggregation, not a collect."""
    bad = df.filter(~F.col(col).rlike(accept_regex)).count()
    return bad == 0, bad


def unique_record_validator(df: DataFrame, col: str) -> tuple[bool, int]:
    """UniqueRecordValidator (FeaturedValidators.scala:35-73)."""
    dup = df.groupBy(col).count().filter(F.col("count") > 1).count()
    return dup == 0, dup


def search_validator(
    values: DataFrame, value_col: str, terms: DataFrame, term_col: str = "term"
) -> DataFrame:
    """SolrSearchValidator (FeaturedValidators.scala:144-192): every value
    must get >= 1 hit when searched against a collection. The external Solr
    round-trip becomes a membership check against our own index's term
    dictionary: the (tiny) values frame is broadcast against the dictionary
    scan, the matched subset (also tiny) is broadcast back — the big side is
    only ever semi-joined, never shuffled."""
    probe = values.select(F.lower(F.col(value_col)).alias("_probe")).distinct()
    matched = (
        terms.select(F.col(term_col).alias("_probe"))
        .join(F.broadcast(probe), "_probe", "left_semi")
        .distinct()
        .withColumn("found", F.lit(True))
    )
    return (
        values.withColumn("_probe", F.lower(F.col(value_col)))
        .join(F.broadcast(matched), "_probe", "left")
        .select(value_col, F.coalesce("found", F.lit(False)).alias("found"))
    )


def parse_solr_log(df: DataFrame, line_col: str = "line") -> DataFrame:
    """StandardSolrQueryLogProcessor (FeaturedProcessors.scala:103-130):
    regex-parse Solr request logs -> (date, q, fq, facet_field, facet_query,
    hits, qtime)."""
    params = F.regexp_extract(F.col(line_col), r"params=\{(.*?)\}", 1)

    def p(name):
        return F.regexp_extract(params, rf"(?:^|&){name}=([^&]*)", 1)

    return df.select(
        F.regexp_extract(F.col(line_col), r"^(\S+\s+\S+)", 1).alias("date"),
        p("q").alias("q"),
        p("fq").alias("fq"),
        p("facet\\.field").alias("facet_field"),
        p("facet\\.query").alias("facet_query"),
        F.regexp_extract(F.col(line_col), r"hits=(\d+)", 1).cast("long").alias("hits"),
        F.regexp_extract(F.col(line_col), r"QTime=(\d+)", 1).cast("long").alias("qtime"),
    )


# ---- click-model analytics (ltr/support/procs/ClickModelAnalyzer.scala) ----
def click_rate(df: DataFrame, query_col: str, doc_col: str, click_col: str) -> DataFrame:
    """calcClickRate (:41-56): per (query, doc) clicks/impressions."""
    return df.groupBy(query_col, doc_col).agg(
        (F.sum(F.col(click_col).cast("double")) / F.count("*")).alias("click_rate")
    )


def filter_top_queries(df: DataFrame, query_col: str, n: int) -> DataFrame:
    """filterTopQueries (:36-39): keep rows of the n most frequent queries.
    Top-n is a tiny broadcast semi-join, not a shuffle of the log."""
    top = df.groupBy(query_col).count().orderBy(F.desc("count"), F.asc(query_col)).limit(n)
    return df.join(F.broadcast(top.select(query_col)), query_col, "left_semi")


def dcm_truncate(df: DataFrame, imps_col: str, clicks_col: str) -> DataFrame:
    """filterAsDCM (:24-34): truncate each impression list at the last
    clicked position (Dependent Click Model) — array HOFs, no UDF."""
    last_click = F.array_max(
        F.transform(
            F.col(clicks_col),
            lambda c, i: F.when(c == 1, i + 1).otherwise(0),
        )
    )
    return df.withColumn(
        "_n", F.greatest(last_click, F.lit(0))
    ).select(
        *[c for c in df.columns if c not in (imps_col, clicks_col)],
        F.slice(F.col(imps_col), 1, F.col("_n")).alias(imps_col),
        F.slice(F.col(clicks_col), 1, F.col("_n")).alias(clicks_col),
    )


def rate_to_label(df: DataFrame, rate_col: str, boundaries: list[float]) -> DataFrame:
    """convertClickRateToLabel (:58-69): bucketize rates into graded labels;
    label = #boundaries - index of first boundary <= rate (desc thresholds)."""
    expr = F.lit(0)
    for i, b in enumerate(sorted(boundaries)):
        expr = F.when(F.col(rate_col) >= F.lit(b), F.lit(i + 1)).otherwise(expr)
    return df.withColumn("label", expr.cast("int"))


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the gap to the
    previous event of the same user exceeds ``gap_seconds``. One window
    pass (lag + running sum) — the standard scalable formulation: state is
    per-user-partition, no driver involvement, no UDF. Output adds
    ``session_id`` (0-based per user)."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    # NTZ timestamps can't cast straight to long; the tz-cast offset
    # cancels in the gap difference
    secs = F.col(ts_col).cast("timestamp").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_sess = F.when(
        gap.isNull() | (gap > gap_seconds), F.lit(1)
    ).otherwise(F.lit(0))
    return df.withColumn(
        "session_id",
        (F.sum(new_sess).over(w) - F.lit(1)).cast("int"),
    )


def funnel_steps(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str] | tuple[str, ...],
) -> DataFrame:
    """Ordered-funnel analysis: for each key (user/session), how far
    through the ordered ``steps`` sequence its event history gets, where
    step k counts only if it occurs strictly AFTER the matched step k-1
    (subsequence semantics — the product-analytics funnel). Greedy
    earliest-match is exact for subsequence existence, so the
    implementation is per-step: t1 = min ts of step 1, t2 = min ts of
    step 2 with ts > t1, ... Returns one row per key that ENTERED the
    funnel (matched step 1): (key_col, reached, t_1..t_n epoch seconds,
    nulls from the step where the funnel breaks).

    Plan shape: one filtered min-aggregate per step (n_steps small,
    fixed) joined on the key — every join is key-equality on
    already-aggregated (one row per key) sides; the raw event table is
    scanned once per step with the step filter pushed down, never
    self-joined at event granularity."""
    secs = F.col(ts_col).cast("timestamp").cast("long")
    ev = df.select(F.col(key_col), secs.alias("_sec"), F.col(type_col))
    out = None
    prev_t = None
    for i, step in enumerate(steps, start=1):
        side = ev.filter(F.col(type_col) == step)
        if out is None:
            agg = side.groupBy(key_col).agg(F.min("_sec").alias(f"t_{i}"))
            out = agg
        else:
            joined = side.join(
                out.select(key_col, F.col(f"t_{prev_t}")), key_col
            ).filter(F.col("_sec") > F.col(f"t_{prev_t}"))
            agg = joined.groupBy(key_col).agg(F.min("_sec").alias(f"t_{i}"))
            out = out.join(agg, key_col, "left")
        prev_t = i
    reached = sum(
        (F.col(f"t_{i}").isNotNull().cast("int") for i in range(1, len(steps) + 1)),
        F.lit(0),
    )
    return out.select(key_col, reached.alias("reached"), *[f"t_{i}" for i in range(1, len(steps) + 1)])


def rolling_stats(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int = 1800,
) -> DataFrame:
    """Per-event trailing time-window aggregates: for every event, the
    count / sum / mean of ``value_col`` over the same key's events in
    [ts - window_seconds, ts] (inclusive both ends — RANGE frame
    semantics, so simultaneous events are peers). The event-log
    monitoring primitive (rate in the last N minutes, trailing spend).

    One keyed window pass over epoch seconds — a RANGE BETWEEN frame,
    not a self-join: ONE shuffle on the key at any scale, zero row
    amplification. Adds ts_sec, n_win, sum_win, avg_win."""
    from pyspark.sql import Window

    secs = F.col(ts_col).cast("timestamp").cast("long")
    out = df.withColumn("ts_sec", secs)
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("ts_sec").asc())
        .rangeBetween(-int(window_seconds), 0)
    )
    return out.withColumns(
        {
            "n_win": F.count(value_col).over(w).cast("long"),
            "sum_win": F.round(F.sum(value_col).over(w), 6),
            "avg_win": F.round(F.avg(value_col).over(w), 6),
        }
    )


def ja_user_dictionary(
    df: DataFrame,
    cellname: str,
    analyzer,
    pos: str = "カスタム名詞",
) -> DataFrame:
    """JaUserDictionaryProcessor (FeaturedProcessors.scala:302-342): for
    every record's ``cellname`` surface string, run the Japanese analysis
    chain and emit ``(surface, terms, readings, pos)`` — terms and
    readings space-joined, ``NOREADING`` for tokens without a dictionary
    reading (generateRecord, :324-341; NOREADING at :263).

    ``analyzer`` is a :class:`~nlp4l_spark.analysis.jadict.JaUserDictAnalyzer`
    (user-dictionary leftmost-longest segmentation + CJK-bigram fallback).
    The whole op is ONE JVM scan: tokens via ``tokens_expr`` (regex +
    array HOFs), readings via a broadcast-literal map lookup — dictionary
    entries number in the thousands at most, so the map literal is the
    right distribution strategy (no join, no shuffle). Other columns of
    ``df`` ride through untouched (the reference emits only the four
    record cells; we keep input columns so the op composes — select the
    four to match the reference exactly)."""
    from nlp4l_spark.analysis.jadict import NOREADING

    toks = analyzer.tokens_expr(cellname)
    rmap = analyzer.reading_map()
    lookup = F.create_map(
        *[c for k in sorted(rmap) for c in (F.lit(k), F.lit(rmap[k]))]
    )
    return df.withColumns(
        {
            "surface": F.col(cellname),
            "terms": F.array_join(toks, " "),
            "readings": F.array_join(
                F.transform(
                    toks,
                    lambda t: F.coalesce(
                        F.element_at(lookup, t), F.lit(NOREADING)
                    ),
                ),
                " ",
            ),
            "pos": F.lit(pos),
        }
    )
