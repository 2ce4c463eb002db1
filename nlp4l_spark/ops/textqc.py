"""Text analysis for training-data pipelines: language ID, quality scores,
token counting, document fingerprinting.

Extension ops (reference analogue: the analyzer + stats surface). All the
per-doc scoring is built-in SQL expressions — a 100 TB quality pass is one
codegen'd scan with zero Python.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F

from nlp4l_spark.analysis import LUCENE_ENGLISH_STOPWORDS, Analyzer, WHITESPACE_ANALYZER

# tiny per-language marker vocabularies for the n-gram/stopword heuristic
_LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "fr": ["le", "la", "les", "des", "une", "est", "dans", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein"],
}


def token_count_col(text_col: str, analyzer: Analyzer | None = None):
    """Whitespace/alnum token count (BPE-ish proxy: alnum runs + punct runs
    each count as one token)."""
    return F.size(
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+|[^a-z0-9\\\\s]+', 0)"
        )
    )


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, token count, mean token length,
    punctuation ratio, stopword ratio, uppercase ratio, digit ratio."""
    toks = WHITESPACE_ANALYZER.tokens_expr(text_col)
    stop_arr = F.array(*[F.lit(w) for w in sorted(LUCENE_ENGLISH_STOPWORDS)])
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = n_chars - F.length(
        F.regexp_replace(F.col(text_col), r"[^\w\s]", "")
    )
    n_upper = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[A-Z]", "")
    ) + F.lit(0)
    n_digit = F.length(F.col(text_col)) - F.length(
        F.regexp_replace(F.col(text_col), r"[0-9]", "")
    )
    safe_chars = F.greatest(n_chars, F.lit(1)).cast("double")
    safe_toks = F.greatest(n_tokens, F.lit(1)).cast("double")
    return df.withColumns(
        {
            "n_chars_calc": n_chars,
            "n_tokens": n_tokens,
            "mean_token_len": F.round(
                F.aggregate(
                    F.transform(toks, lambda t: F.length(t).cast("double")),
                    F.lit(0.0),
                    lambda a, x: a + x,
                )
                / safe_toks,
                6,
            ),
            "punct_ratio": F.round(n_punct / safe_chars, 6),
            "stopword_ratio": F.round(n_stop / safe_toks, 6),
            "upper_ratio": F.round(n_upper / safe_chars, 6),
            "digit_ratio": F.round(n_digit / safe_chars, 6),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scalar quality score in [0,1]: heuristic blend of the features —
    long-enough, not punctuation-soup, some stopwords (naturalness)."""
    qf = quality_features(df, text_col)
    len_score = F.least(F.col("n_tokens") / F.lit(50.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(F.col("punct_ratio") * 4, F.lit(1.0))
    stop_score = F.least(F.col("stopword_ratio") * 3, F.lit(1.0))
    return qf.withColumn(
        "quality",
        F.round((len_score + punct_score + stop_score) / 3.0, 6),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax over per-language marker-word hit
    counts; 'und' when nothing matches. One scan, array HOFs only."""
    toks = WHITESPACE_ANALYZER.tokens_expr(text_col)
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        scores.append(
            F.struct(
                F.size(F.filter(toks, lambda t: F.array_contains(arr, t))).alias("hits"),
                F.lit(lang).alias("lang"),
            )
        )
    best = F.array_max(F.array(*scores))
    return df.withColumn(
        "lang_pred",
        F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und")),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints: md5 of normalized text (exact
    identity) + xxhash64 (cheap 64-bit rolling-hash analogue)."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumns(
        {"fp_md5": F.md5(norm), "fp_xx64": F.xxhash64(norm)}
    )


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer et al., SIGMOD'03) —
    the rolling-hash document fingerprint: hash every character k-gram of
    the normalized text, slide a window of ``w`` consecutive gram hashes,
    keep each window's minimum, dedupe. Guarantees any shared substring
    of length >= k + w - 1 between two documents yields a shared
    fingerprint — the substring-plagiarism/dup detector exact-hash and
    simhash both miss.

    All JVM expressions (sequence/transform/slice/array_min HOFs); gram
    identity = first 60 bits of md5 so the DuckDB oracle reproduces the
    EXACT fingerprint values (same trick as simhash). Output one row per
    (doc, fingerprint): (doc_id, fp) — join fp to find substring-sharing
    candidate pairs."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    empty = F.array().cast("array<long>")
    n_g = F.length(norm) - (k - 1)  # number of k-grams
    grams = F.when(
        n_g >= 1,
        F.transform(
            F.sequence(F.lit(1), n_g),
            lambda i: F.conv(
                F.substring(F.md5(norm.substr(i, F.lit(k))), 1, 15), 16, 10
            ).cast("long"),
        ),
    ).otherwise(empty)
    # grams materialized in its own projection: the windowing below
    # references it twice (size + slice) and Catalyst does not inline
    # non-cheap multiply-referenced projections, so the md5 pass runs once
    with_grams = df.select(id_col, grams.alias("_g"))
    n_w = F.size(F.col("_g")) - (w - 1)  # number of windows
    mins = F.when(
        n_w >= 1,
        F.transform(
            F.sequence(F.lit(1), n_w),
            lambda j: F.array_min(F.slice(F.col("_g"), j, w)),
        ),
    ).otherwise(empty)
    return (
        with_grams.select(
            id_col, F.explode(F.array_distinct(mins)).alias("fp")
        )
        .distinct()
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Substring-overlap candidate pairs via winnowing: docs sharing >=
    ``min_shared`` fingerprints — i.e. (at least) that many k+w-1-char
    common runs. The plagiarism/quote/boilerplate detector: catches
    copied PASSAGES inside otherwise-different documents, which
    whole-doc hashing and bag-of-shingles Jaccard both dilute away.
    Inverted-index self-join on the fingerprint (equality keys only,
    never all-pairs), like every dedup here."""
    fps = winnow_fingerprints(df, text_col, id_col, k=k, w=w)
    return (
        fps.alias("a")
        .join(
            fps.alias("b"),
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .agg(F.count("*").alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
    )


def repetition_features(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    ngram: int = 3,
    engine: str = "arrow",
) -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    §A1.1 — the standard LLM-corpus quality filters for machine-generated
    / boilerplate text):

    * ``top_token_frac``  — occurrences of the most frequent token / total
      tokens ("fraction of characters in the most common word" analogue),
    * ``top_bigram_frac`` — occurrences of the most frequent word 2-gram /
      total 2-gram positions,
    * ``dup_ngram_frac``  — fraction of word ``ngram``-gram positions whose
      n-gram occurs more than once in the document (duplicated-n-gram
      coverage).

    Both engines are one scan with ZERO shuffles — never the explode ->
    groupBy(doc, gram) formulation, which would shuffle corpus x ngram
    rows. ``engine='arrow'`` (default, the hot path) computes the integer
    numerators/denominators per batch in one Arrow pandas pass (Counter
    over tokens/n-grams) and leaves the division + round to JVM SQL so
    the values are bit-identical to the SQL engine and the DuckDB oracle;
    ``engine='sql'`` is the declarative pure-SQL twin (sorted-array
    linear-pass HOFs — correct everywhere Spark SQL runs, but Spark
    evaluates lambda HOFs interpreted, measured ~10x slower than the
    Arrow pass; identity is pinned by test)."""
    if engine == "arrow":
        counts = _repetition_counts_arrow(df, text_col, id_col, ngram)
    elif engine == "sql":
        counts = _repetition_counts_sql(df, text_col, id_col, ngram)
    else:
        raise ValueError(f"unknown engine {engine!r}")
    safe = lambda c: F.greatest(c, F.lit(1)).cast("double")
    return counts.select(
        id_col,
        F.col("_n").cast("long").alias("n_tokens"),
        F.round(F.col("_top_tok") / safe(F.col("_n")), 6).alias("top_token_frac"),
        F.round(F.col("_top_bg") / safe(F.col("_n_bg")), 6).alias("top_bigram_frac"),
        F.round(F.col("_dup_ng") / safe(F.col("_n_ng")), 6).alias("dup_ngram_frac"),
    )


def _repetition_counts_arrow(
    df: DataFrame, text_col: str, id_col: str, ngram: int
) -> DataFrame:
    """Integer repetition counts per doc in one Arrow-batched pandas pass."""
    tokenize = WHITESPACE_ANALYZER.tokenize

    @F.pandas_udf(
        "_n long, _top_tok long, _n_bg long, _top_bg long, _n_ng long, _dup_ng long"
    )
    def rep(texts: pd.Series) -> pd.DataFrame:
        from collections import Counter

        rows = []
        for t in texts:
            toks = tokenize(t)
            n = len(toks)
            top_tok = max(Counter(toks).values()) if toks else 0
            bgs = list(zip(toks, toks[1:]))
            top_bg = max(Counter(bgs).values()) if bgs else 0
            ngs = list(zip(*[toks[i:] for i in range(ngram)])) if n >= ngram else []
            cn = Counter(ngs)
            dup = sum(v for v in cn.values() if v >= 2)
            rows.append((n, top_tok, len(bgs), top_bg, len(ngs), dup))
        return pd.DataFrame(
            rows, columns=["_n", "_top_tok", "_n_bg", "_top_bg", "_n_ng", "_dup_ng"]
        )

    return df.select(id_col, rep(F.col(text_col)).alias("_r")).select(
        id_col, "_r.*"
    )


def _repetition_counts_sql(
    df: DataFrame, text_col: str, id_col: str, ngram: int
) -> DataFrame:
    """The declarative twin: per doc the gram arrays are SORTED once
    (O(L log L)) and every count is a single linear pass over the sorted
    array (max run length = max multiplicity; a position's gram is
    duplicated iff it equals a sorted neighbor)."""
    toks = WHITESPACE_ANALYZER.tokens_expr(text_col)
    base = df.select(id_col, toks.alias("_tk"))
    tk = F.col("_tk")
    n = F.size(tk)
    empty_s = F.array().cast("array<string>")

    def top_count(arr):
        # max multiplicity = longest equal-run of the sorted array, one
        # linear aggregate pass with (prev, run, best) state
        srt = F.array_sort(arr)

        def step(acc, x):
            run2 = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            return F.struct(
                x.alias("prev"),
                run2.alias("run"),
                F.greatest(acc["best"], run2).alias("best"),
            )

        return F.aggregate(
            srt,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).alias("run"),
                F.lit(0).alias("best"),
            ),
            step,
            lambda acc: acc["best"],
        )

    def grams(m: int):
        return F.when(
            n >= m,
            F.transform(
                F.sequence(F.lit(1), n - (m - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(m)]
                ),
            ),
        ).otherwise(empty_s)

    def dup_positions(arr):
        # positions whose gram occurs >1: on the sorted array, exactly the
        # elements equal to a neighbor (F.get is 0-based and null-safe at
        # the ends)
        srt = F.array_sort(arr)
        return F.when(
            F.size(srt) > 0,
            F.size(
                F.filter(
                    F.sequence(F.lit(0), F.size(srt) - 1),
                    lambda j: F.coalesce(
                        F.get(srt, j) == F.get(srt, j - 1), F.lit(False)
                    )
                    | F.coalesce(
                        F.get(srt, j) == F.get(srt, j + 1), F.lit(False)
                    ),
                )
            ),
        ).otherwise(F.lit(0))

    bg = grams(2)
    ng = grams(ngram)
    return base.select(
        id_col,
        n.cast("long").alias("_n"),
        top_count(tk).cast("long").alias("_top_tok"),
        F.size(bg).cast("long").alias("_n_bg"),
        top_count(bg).cast("long").alias("_top_bg"),
        F.size(ng).cast("long").alias("_n_ng"),
        dup_positions(ng).cast("long").alias("_dup_ng"),
    )


# ---- decontamination ----------------------------------------------------- #
def _word_ngram_rows(
    df: DataFrame, text_col: str, id_col: str, out_id: str, n: int
) -> DataFrame:
    """One row per (id, distinct word n-gram hash). Tokens are projected
    once (`_tk`) so the tokenizer regex runs a single time per row even
    though the gram expression references the array n+1 times (Catalyst
    does not inline non-cheap multiply-referenced projections — same
    pattern as winnow_fingerprints)."""
    toks = WHITESPACE_ANALYZER.tokens_expr(text_col)
    base = df.select(F.col(id_col).alias(out_id), toks.alias("_tk"))
    tk = F.col("_tk")
    cnt = F.size(tk)
    grams = F.when(
        cnt >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), cnt - (n - 1)),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tk, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return base.select(out_id, F.explode(grams).alias("_g")).select(
        out_id, F.xxhash64("_g").alias("_h")
    )


def contamination_pairs(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str = "eval_id",
    *,
    n: int = 4,
) -> DataFrame:
    """Benchmark decontamination, the GPT-3/Llama recipe (Brown et al.
    2020 §C): flag training documents sharing any word ``n``-gram with a
    held-out evaluation set. Output one row per contaminated
    (doc, eval doc) pair with the shared-n-gram count.

    Scale shape: the eval set is benchmark-sized (thousands of docs, not
    corpus-sized), so its exploded n-gram table is BROADCAST — the corpus
    side is one scan + explode with a broadcast hash join on the hashed
    gram (xxhash64 int64 keys, not strings), never a shuffle of the
    corpus. Contamination at 100 TB = one pass."""
    corpus_g = _word_ngram_rows(df, text_col, id_col, id_col, n)
    eval_g = _word_ngram_rows(eval_df, text_col, id_col, eval_id_col, n)
    return (
        corpus_g.join(F.broadcast(eval_g), "_h")
        .groupBy(id_col, eval_id_col)
        .agg(F.count("*").alias("shared_ngrams"))
    )


def decontaminate(
    df: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 4,
    min_shared: int = 1,
) -> DataFrame:
    """Drop training docs contaminated by the eval set (>= ``min_shared``
    shared word n-grams): broadcast left-anti join on the flagged ids."""
    flagged = (
        contamination_pairs(df, eval_df, text_col, id_col, n=n)
        .groupBy(id_col)
        .agg(F.sum("shared_ngrams").alias("_s"))
        .filter(F.col("_s") >= min_shared)
        .select(id_col)
    )
    return df.join(F.broadcast(flagged), id_col, "left_anti")


# ---- sequence packing ---------------------------------------------------- #
def pack_sequences(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    seq_len: int = 256,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chunk sequence packing — the standard LLM pre-training
    layout: documents are concatenated in a deterministic order and the
    token stream is cut into fixed-length training sequences. Emits, per
    document, its placement: ``shard``, ``pos_start`` (token offset of the
    doc inside its shard's stream), and the first/last sequence ids it
    lands in (``seq_first``/``seq_last``; a doc straddling a boundary
    spans several).

    Scale shape: a single global concatenation order would be one giant
    window — instead docs are hash-bucketed into ``n_shards`` independent
    streams (deterministic md5 bucket, engine-reproducible like
    ``deterministic_sample``) and the running-sum window runs per shard:
    shuffle by shard once, each shard's prefix sum is independent, shard
    count scales with the cluster. Token counts use the same BPE-ish
    proxy as ``token_count_col``."""
    from pyspark.sql import Window

    ntok = token_count_col(text_col)
    shard = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % n_shards
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    base = df.select(
        F.col(id_col), shard.alias("shard"), ntok.cast("long").alias("n_tokens")
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("pos_start")
    out = base.select(id_col, "shard", "n_tokens", start)
    return out.select(
        id_col,
        "shard",
        "n_tokens",
        "pos_start",
        F.floor(F.col("pos_start") / seq_len).cast("long").alias("seq_first"),
        F.floor(
            F.greatest(
                F.col("pos_start") + F.col("n_tokens") - 1, F.col("pos_start")
            )
            / seq_len
        )
        .cast("long")
        .alias("seq_last"),
    )


# ---- context-window chunking --------------------------------------------- #
def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    window: int = 32,
    stride: int = 24,
) -> DataFrame:
    """Split documents into overlapping context windows of ``window``
    tokens with step ``stride`` (stride < window = overlap, the standard
    long-document treatment for embedding / retrieval corpora). One chunk
    per start position 1, 1+stride, ... <= n_tokens; the last chunk may be
    short. Output (doc_id, chunk_idx, chunk_text, n_tokens).

    One scan, pure JVM array HOFs (tokens projected once, slice +
    array_join per window) and an explode whose output is chunk rows —
    no shuffle, no Python; at 100 TB this pipelines straight into the
    writer."""
    toks = WHITESPACE_ANALYZER.tokens_expr(text_col)
    base = df.select(id_col, toks.alias("_tk"))
    tk = F.col("_tk")
    n = F.size(tk)
    chunks = F.when(
        n >= 1,
        F.transform(
            F.sequence(F.lit(1), n, F.lit(stride)),
            lambda i: F.struct(
                ((i - 1) / stride).cast("long").alias("chunk_idx"),
                F.array_join(F.slice(tk, i, window), " ").alias("chunk_text"),
                F.least(F.lit(window), n - i + 1).cast("long").alias("n_tokens"),
            ),
        ),
    ).otherwise(F.array().cast(
        "array<struct<chunk_idx:bigint,chunk_text:string,n_tokens:bigint>>"
    ))
    return base.select(id_col, F.explode(chunks).alias("_c")).select(
        id_col, "_c.*"
    )


# ---- weighted resampling -------------------------------------------------- #
def resample_weighted(
    df: DataFrame,
    weights: dict[str, float],
    stratum_col: str,
    id_col: str = "doc_id",
    *,
    default_weight: float = 1.0,
    salt: str = "resample",
) -> DataFrame:
    """Deterministic weighted resampling for corpus mixing (the DoReMi /
    data-mixture epoch trick): each stratum (domain, language, quality
    tier) gets a target weight w — every row is emitted floor(w) times
    plus one more with probability frac(w), decided by the same
    engine-independent md5 hash as ``deterministic_sample`` so the SAME
    replicas materialize on any cluster size / engine. w < 1 downsamples,
    w > 1 upsamples with an extra ``repeat_idx`` column (0-based) so
    downstream shuffles don't collapse the copies.

    One scan + explode(sequence(...)), weight lookup folds into the
    expression (no join); zero Python."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(float(0xFFFFFFFF))
    )
    w = F.lit(float(default_weight))
    for s, r in sorted(weights.items()):
        w = F.when(F.col(stratum_col) == s, F.lit(float(r))).otherwise(w)
    n_rep = (F.floor(w) + (u < (w - F.floor(w))).cast("long")).cast("long")
    return (
        df.withColumn("_nr", n_rep)
        .filter(F.col("_nr") >= 1)
        .withColumn(
            "repeat_idx", F.explode(F.sequence(F.lit(0), F.col("_nr") - 1))
        )
        .drop("_nr")
    )


# ---- PII redaction ------------------------------------------------------ #
PII_PATTERNS: dict[str, str] = {
    # order matters: applied in this sequence
    "EMAIL": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "SSN": r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b",
    "PHONE": r"\b(?:\+?1[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b",
    "IP": r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b",
}


def redact_pii(
    df: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    patterns: dict[str, str] | None = None,
) -> DataFrame:
    """Regex PII scrubbing (emails, SSNs, phone numbers, IPs -> [TYPE]
    placeholders) — chained JVM regexp_replace, one codegen'd scan, the
    standard first-pass scrub of a web-scale training corpus."""
    patterns = patterns or PII_PATTERNS
    col = F.col(text_col)
    for name, rx in patterns.items():
        col = F.regexp_replace(col, rx, f"[{name}]")
    return df.withColumn(out_col or text_col, col)


# ---- corpus profile (data card) ------------------------------------------ #
def corpus_profile(
    df: DataFrame,
    text_col: str = "text",
    stratum_col: str = "lang",
) -> DataFrame:
    """One-pass corpus "data card": per-stratum AND whole-corpus document
    counts, token totals, and length statistics via ``rollup`` — the
    summary table a training-data release ships with. A single
    aggregation (grouping-sets), no second scan for the ALL row; exact
    interpolated percentiles (same contract as length_percentiles)."""
    ntok = token_count_col(text_col)
    chars = F.length(F.col(text_col))
    g = df.rollup(stratum_col).agg(
        F.grouping(stratum_col).alias("_g"),
        F.count("*").alias("n_docs"),
        F.sum(ntok).cast("long").alias("total_tokens"),
        F.round(F.avg(chars), 6).alias("mean_chars"),
        F.round(F.expr(f"percentile(length({text_col}), 0.5D)"), 6).alias(
            "p50_chars"
        ),
        F.round(F.expr(f"percentile(length({text_col}), 0.95D)"), 6).alias(
            "p95_chars"
        ),
    )
    return g.select(
        F.when(F.col("_g") == 1, F.lit("ALL"))
        .otherwise(F.col(stratum_col))
        .alias("stratum"),
        "n_docs",
        "total_tokens",
        "mean_chars",
        "p50_chars",
        "p95_chars",
    )


# ---- deterministic sampling --------------------------------------------- #
def deterministic_sample(
    df: DataFrame,
    rate: float,
    key_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Reproducible sampling by hash threshold: keep rows whose
    md5(salt||key)-derived uniform in [0,1) is < rate. Unlike rand()-based
    sampling this is engine- and run-independent (the SAME rows are kept on
    any cluster size, any engine — md5 is bit-identical everywhere), which
    is what a resumable 100 TB pipeline needs; it is also SQL-oracle
    reproducible."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(0xFFFFFFFF))
    )
    return df.filter(u < rate)


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str,
    key_col: str = "doc_id",
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates when
    rebalancing a corpus): the same hash-threshold rule with a per-stratum
    rate looked up from a literal map (broadcast-free: it folds into the
    filter expression)."""
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8), 16, 10)
        .cast("double")
        / F.lit(float(0xFFFFFFFF))
    )
    rate = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(stratum_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)


# ---- percentile-threshold filtering ------------------------------------- #
def filter_by_percentile(
    df: DataFrame,
    score_col: str,
    q: float,
    stratum_col: str | None = None,
    *,
    keep: str = "above",
) -> DataFrame:
    """Keep rows whose ``score_col`` clears the per-stratum exact
    ``q``-quantile (the standard "drop the bottom X% by quality score /
    keep the top X% by LM score" pass). ``keep='above'`` keeps
    score >= quantile, ``'below'`` keeps score <= quantile. With a
    ``stratum_col`` the threshold is computed per stratum (per language,
    per source) so one dominant domain can't starve the others.

    Plan shape: one exact ``percentile`` aggregation (stratum-sized
    output, broadcast back) + one filtered scan — the corpus is never
    shuffled. Exact interpolated percentile matches DuckDB's
    ``quantile_cont`` for the oracle."""
    if keep not in ("above", "below"):
        raise ValueError("keep must be 'above' or 'below'")
    if stratum_col is None:
        thr = df.agg(
            F.expr(f"percentile({score_col}, {q})").alias("_thr")
        ).collect()[0]["_thr"]
        cond = (
            F.col(score_col) >= thr if keep == "above" else F.col(score_col) <= thr
        )
        return df.filter(cond)
    thrs = F.broadcast(
        df.groupBy(stratum_col).agg(
            F.expr(f"percentile({score_col}, {q})").alias("_thr")
        )
    )
    out = df.join(thrs, stratum_col)
    cond = (
        F.col(score_col) >= F.col("_thr")
        if keep == "above"
        else F.col(score_col) <= F.col("_thr")
    )
    return out.filter(cond).drop("_thr")


# ---- C4-style line-level cleaning --------------------------------------- #
def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    *,
    min_words: int = 3,
    require_terminal_punct: bool = True,
    ban_substrings: tuple[str, ...] = ("lorem ipsum", "javascript"),
    ban_curly_brace: bool = True,
    min_kept_lines: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2 heuristics):
    split the document on newlines and keep a line only if it (a) ends in
    terminal punctuation (. ! ? or closing quote), (b) has at least
    ``min_words`` whitespace words, (c) contains none of the banned
    substrings (case-insensitive) and no ``{`` (code/markup tell). Docs
    with fewer than ``min_kept_lines`` surviving lines are dropped.

    Adds ``clean_text`` (kept lines re-joined with newlines), ``n_lines``
    and ``n_kept``. One codegen'd scan — split + one array filter, zero
    Python, no shuffle; at 100 TB this is a pure map stage that pipelines
    into the writer."""
    lines = F.split(F.col(text_col), "\n")

    def keep_pred(line):
        t = F.trim(line)
        cond = F.size(F.filter(F.split(t, r"\s+"), lambda w: w != "")) >= min_words
        if require_terminal_punct:
            cond = cond & t.rlike('[.!?"”]$')
        low = F.lower(t)
        for s in ban_substrings:
            cond = cond & ~low.contains(s.lower())
        if ban_curly_brace:
            cond = cond & ~t.contains("{")
        return cond

    kept = F.filter(lines, keep_pred)
    return (
        df.withColumns(
            {
                "n_lines": F.size(lines).cast("long"),
                "n_kept": F.size(kept).cast("long"),
                "clean_text": F.array_join(kept, "\n"),
            }
        )
        .filter(F.col("n_kept") >= min_kept_lines)
    )


# ---- corpus-wide line-level exact dedup ---------------------------------- #
def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n",
) -> DataFrame:
    """Corpus-wide line-level exact deduplication (the line-dedup step of
    C4 / MassiveText; Lee et al. 2022 'Deduplicating Training Data Makes
    Language Models Better' applies the same idea at sequence level):
    split every document on ``sep`` and keep only the FIRST occurrence of
    each distinct line across the whole corpus — first = lowest
    (doc_id, line_no), so the result is engine- and parallelism-
    independent. Within-doc repeats of a line are deduped by the same
    rule. Returns one row per input doc: (id_col, n_lines, n_kept,
    clean_text) with surviving lines re-joined in original order; docs
    whose every line was seen earlier get clean_text = ''. ``sep`` is a
    LITERAL separator (quoted for the split regex, used verbatim for the
    re-join); null text is treated as the empty string (one empty line),
    so the row survives.

    Plan shape: explode -> ONE shuffle on the line key (window
    row_number picks the global first occurrence) -> one shuffle back on
    doc_id to reassemble. Both are plain hash shuffles Spark handles at
    any scale; boilerplate head lines (the classic skew risk: a line
    repeated 10^8 times) cost one window partition each — AQE skew-join
    splitting does not apply to windows, so at extreme skew swap the
    window for a groupBy(line).agg(min(struct(doc_id, pos))) join, which
    partial-aggregates map-side. Fixture scale never hits that."""
    from pyspark.sql import Window

    lines = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(
                F.coalesce(F.col(text_col), F.lit("")),
                "\\Q" + sep + "\\E",  # literal split, matching the re-join
            )
        ).alias("pos", "line"),
    )
    w = Window.partitionBy("line").orderBy(id_col, "pos")
    flagged = lines.withColumn("rn", F.row_number().over(w))
    kept_struct = F.when(
        F.col("rn") == 1, F.struct(F.col("pos"), F.col("line"))
    )
    return flagged.groupBy(id_col).agg(
        F.count("*").alias("n_lines"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
            ),
            sep,
        ).alias("clean_text"),
    )


# ---- per-group top-k selection -------------------------------------------- #
def top_k_per_group(
    df: DataFrame,
    group_col: str,
    score_col: str,
    k: int,
    id_col: str = "doc_id",
    *,
    ascending: bool = False,
) -> DataFrame:
    """Keep the top-``k`` rows per group by score (ties broken by
    ``id_col`` ascending, so the selection is deterministic at any
    parallelism) — the 'best N docs per language/source for the training
    mix' pass. Adds ``rank`` (1-based within group).

    One window over the group key: Spark inserts a rank-limit
    (WindowGroupLimit) before the full sort when a row_number filter is
    detected, so per-group work is O(k) retained rows, not a full
    per-group sort of the corpus."""
    from pyspark.sql import Window

    order = (
        [F.col(score_col).asc(), F.col(id_col).asc()]
        if ascending
        else [F.col(score_col).desc(), F.col(id_col).asc()]
    )
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


# ---- script / writing-system profiling ----------------------------------- #
# char-class regexes built from codepoints so Java regex (Spark) and RE2
# (DuckDB) read the identical pattern text
_SCRIPT_CLASSES: dict[str, str] = {
    "latin": "[A-Za-z{0}-{1}]".format(chr(0x00C0), chr(0x024F)),
    "cjk": "[{0}-{1}{2}-{3}]".format(
        chr(0x4E00), chr(0x9FFF), chr(0x3040), chr(0x30FF)
    ),
    "cyrillic": "[{0}-{1}]".format(chr(0x0400), chr(0x04FF)),
    "arabic": "[{0}-{1}]".format(chr(0x0600), chr(0x06FF)),
    "digit": "[0-9]",
}


def script_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Writing-system profile per document: the fraction of non-space
    characters in each major script class (Latin incl. extended, CJK
    ideographs + kana, Cyrillic, Arabic, ASCII digits) plus the dominant
    script ('other' when nothing matches, ties broken by class-name
    order). The multilingual-corpus QC complement to the marker-word
    ``lang_id``: script fractions catch mixed-script spam, mislabeled
    languages and mojibake that word lists miss.

    Counting is length-difference after regexp_replace per class — all
    JVM, one codegen'd scan, zero Python/shuffle."""
    base = F.regexp_replace(F.col(text_col), F.lit(r"\s"), F.lit(""))
    n = F.length(base)
    safe_n = F.greatest(n, F.lit(1)).cast("double")
    counts = {
        name: n - F.length(F.regexp_replace(base, F.lit(pat), F.lit("")))
        for name, pat in _SCRIPT_CLASSES.items()
    }
    structs = F.array(
        *[
            F.struct(
                counts[name].alias("c"),
                F.lit(-i).alias("ni"),
                F.lit(name).alias("name"),
            )
            for i, name in enumerate(_SCRIPT_CLASSES)
        ]
    )
    best = F.array_max(structs)
    dominant = F.when(best["c"] > 0, best["name"]).otherwise(F.lit("other"))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        *[
            F.round(counts[name] / safe_n, 6).alias(f"{name}_frac")
            for name in _SCRIPT_CLASSES
        ],
        dominant.alias("script"),
    )


# ---- Unicode text normalization ------------------------------------------ #
# typographic chars -> ASCII: curly quotes, dashes, exotic spaces
_PUNCT_FROM = "“”„‘’‚–—―«»   "
_PUNCT_TO = '"""\'\'\'---""   '
assert len(_PUNCT_FROM) == len(_PUNCT_TO)  # translate() maps 1:1
_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]"


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    nfc: bool = True,
    unify_punct: bool = True,
    strip_controls: bool = True,
    collapse_ws: bool = True,
) -> DataFrame:
    """Unicode text normalization for ingest pipelines: (1) NFC canonical
    composition (combining marks recomposed — e + U+0301 becomes é),
    (2) typographic punctuation unified to ASCII (curly quotes, en/em
    dashes, guillemets, NBSP/thin spaces), (3) C0/C1 control chars
    stripped, (4) whitespace collapsed + trimmed. Adds ``norm_text``.

    Steps 2-4 are pure JVM (translate / regexp_replace inside codegen).
    NFC is the one step Spark has no built-in for — it runs as an
    Arrow-batched pandas UDF (unicodedata.normalize, byte-identical to
    DuckDB's utf8proc nfc_normalize on canonical compositions, which the
    oracle relies on); pass ``nfc=False`` for a fully JVM plan on
    already-composed corpora. One scan, zero shuffle either way."""
    col = F.col(text_col)
    if nfc:
        import pandas as pd  # noqa: F401  (pandas_udf runtime dep)

        @F.pandas_udf("string")
        def _nfc(s):
            import unicodedata

            return s.map(
                lambda t: unicodedata.normalize("NFC", t)
                if t is not None
                else None
            )

        col = _nfc(col)
    if unify_punct:
        col = F.translate(col, _PUNCT_FROM, _PUNCT_TO)
    if strip_controls:
        col = F.regexp_replace(col, F.lit(_CONTROL_RE), F.lit(""))
    if collapse_ws:
        col = F.trim(F.regexp_replace(col, F.lit(r"\s+"), F.lit(" ")))
    return df.withColumn("norm_text", col)


# ---- Gopher quality rules ------------------------------------------------ #
def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_words: int = 2,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, MassiveText
    §A.1.1), with the published default thresholds: word count in
    [50, 100k], mean word length in [3, 10], symbol-to-word ratio (# and
    ellipsis) <= 0.1, <= 90% of lines bullet-started, <= 30% of lines
    ellipsis-ended, >= 80% of words containing an alphabetic character,
    and >= ``min_stop_words`` distinct members of the 8-word stop list
    {the, be, to, of, and, that, have, with} present. One deviation,
    documented: the symbol rule combines # and ellipsis counts into one
    ratio instead of testing each separately.

    Returns (id_col, n_words, mean_word_len, symbol_ratio, bullet_frac,
    ellipsis_frac, alpha_frac, n_stop, keep) — per-rule signals kept so a
    pipeline can re-threshold without a second scan. All pure JVM
    expressions over one scan: no Python, no shuffle; at 100 TB this is a
    map stage that pipelines into whatever consumes the keep flag."""
    stops = ("the", "be", "to", "of", "and", "that", "have", "with")
    tk = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda w: w != "")
    n_words = F.size(tk)
    # empty docs: guard every /n_words division (ANSI mode raises on /0);
    # the word-count rule already fails them, so keep is false either way
    safe_w = F.greatest(n_words, F.lit(1)).cast("double")
    total_len = F.aggregate(tk, F.lit(0), lambda a, w: a + F.length(w))
    mean_wl = total_len.cast("double") / safe_w
    txt = F.col(text_col)
    n_hash = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3) + (
        F.length(txt) - F.length(F.replace(txt, F.lit("…"), F.lit("")))
    )
    symbol_ratio = (n_hash + n_ell).cast("double") / safe_w
    lines = F.split(txt, "\n")
    n_lines = F.size(lines)
    bullet_frac = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).rlike(r"^[•\-\*]"),
            )
        ).cast("double")
        / n_lines
    )
    ellipsis_frac = (
        F.size(
            F.filter(
                lines,
                lambda ln: F.rtrim(ln).rlike(r"(\.\.\.|…)$"),
            )
        ).cast("double")
        / n_lines
    )
    ltk = F.transform(tk, F.lower)
    alpha_frac = (
        F.size(F.filter(tk, lambda w: w.rlike("[a-zA-Z]"))).cast("double")
        / safe_w
    )
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in stops]),
            lambda s: F.array_contains(ltk, s),
        )
    )
    keep = (
        n_words.between(min_words, max_words)
        & mean_wl.between(min_mean_word_len, max_mean_word_len)
        & (symbol_ratio <= max_symbol_ratio)
        & (bullet_frac <= max_bullet_frac)
        & (ellipsis_frac <= max_ellipsis_frac)
        & (alpha_frac >= min_alpha_frac)
        & (n_stop >= min_stop_words)
    )
    return df.select(
        F.col(id_col),
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        F.round(bullet_frac, 6).alias("bullet_frac"),
        F.round(ellipsis_frac, 6).alias("ellipsis_frac"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        n_stop.cast("long").alias("n_stop"),
        keep.alias("keep"),
    )


# ---- corpus-trained unigram LM scoring ----------------------------------- #
def lm_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    analyzer: Analyzer | None = None,
    alpha: float = 0.5,
    broadcast_vocab: bool = True,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Corpus-trained unigram language-model quality score (the CCNet /
    Wenzek et al. LM-filtering idea, made deterministic and SQL-oracle
    reproducible): train add-``alpha``-smoothed unigram probabilities on
    the corpus itself, then score every document by its mean negative log
    likelihood ``nll`` (nats/token; low = head-like fluent text, high =
    rare-token soup). Output (id_col, n_tokens, nll); empty docs get a
    null nll.

    Plan shape: ONE tokenize pass feeds both sides — a vocab-sized
    aggregate (term, cf) that becomes the model, and per-doc (term, tf)
    rows that join back against it. The model table is vocabulary-sized
    (≪ corpus; Heaps' law), broadcast by default so the scoring join is
    shuffle-free; set ``broadcast_vocab=False`` at 10⁹-term vocabularies
    to fall back to a term-keyed shuffle join."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    toks = az.tokens_expr(text_col)
    dt = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    vocab = dt.groupBy("term").agg(F.sum("tf").alias("cf"))
    n_total, v_size = vocab.agg(
        F.sum("cf").alias("n"), F.count("*").alias("v")
    ).collect()[0]
    denom = float(n_total) + alpha * float(v_size)
    model = vocab.select(
        "term",
        (-F.log((F.col("cf") + F.lit(alpha)) / F.lit(denom))).alias("nlp"),
    )
    if broadcast_vocab:
        model = F.broadcast(model)
    scored = (
        dt.join(model, "term")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            (F.sum(F.col("tf") * F.col("nlp")) / F.sum("tf")).alias("nll"),
        )
    )
    # left-join back so token-less docs surface with null nll;
    # carry_cols ride along for free on the same join
    base = df.select(id_col, *carry_cols)
    return base.join(scored, id_col, "left").select(
        id_col,
        *carry_cols,
        F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
        F.round("nll", 6).alias("nll"),
    )


def ccnet_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    *,
    analyzer: Analyzer | None = None,
    alpha: float = 0.5,
    materialize: bool = True,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020 §3.3): score
    every doc with the corpus-trained unigram LM (lm_score), then split
    each language stratum into head / middle / tail at the per-language
    exact 1/3 and 2/3 nll quantiles — head = most fluent third, the slice
    CCNet keeps for LM pre-training. Token-less docs (null nll) land in
    'tail'. Returns (id_col, lang_col, n_tokens, nll, bucket).

    Plan shape: the lm_score pass plus ONE language-sized percentile
    aggregate broadcast back onto the scored rows — the corpus itself is
    never shuffled for the bucketing. Exact interpolated ``percentile``
    matches DuckDB's ``quantile_cont`` for the oracle.

    Both the threshold aggregate and the output read the scored rows, so
    by default the narrow (id, lang, n_tokens, nll) table is eagerly
    materialized once (the LM pass would otherwise run twice — once per
    branch). At extreme scale write lm_score's output to a table and
    pass ``materialize=False`` (the checkpoint holds per-doc scores,
    which is the artifact you persist anyway)."""
    scored = lm_score(
        df,
        text_col,
        id_col,
        analyzer=analyzer,
        alpha=alpha,
        carry_cols=(lang_col,),
    )
    if materialize:
        scored = scored.localCheckpoint(eager=True)
    third, two_thirds = 1.0 / 3.0, 2.0 / 3.0
    thr = F.broadcast(
        scored.filter(F.col("nll").isNotNull())
        .groupBy(lang_col)
        .agg(
            F.expr(f"percentile(nll, {third!r})").alias("_p1"),
            F.expr(f"percentile(nll, {two_thirds!r})").alias("_p2"),
        )
    )
    bucket = (
        F.when(F.col("nll").isNull(), F.lit("tail"))
        .when(F.col("nll") <= F.col("_p1"), F.lit("head"))
        .when(F.col("nll") <= F.col("_p2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(thr, lang_col, "left")
        .select(id_col, lang_col, "n_tokens", "nll", bucket.alias("bucket"))
    )


def dsir_weights(
    df: DataFrame,
    target_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    analyzer: Analyzer | None = None,
    hash_hex: int = 3,
) -> DataFrame:
    """DSIR hashed n-gram importance weights (Xie et al. 2023,
    "Data Selection for Language Models via Importance Resampling",
    arXiv:2302.03169): fit add-1-smoothed bag-of-hashed-ngram
    distributions p (docs where ``target_col`` is true) and q (the
    rest), then score EVERY doc with its log importance weight
    ``logw = sum over gram occurrences of ln p[b] - ln q[b]`` — high
    logw = looks like the target distribution. Resampling is then a
    top-k / Gumbel pass over logw, which callers own.

    Grams are word unigrams + bigrams, hashed into B = 16**hash_hex
    buckets via the first ``hash_hex`` hex chars of md5 (the same
    cross-engine hashing trick as winnowing/simhash, so a DuckDB oracle
    reproduces exact bucket ids). Output (id_col, n_grams, logw): one
    row per input doc, gram-less docs get n_grams = 0 and null logw;
    logw rounded to 6 decimals (sum-order tolerance, the lm_score
    convention).

    Plan shape: one tokenize+hash pass -> per-(doc, bucket) tf
    aggregate -> a bucket-sized (<= B rows) count table whose log-ratio
    model is BROADCAST back onto the doc-bucket rows -> per-doc sum.
    The corpus shuffles once on (doc, bucket); the model fit is
    map-side-combined into <= B rows per side, never corpus-sized, and
    the only collect is the two scalar totals."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    B = float(16**hash_hex)
    tk = az.tokens_expr(text_col)
    n = F.size(F.col("_tk"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.concat(
                F.element_at(F.col("_tk"), i),
                F.lit(" "),
                F.element_at(F.col("_tk"), i + 1),
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = F.concat(F.col("_tk"), bigrams)
    bucket = F.conv(
        F.substring(F.md5(F.col("_g")), 1, hash_hex), 16, 10
    ).cast("long")
    dgt = (
        df.select(
            F.col(id_col),
            F.col(target_col).alias("_t"),
            tk.alias("_tk"),
        )
        .select(id_col, "_t", F.explode(grams).alias("_g"))
        .select(id_col, "_t", bucket.alias("_b"))
        .groupBy(id_col, "_t", "_b")
        .agg(F.count("*").cast("double").alias("_tf"))
    )
    cnt = dgt.groupBy("_b").agg(
        F.sum(F.when(F.col("_t"), F.col("_tf")).otherwise(0.0)).alias("_ct"),
        F.sum(F.when(~F.col("_t"), F.col("_tf")).otherwise(0.0)).alias("_cs"),
    )
    tot = cnt.agg(F.sum("_ct"), F.sum("_cs")).collect()[0]
    t_total, s_total = float(tot[0] or 0.0), float(tot[1] or 0.0)
    model = F.broadcast(
        cnt.select(
            "_b",
            (
                F.log((F.col("_ct") + 1.0) / F.lit(t_total + B))
                - F.log((F.col("_cs") + 1.0) / F.lit(s_total + B))
            ).alias("_lr"),
        )
    )
    scored = (
        dgt.join(model, "_b")
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("long").alias("n_grams"),
            F.round(F.sum(F.col("_tf") * F.col("_lr")), 6).alias("logw"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            "logw",
        )
    )


def bigram_lm_score(
    df: DataFrame,
    train_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    analyzer: Analyzer | None = None,
    backoff: float = 0.4,
    alpha: float = 0.5,
    broadcast_model: bool = True,
) -> DataFrame:
    """Bigram language-model scoring with Stupid Backoff (Brants et al.
    2007, "Large Language Models in Machine Translation" §4): train
    bigram/unigram counts on the docs where ``train_col`` is true, then
    score EVERY doc's bigram transitions with
    ``S(w2|w1) = c(w1 w2)/c(w1 ·)`` when the bigram was seen in
    training, else ``backoff * (cf(w2)+alpha)/(N+alpha·V)`` (the
    add-alpha unigram, lm_score's smoothing). This is the CCNet
    train-on-clean / score-the-crawl shape — docs far from the training
    distribution hit the backoff path and score high nll.

    Output (id_col, n_bigrams, nll): nll = -mean ln S per transition
    (nats/bigram, rounded to 6 — the lm_score sum-order convention);
    docs with < 2 tokens have n_bigrams = 0 and null nll.

    Plan shape: ONE tokenize pass -> per-(doc, w1, w2) tf aggregate
    (the corpus's only shuffle) -> bigram-vocab-sized model with its
    continuation totals, broadcast by default onto the doc-bigram rows
    (set ``broadcast_model=False`` at 10^9-bigram vocabularies to fall
    back to a (w1, w2)-keyed shuffle join) -> per-doc sum. Only the
    N/V scalars are collected."""
    from nlp4l_spark.analysis import STANDARD_ANALYZER

    az = analyzer or STANDARD_ANALYZER
    n = F.size(F.col("_tk"))
    pair = lambda i: F.struct(
        F.element_at(F.col("_tk"), i).alias("_w1"),
        F.element_at(F.col("_tk"), i + 1).alias("_w2"),
    )
    pairs_arr = F.when(
        n >= 2, F.transform(F.sequence(F.lit(1), n - 1), pair)
    ).otherwise(F.array().cast("array<struct<_w1:string,_w2:string>>"))
    base = df.select(
        F.col(id_col),
        F.col(train_col).alias("_train"),
        az.tokens_expr(text_col).alias("_tk"),
    )
    dp = (
        base.select(id_col, "_train", F.explode(pairs_arr).alias("_p"))
        .select(id_col, "_train", F.col("_p._w1").alias("_w1"), F.col("_p._w2").alias("_w2"))
        .groupBy(id_col, "_train", "_w1", "_w2")
        .agg(F.count("*").cast("double").alias("_tf"))
    )
    train_pairs = dp.filter(F.col("_train"))
    c12 = train_pairs.groupBy("_w1", "_w2").agg(F.sum("_tf").alias("_c12"))
    c1 = c12.groupBy("_w1").agg(F.sum("_c12").alias("_c1"))
    bi_model = c12.join(c1, "_w1").select(
        "_w1", "_w2", F.log(F.col("_c12") / F.col("_c1")).alias("_lnbi")
    )
    # unigram counts over ALL train token occurrences (not just bigram
    # participants), matching lm_score's model definition
    uni = (
        base.filter(F.col("_train"))
        .select(F.explode(F.col("_tk")).alias("_w2"))
        .groupBy("_w2")
        .agg(F.count("*").cast("double").alias("_cf"))
    )
    tot = uni.agg(F.sum("_cf"), F.count("*")).collect()[0]
    n_total, v_size = float(tot[0] or 0.0), float(tot[1] or 0)
    if n_total == 0.0:
        raise ValueError("bigram_lm_score: the training split is empty")
    denom = n_total + alpha * v_size
    if broadcast_model:
        bi_model, uni = F.broadcast(bi_model), F.broadcast(uni)
    lnp = F.coalesce(
        F.col("_lnbi"),
        F.log(
            F.lit(backoff)
            * ((F.coalesce(F.col("_cf"), F.lit(0.0)) + F.lit(alpha)) / F.lit(denom))
        ),
    )
    scored = (
        dp.join(bi_model, ["_w1", "_w2"], "left")
        .join(uni, "_w2", "left")
        .groupBy(id_col)
        .agg(
            F.sum("_tf").cast("long").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("_tf") * lnp) / F.sum("_tf"), 6
            ).alias("nll"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            "nll",
        )
    )


def ngram_novelty(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    n: int = 3,
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Per-document n-gram novelty — the diversity/memorization proxy a
    training-data pipeline tracks per ingestion batch (the doc-level
    counterpart of Lee et al. 2022's duplicate-text analysis): novelty =
    fraction of the doc's DISTINCT word n-grams whose first corpus
    occurrence (min id over all docs) is this doc. 1.0 = all-new text,
    0.0 = every n-gram already seen in an earlier doc. Docs with fewer
    than ``n`` analyzer tokens have no n-gram and are dropped.

    Output (id_col, n_grams, novelty) ordered by id.

    Plan: one tokenize scan -> explode distinct n-grams ->
    groupBy(gram).min(id) (one shuffle on the gram key, partial aggs
    combine map-side) -> equality join back on gram -> per-doc fraction
    agg. Work is ∝ corpus n-gram count with no driver state; at 100 TB
    the gram key space is the same scale the n-gram-Jaccard dedup
    already shuffles. The gram extraction is an Arrow pass (the
    dedup.shingles_udf precedent: Spark interprets nested
    transform/slice/concat_ws HOFs, measured ~35x slower at sf0.1) —
    byte-identical to the declarative transform+slice form, short docs
    (< n tokens) yielding NO grams (no shingles_col-style whole-doc
    fallback: novelty over sub-n docs is undefined, they are dropped)."""
    from pyspark.sql import types as T

    analyzer = analyzer or WHITESPACE_ANALYZER
    tokenize = analyzer.tokenize

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            toks = tokenize(t)
            if len(toks) >= n:
                out.append(
                    list(
                        dict.fromkeys(
                            " ".join(toks[i : i + n])
                            for i in range(len(toks) - n + 1)
                        )
                    )
                )
            else:
                out.append([])
        return pd.Series(out)

    grams = _grams(F.col(text_col))
    ex = (
        df.select(F.col(id_col), grams.alias("_g"))
        .filter(F.size("_g") >= 1)
        .select(id_col, F.explode("_g").alias("_gram"))
    )
    first = ex.groupBy("_gram").agg(F.min(id_col).alias("_first"))
    return (
        ex.join(first, "_gram")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.round(
                F.sum((F.col("_first") == F.col(id_col)).cast("long")).cast(
                    "double"
                )
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
        .orderBy(F.asc(id_col))
    )


# ---- compression-ratio quality signal -------------------------------------- #
def compression_ratio(df: DataFrame, text_col: str = "text", level: int = 6):
    """Per-document deflate compressibility (doc_id, n_bytes, z_bytes,
    ratio = z/n): the RefinedWeb/Gopher-family repetition signal that
    catches what n-gram rules miss — boilerplate and template spam
    compress far below prose (ratio << prose band), random/encoded junk
    compresses above it. Filter downstream with ratio BETWEEN lo AND hi.

    Arrow-batched zlib (stdlib, deterministic for a fixed level across
    platforms — zlib's DEFLATE is fully specified by level); one pass,
    no shuffle. Not SQL-expressible, so the registry entry is rows-only
    with a direct-zlib referee test (tests/test_ops.py)."""
    import zlib

    import pandas as pd
    import pyarrow  # noqa: F401  (Arrow batching required, like dedup)

    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("n_bytes", T.IntegerType()),
            T.StructField("z_bytes", T.IntegerType()),
            T.StructField("ratio", T.DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            raw = [str(t).encode("utf-8") for t in pdf["text"]]
            nb = [len(b) for b in raw]
            zb = [len(zlib.compress(b, level)) for b in raw]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": nb,
                    "z_bytes": zb,
                    "ratio": [z / n if n else 0.0 for z, n in zip(zb, nb)],
                }
            )

    return df.select("doc_id", text_col).mapInPandas(run, schema)
