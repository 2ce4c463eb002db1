"""Text analysis for training-data pipelines: language ID, quality scores,
token counting, document fingerprinting.

Extension ops (reference analogue: the analyzer + stats surface). All the
per-doc scoring is built-in SQL expressions — a 100 TB quality pass is one
codegen'd scan with zero Python.
"""

from __future__ import annotations

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
