# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    BM25_TERMS, F, LUCENE_ENGLISH_STOPWORDS, STANDARD_ANALYZER, TOKS_CTE,
    TOK_SQL, WS_SQL, _corpus, _docs, bpe, concordance, dedup, keyness, textqc,
    wordcounts,
)
from nlp4l_spark.entry_queries.dedup_ann import (  # noqa: F401
    _WS_TOKS,
)
# Text QC
# --------------------------------------------------------------------- #
def q_token_count(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", textqc.token_count_col("text").cast("long").alias("n_tokens")
    )


O_TOKEN_COUNT = r"""
SELECT doc_id,
       len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+'))::bigint
           AS n_tokens
FROM documents
"""

_STOP_LIST = ", ".join(f"'{w}'" for w in sorted(LUCENE_ENGLISH_STOPWORDS))


def q_quality(spark, sf_dir):
    return textqc.quality_score(_docs(spark, sf_dir)).select("doc_id", "quality")


def q_compression_ratio_topk(spark, sf_dir):
    """Deflate-compressibility quality signal (textqc.compression_ratio
    — the RefinedWeb/Gopher repetition filter): the 10 most-compressible
    documents (ratio asc = most template-like). Rows-only: zlib is not
    SQL-expressible; tests/test_ops.py referees every byte count
    against direct zlib.compress."""
    cr = textqc.compression_ratio(_docs(spark, sf_dir))
    return (
        cr.select(
            "doc_id", "n_bytes", "z_bytes", F.round("ratio", 6).alias("ratio")
        )
        .orderBy(F.asc("ratio"), F.asc("doc_id"))
        .limit(10)
    )


O_QUALITY = f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars,
         {_WS_TOKS} AS tk,
         length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS n_punct
  FROM documents),
feat AS (
  SELECT doc_id,
         len(tk) AS n_tokens,
         round(n_punct / greatest(n_chars, 1)::double, 6) AS punct_ratio,
         round(len(list_filter(tk, t -> t IN ({_STOP_LIST})))
               / greatest(len(tk), 1)::double, 6) AS stopword_ratio
  FROM base)
SELECT doc_id,
       round((least(n_tokens / 50.0, 1.0)
            + (1.0 - least(punct_ratio * 4, 1.0))
            + least(stopword_ratio * 3, 1.0)) / 3.0, 6) AS quality
FROM feat
"""

def q_filter_percentile(spark, sf_dir):
    """Per-stratum percentile-threshold filtering: keep docs at or above
    their language's exact interpolated 0.6-quantile of n_chars (the
    'drop the bottom X% by score, per language' quality pass)."""
    docs = _docs(spark, sf_dir).select("doc_id", "lang", "n_chars")
    return textqc.filter_by_percentile(docs, "n_chars", 0.6, "lang").select(
        "doc_id", "lang", "n_chars"
    )


O_FILTER_PERCENTILE = """
WITH thr AS (SELECT lang, quantile_cont(n_chars, 0.6) AS t
             FROM documents GROUP BY lang)
SELECT doc_id, lang, n_chars
FROM documents JOIN thr USING (lang)
WHERE n_chars >= t
"""


_MARKER_SQL = {
    lang: ", ".join(f"'{m}'" for m in markers)
    for lang, markers in textqc._LANG_MARKERS.items()
}


def q_lang_id(spark, sf_dir):
    return textqc.lang_id(_docs(spark, sf_dir)).select("doc_id", "lang_pred")


O_LANG_ID = f"""
WITH t AS (SELECT doc_id, {_WS_TOKS} AS tk FROM documents),
h AS (SELECT doc_id,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['en']}))) AS h_en,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['es']}))) AS h_es,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['fr']}))) AS h_fr,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['de']}))) AS h_de
      FROM t),
m AS (SELECT *, greatest(h_en, h_es, h_fr, h_de) AS hm FROM h)
SELECT doc_id,
       CASE WHEN hm = 0 THEN 'und'
            WHEN h_fr = hm THEN 'fr'
            WHEN h_es = hm THEN 'es'
            WHEN h_en = hm THEN 'en'
            ELSE 'de' END AS lang_pred
FROM m
"""


def q_lang_confusion(spark, sf_dir):
    """Language-ID confusion matrix (classifier QC: labeled lang column
    vs the n-gram-heuristic prediction): (lang, lang_pred, cnt) cells,
    composing the oracled lang_id expression with one groupBy. The miss
    cells expose exactly where the marker vocabulary is blind."""
    pred = textqc.lang_id(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "lang_pred"
    )
    return (
        pred.groupBy("lang", "lang_pred")
        .agg(F.count("*").alias("cnt"))
        .orderBy("lang", "lang_pred")
    )


O_LANG_CONFUSION = f"""
WITH t AS (SELECT doc_id, lang, {_WS_TOKS} AS tk FROM documents),
h AS (SELECT doc_id, lang,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['en']}))) AS h_en,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['es']}))) AS h_es,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['fr']}))) AS h_fr,
        len(list_filter(tk, x -> x IN ({_MARKER_SQL['de']}))) AS h_de
      FROM t),
m AS (SELECT *, greatest(h_en, h_es, h_fr, h_de) AS hm FROM h),
p AS (SELECT lang,
        CASE WHEN hm = 0 THEN 'und'
             WHEN h_fr = hm THEN 'fr'
             WHEN h_es = hm THEN 'es'
             WHEN h_en = hm THEN 'en'
             ELSE 'de' END AS lang_pred
      FROM m)
SELECT lang, lang_pred, count(*)::bigint AS cnt FROM p
GROUP BY 1, 2 ORDER BY lang, lang_pred
"""


def q_fingerprint(spark, sf_dir):
    return textqc.fingerprint(_docs(spark, sf_dir)).select("doc_id", "fp_md5")


O_FINGERPRINT = r"""
SELECT doc_id, md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fp_md5
FROM documents
"""


# --------------------------------------------------------------------- #
# C4-style line cleaning (Raffel et al. 2020 §2.2) over a derived
# multi-line corpus: the single-line fixture docs are re-lined into
# 8-token chunks whose ending varies by chunk index (i%3: '.', bare,
# ' {') so every cleaning rule — terminal punctuation, min-words, brace
# ban — fires. The derivation is the SAME expression in both engines.
# --------------------------------------------------------------------- #
def q_clean_lines(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tk = F.split(F.trim(F.col("text")), r"\s+")
    nc = F.ceil(F.size(tk) / F.lit(8)).cast("int")
    line = lambda i: F.concat(
        F.array_join(F.slice(tk, i * 8 + 1, 8), " "),
        F.when(i % 3 == 0, F.lit("."))
        .when(i % 3 == 1, F.lit(""))
        .otherwise(F.lit(" {")),
    )
    multi = docs.select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), nc - 1), line), "\n"
        ).alias("text"),
    )
    return textqc.clean_lines(multi).select(
        "doc_id", "n_lines", "n_kept", "clean_text"
    )


O_CLEAN_LINES = r"""
WITH tk AS (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS l
            FROM documents),
ml AS (SELECT doc_id,
         list_transform(range(0, ((len(l) + 7) // 8)::int),
           i -> array_to_string(l[i*8+1 : i*8+8], ' ') ||
                CASE i % 3 WHEN 0 THEN '.' WHEN 1 THEN '' ELSE ' {' END)
           AS lines
       FROM tk),
cl AS (SELECT doc_id, len(lines)::bigint AS n_lines,
         list_filter(lines, x ->
           len(regexp_extract_all(trim(x), '\S+')) >= 3
           AND regexp_matches(trim(x), '[.!?"”]$')
           AND NOT contains(lower(trim(x)), 'lorem ipsum')
           AND NOT contains(lower(trim(x)), 'javascript')
           AND NOT contains(trim(x), '{')) AS kept
       FROM ml)
SELECT doc_id, n_lines, len(kept)::bigint AS n_kept,
       array_to_string(kept, chr(10)) AS clean_text
FROM cl WHERE len(kept) >= 1
"""


def q_line_dedup(spark, sf_dir):
    """Corpus-wide line-level exact dedup (textqc.dedup_lines) over the
    same derived multi-line corpus as clean_lines: each distinct line
    survives only at its first (doc_id, pos) occurrence across the WHOLE
    corpus. The small shared vocabulary makes 8-token lines repeat
    across docs (~5% of line occurrences at sf0.01 are repeats), so the
    drop path is exercised; the keep-first rule is deterministic, so the
    DuckDB oracle recomputes the exact surviving text per doc. Empty/
    whitespace-only docs derive ZERO lines (token filter + nc guard),
    matching the oracle's regexp_extract_all-based derivation, and are
    excluded up front — in both engines they'd contribute no rows."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    tk = F.filter(F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != "")
    nc = F.ceil(F.size(tk) / F.lit(8)).cast("int")
    line = lambda i: F.concat(
        F.array_join(F.slice(tk, i * 8 + 1, 8), " "),
        F.when(i % 3 == 0, F.lit("."))
        .when(i % 3 == 1, F.lit(""))
        .otherwise(F.lit(" {")),
    )
    multi = docs.filter(nc >= 1).select(
        "doc_id",
        F.array_join(
            F.transform(F.sequence(F.lit(0), nc - 1), line), "\n"
        ).alias("text"),
    )
    return textqc.dedup_lines(multi)


O_LINE_DEDUP = r"""
WITH tk AS (SELECT doc_id, regexp_extract_all(trim(text), '\S+') AS l
            FROM documents),
ml AS (SELECT doc_id,
         list_transform(range(0, ((len(l) + 7) // 8)::int),
           i -> array_to_string(l[i*8+1 : i*8+8], ' ') ||
                CASE i % 3 WHEN 0 THEN '.' WHEN 1 THEN '' ELSE ' {' END)
           AS lines
       FROM tk),
ln AS (SELECT doc_id, unnest(range(1, len(lines) + 1)) AS pos,
              unnest(lines) AS line
       FROM ml),
rk AS (SELECT doc_id, pos, line,
              row_number() OVER (PARTITION BY line ORDER BY doc_id, pos)
                  AS rn
       FROM ln)
SELECT doc_id, count(*)::bigint AS n_lines,
       (count(*) FILTER (WHERE rn = 1))::bigint AS n_kept,
       coalesce(string_agg(line, chr(10) ORDER BY pos)
                    FILTER (WHERE rn = 1), '') AS clean_text
FROM rk GROUP BY doc_id
"""


def q_gopher_filter(spark, sf_dir):
    """Full Gopher rule set (Rae et al. 2021 §A.1.1) with the published
    thresholds, except min_stop_words=1 (fixture-scaled: the synthetic
    vocabulary contains only 'the' from the 8-word stop list, so the
    published 2 would make the rule a constant). 277/500 docs pass the
    word-count rule and 382/500 the stop-word rule at sf0.01, so keep
    genuinely varies."""
    return textqc.gopher_filter(_docs(spark, sf_dir), min_stop_words=1)


O_GOPHER_FILTER = r"""
WITH w AS (SELECT doc_id, text,
             regexp_extract_all(trim(text), '\S+') AS tk,
             split(text, chr(10)) AS lns
           FROM documents),
f AS (SELECT doc_id,
        len(tk) AS n_words,
        list_aggregate(list_transform(tk, x -> len(x)), 'sum')::double
            / greatest(len(tk), 1) AS mwl,
        ((len(text) - len(replace(text, '#', '')))
         + (len(text) - len(replace(text, '...', ''))) / 3
         + (len(text) - len(replace(text, '…', ''))))::double
            / greatest(len(tk), 1) AS sym,
        len(list_filter(lns, l -> regexp_matches(trim(l), '^[•\-\*]')))::double
            / len(lns) AS bullet,
        len(list_filter(lns, l -> regexp_matches(rtrim(l), '(\.\.\.|…)$')))::double
            / len(lns) AS ell,
        len(list_filter(tk, x -> regexp_matches(x, '[a-zA-Z]')))::double
            / greatest(len(tk), 1) AS alpha,
        len(list_filter(['the','be','to','of','and','that','have','with'],
              s -> list_contains(list_transform(tk, x -> lower(x)), s)))
            AS n_stop
      FROM w)
SELECT doc_id, n_words::bigint AS n_words,
       round(mwl, 6) AS mean_word_len,
       round(sym, 6) AS symbol_ratio,
       round(bullet, 6) AS bullet_frac,
       round(ell, 6) AS ellipsis_frac,
       round(alpha, 6) AS alpha_frac,
       n_stop::bigint AS n_stop,
       (n_words BETWEEN 50 AND 100000 AND mwl BETWEEN 3.0 AND 10.0
        AND sym <= 0.1 AND bullet <= 0.9 AND ell <= 0.3
        AND alpha >= 0.8 AND n_stop >= 1) AS keep
FROM f
"""


def q_lm_perplexity(spark, sf_dir):
    """Corpus-trained add-0.5-smoothed unigram LM; per-doc mean negative
    log likelihood (nats/token). See textqc.lm_score."""
    return textqc.lm_score(_docs(spark, sf_dir))


O_LM_PERPLEXITY = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, sum(tf) AS cf FROM dt GROUP BY 1),
st AS (SELECT sum(cf) AS n, count(*) AS v FROM vocab),
model AS (SELECT term, -ln((cf + 0.5) / (n + 0.5 * v)) AS nlp
          FROM vocab CROSS JOIN st),
sc AS (SELECT doc_id, sum(tf)::bigint AS n_tokens,
              sum(tf * nlp) / sum(tf) AS nll
       FROM dt JOIN model USING (term) GROUP BY doc_id)
SELECT d.doc_id, coalesce(sc.n_tokens, 0)::bigint AS n_tokens,
       round(sc.nll, 6) AS nll
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_normalize_text(spark, sf_dir):
    """Unicode normalization over a derived dirty corpus: every 'e'
    decomposed to e+U+0301 (NFC must recompose to é), wrapped in
    guillemets/curly quotes/em-dash/NBSP/tab/BEL — so all four steps
    (NFC, punctuation unification, control strip, whitespace collapse)
    fire on every row. The derivation is the same expression in both
    engines; DuckDB's utf8proc nfc_normalize matches Python's
    unicodedata NFC on canonical compositions."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    dirty = F.concat(
        F.lit("«"),
        F.replace(F.col("text"), F.lit("e"), F.lit("é")),
        F.lit("»\t— “done”\x07"),
    )
    return textqc.normalize_text(docs.withColumn("text", dirty)).select(
        "doc_id", "norm_text"
    )


O_NORMALIZE_TEXT = f"""
SELECT doc_id,
  trim(regexp_replace(regexp_replace(translate(nfc_normalize(
      '«' || replace(text, 'e', 'e{chr(0x301)}')
      || '»' || chr(9) || '—' || ' '
      || '“done”' || chr(7)),
    '{textqc._PUNCT_FROM}', '{textqc._PUNCT_TO.replace("'", "''")}'),
    '{textqc._CONTROL_RE}', '', 'g'), '\\s+', ' ', 'g')) AS norm_text
FROM documents
"""


_CJK_SFX = "".join(chr(c) for c in (0x6F22, 0x5B57, 0x304B, 0x306A))
_CYR_SFX = "".join(chr(c) for c in (0x043F, 0x0440, 0x0438, 0x0432))


def q_script_profile(spark, sf_dir):
    """Per-script character fractions + dominant script over a derived
    mixed-script corpus: docs get a CJK / Cyrillic / no suffix by
    doc_id % 3, so the cjk/cyrillic fraction columns genuinely vary
    (dominance stays latin on these short suffixes — the dominance and
    tie rules are unit-tested on crafted docs instead,
    tests/test_ops.py::test_script_profile). Same derivation expression
    in both engines (codepoints spelled explicitly)."""
    docs = _docs(spark, sf_dir).select("doc_id", "text")
    sfx = (
        F.when(F.col("doc_id") % 3 == 0, F.lit(" " + _CJK_SFX))
        .when(F.col("doc_id") % 3 == 1, F.lit(" " + _CYR_SFX))
        .otherwise(F.lit(""))
    )
    mixed = docs.withColumn("text", F.concat(F.col("text"), sfx))
    return textqc.script_profile(mixed)


def _o_script_counts() -> str:
    cls = textqc._SCRIPT_CLASSES
    parts = [
        f"len(base) - len(regexp_replace(base, '{pat}', '', 'g')) AS c_{name}"
        for name, pat in cls.items()
    ]
    return ", ".join(parts)


O_SCRIPT_PROFILE = f"""
WITH mixed AS (SELECT doc_id,
        text || CASE doc_id % 3
            WHEN 0 THEN ' ' || {" || ".join(f"chr({ord(c)})" for c in _CJK_SFX)}
            WHEN 1 THEN ' ' || {" || ".join(f"chr({ord(c)})" for c in _CYR_SFX)}
            ELSE '' END AS text
      FROM documents),
b AS (SELECT doc_id, regexp_replace(text, '\\s', '', 'g') AS base FROM mixed),
c AS (SELECT doc_id, len(base) AS n, {_o_script_counts()} FROM b),
m AS (SELECT *, greatest(c_latin, c_cjk, c_cyrillic, c_arabic, c_digit) AS mx
      FROM c)
SELECT doc_id, n::BIGINT AS n_chars,
       round(c_latin / greatest(n, 1)::double, 6) AS latin_frac,
       round(c_cjk / greatest(n, 1)::double, 6) AS cjk_frac,
       round(c_cyrillic / greatest(n, 1)::double, 6) AS cyrillic_frac,
       round(c_arabic / greatest(n, 1)::double, 6) AS arabic_frac,
       round(c_digit / greatest(n, 1)::double, 6) AS digit_frac,
       CASE WHEN mx = 0 THEN 'other'
            WHEN c_latin = mx THEN 'latin'
            WHEN c_cjk = mx THEN 'cjk'
            WHEN c_cyrillic = mx THEN 'cyrillic'
            WHEN c_arabic = mx THEN 'arabic'
            ELSE 'digit' END AS script
FROM m
"""


def q_top_per_lang(spark, sf_dir):
    """Top-5 docs per language by quality score (deterministic tie-break
    by doc_id) — the 'best N per stratum for the training mix' pass;
    textqc.top_k_per_group."""
    scored = textqc.quality_score(_docs(spark, sf_dir)).select(
        "doc_id", "lang", "quality"
    )
    return textqc.top_k_per_group(scored, "lang", "quality", 5)


O_TOP_PER_LANG = f"""
WITH qx AS ({O_QUALITY}),
q AS (SELECT d.doc_id, d.lang, qx.quality
      FROM qx JOIN documents d USING (doc_id)),
r AS (SELECT doc_id, lang, quality,
             row_number() OVER (PARTITION BY lang
                 ORDER BY quality DESC, doc_id ASC) AS rank
      FROM q)
SELECT doc_id, lang, quality, rank::int AS rank FROM r WHERE rank <= 5
"""


def q_ccnet_buckets(spark, sf_dir):
    """CCNet head/middle/tail perplexity buckets per language (exact
    per-lang nll terciles over the corpus-trained unigram LM). See
    textqc.ccnet_buckets."""
    return textqc.ccnet_buckets(_docs(spark, sf_dir))


O_CCNET_BUCKETS = f"""
WITH lm AS ({O_LM_PERPLEXITY}),
j AS (SELECT lm.doc_id, d.lang, lm.n_tokens, lm.nll
      FROM lm JOIN documents d USING (doc_id)),
thr AS (SELECT lang,
               quantile_cont(nll, {1.0 / 3.0!r}) AS p1,
               quantile_cont(nll, {2.0 / 3.0!r}) AS p2
        FROM j WHERE nll IS NOT NULL GROUP BY lang)
SELECT j.doc_id, j.lang, j.n_tokens, j.nll,
       CASE WHEN j.nll IS NULL THEN 'tail'
            WHEN j.nll <= thr.p1 THEN 'head'
            WHEN j.nll <= thr.p2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM j LEFT JOIN thr USING (lang)
"""


def q_dsir_weights(spark, sf_dir):
    """DSIR importance weights (Xie et al. 2023): hashed uni+bigram
    bag distributions fit on the English split (target) vs the rest
    (source); every doc scored with its log importance weight. The
    oracle re-derives the exact md5-bucket ids, add-1-smoothed
    log-ratio model, and per-doc sums. See textqc.dsir_weights."""
    docs = _docs(spark, sf_dir).withColumn("_tgt", F.col("lang") == "en")
    return textqc.dsir_weights(docs, "_tgt")


O_DSIR_WEIGHTS = f"""
WITH fl AS (SELECT doc_id, lang = 'en' AS tgt, {TOK_SQL} AS l FROM documents),
tk AS (SELECT doc_id, tgt, unnest(l) AS g, generate_subscripts(l, 1) AS ord
       FROM fl),
grams AS (SELECT doc_id, tgt, g FROM tk
          UNION ALL
          SELECT a.doc_id, a.tgt, a.g || ' ' || b.g
          FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
dgt AS (SELECT doc_id, tgt, ('0x' || substr(md5(g), 1, 3))::bigint AS b,
               count(*)::double AS tf
        FROM grams GROUP BY 1, 2, 3),
cnt AS (SELECT b, sum(CASE WHEN tgt THEN tf ELSE 0 END) AS ct,
               sum(CASE WHEN NOT tgt THEN tf ELSE 0 END) AS cs
        FROM dgt GROUP BY b),
tot AS (SELECT sum(ct) AS t_tot, sum(cs) AS s_tot FROM cnt),
model AS (SELECT b, ln((ct + 1.0) / (t_tot + 4096.0))
                   - ln((cs + 1.0) / (s_tot + 4096.0)) AS lr
          FROM cnt CROSS JOIN tot),
sc AS (SELECT doc_id, sum(tf)::bigint AS n_grams,
              round(sum(tf * lr), 6) AS logw
       FROM dgt JOIN model USING (b) GROUP BY doc_id)
SELECT d.doc_id, coalesce(sc.n_grams, 0)::bigint AS n_grams, sc.logw
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_bigram_lm_score(spark, sf_dir):
    """Stupid-Backoff bigram LM scoring (Brants 2007): bigram/unigram
    counts trained on the English split, every doc scored by mean
    transition nll with unigram backoff for unseen bigrams — non-en
    docs exercise the backoff path. See textqc.bigram_lm_score."""
    docs = _docs(spark, sf_dir).withColumn("_tr", F.col("lang") == "en")
    return textqc.bigram_lm_score(docs, "_tr")


O_BIGRAM_LM_SCORE = f"""
WITH fl AS (SELECT doc_id, lang = 'en' AS tr, {TOK_SQL} AS l FROM documents),
tk AS (SELECT doc_id, tr, unnest(l) AS w, generate_subscripts(l, 1) AS ord
       FROM fl),
dp AS (SELECT a.doc_id, a.tr, a.w AS w1, b.w AS w2, count(*)::double AS tf
       FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
       GROUP BY 1, 2, 3, 4),
c12 AS (SELECT w1, w2, sum(tf) AS c12 FROM dp WHERE tr GROUP BY 1, 2),
c1 AS (SELECT w1, sum(c12) AS c1 FROM c12 GROUP BY 1),
bi AS (SELECT w1, w2, ln(c12 / c1) AS lnbi FROM c12 JOIN c1 USING (w1)),
uni AS (SELECT w, count(*)::double AS cf FROM tk WHERE tr GROUP BY 1),
tot AS (SELECT sum(cf) AS n, count(*)::double AS v FROM uni),
sc AS (SELECT dp.doc_id, sum(tf)::bigint AS n_bigrams,
              round(-sum(tf * coalesce(lnbi,
                    ln(0.4 * ((coalesce(cf, 0) + 0.5) / (n + 0.5 * v)))))
                    / sum(tf), 6) AS nll
       FROM dp LEFT JOIN bi USING (w1, w2)
               LEFT JOIN uni ON dp.w2 = uni.w
               CROSS JOIN tot
       GROUP BY dp.doc_id)
SELECT d.doc_id, coalesce(sc.n_bigrams, 0)::bigint AS n_bigrams, sc.nll
FROM documents d LEFT JOIN sc USING (doc_id)
"""


def q_significant_terms(spark, sf_dir):
    """Per-language significant terms by Dunning G² keyness (the
    Elasticsearch significant_terms / corpus-comparison surface over the
    reference's WordCounts+chiSquare stack). Top 10 overrepresented
    terms per lang, ties broken on rounded G² then term."""
    return keyness.significant_terms(_docs(spark, sf_dir), "lang", k=10)


O_SIGNIFICANT_TERMS = f"""
WITH fl AS (SELECT lang AS g, {TOK_SQL} AS l FROM documents),
tk AS (SELECT g, unnest(l) AS term FROM fl),
gt AS (SELECT g, term, count(*)::double AS a FROM tk GROUP BY 1, 2),
ct AS (SELECT term, sum(a) AS rowt FROM gt GROUP BY 1),
grp AS (SELECT g, sum(a) AS colt FROM gt GROUP BY 1),
tot AS (SELECT sum(a) AS n FROM gt),
sc AS (SELECT g, term, a, rowt - a AS b, rowt, colt, n
       FROM gt JOIN ct USING (term) JOIN grp USING (g) CROSS JOIN tot),
g2t AS (SELECT g, term, a::bigint AS fg_count, b::bigint AS bg_count,
          round(2 * (
            (CASE WHEN a > 0 THEN a * ln(a / ((rowt * colt) / n)) ELSE 0 END) +
            (CASE WHEN b > 0 THEN b * ln(b / ((rowt * (n - colt)) / n)) ELSE 0 END) +
            (CASE WHEN colt - a > 0 THEN (colt - a)
                  * ln((colt - a) / (((n - rowt) * colt) / n)) ELSE 0 END) +
            (CASE WHEN n - rowt - colt + a > 0 THEN (n - rowt - colt + a)
                  * ln((n - rowt - colt + a)
                       / (((n - rowt) * (n - colt)) / n)) ELSE 0 END)
          ), 6) AS g2
        FROM sc WHERE a >= 1 AND a * (n - colt) > b * colt),
rk AS (SELECT *, row_number() OVER
         (PARTITION BY g ORDER BY g2 DESC, term ASC) AS rn FROM g2t)
SELECT g AS lang, term, fg_count, bg_count, g2 FROM rk WHERE rn <= 10
"""


SIGTEXT_K = 15


def q_significant_text(spark, sf_dir):
    """Elasticsearch significant_text aggregation, corpus path (index
    twin Searcher.significant_text): terms overrepresented by Dunning G²
    in the docs MATCHING '{BM25_QUERY}' (>= 1 query term) vs the whole
    corpus, the query's own terms excluded before ranking. Reuses
    keyness.significant_terms with the match flag as the group column —
    one tokenize scan + vocab-sized keyed aggs, totals broadcast."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    qarr = F.array(*[F.lit(t) for t in BM25_TERMS])
    df2 = _docs(spark, sf_dir).withColumn(
        "_fg", F.coalesce(F.arrays_overlap(toks, qarr), F.lit(False))
    )
    return (
        keyness.significant_terms(
            df2, "_fg", k=SIGTEXT_K, exclude=tuple(BM25_TERMS)
        )
        .filter(F.col("_fg"))
        .select("term", "fg_count", "bg_count", "g2")
        .orderBy(F.desc("g2"), F.asc("term"))
    )


O_SIGNIFICANT_TEXT = f"""
WITH fl AS (SELECT {TOK_SQL} AS l FROM documents),
fm AS (SELECT l, len(list_filter(l,
          x -> x IN ({", ".join(f"'{t}'" for t in BM25_TERMS)}))) > 0 AS g
       FROM fl),
tk AS (SELECT g, unnest(l) AS term FROM fm),
gt AS (SELECT g, term, count(*)::double AS a FROM tk GROUP BY 1, 2),
ct AS (SELECT term, sum(a) AS rowt FROM gt GROUP BY 1),
grp AS (SELECT g, sum(a) AS colt FROM gt GROUP BY 1),
tot AS (SELECT sum(a) AS n FROM gt),
sc AS (SELECT g, term, a, rowt - a AS b, rowt, colt, n
       FROM gt JOIN ct USING (term) JOIN grp USING (g) CROSS JOIN tot),
g2t AS (SELECT g, term, a::bigint AS fg_count, b::bigint AS bg_count,
          round(2 * (
            (CASE WHEN a > 0 THEN a * ln(a / ((rowt * colt) / n)) ELSE 0 END) +
            (CASE WHEN b > 0 THEN b * ln(b / ((rowt * (n - colt)) / n)) ELSE 0 END) +
            (CASE WHEN colt - a > 0 THEN (colt - a)
                  * ln((colt - a) / (((n - rowt) * colt) / n)) ELSE 0 END) +
            (CASE WHEN n - rowt - colt + a > 0 THEN (n - rowt - colt + a)
                  * ln((n - rowt - colt + a)
                       / (((n - rowt) * (n - colt)) / n)) ELSE 0 END)
          ), 6) AS g2
        FROM sc WHERE a >= 1 AND a * (n - colt) > b * colt
          AND g AND term NOT IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})),
rk AS (SELECT *, row_number() OVER
         (ORDER BY g2 DESC, term ASC) AS rn FROM g2t)
SELECT term, fg_count, bg_count, g2 FROM rk WHERE rn <= {SIGTEXT_K}
ORDER BY g2 DESC, term ASC
"""


def q_dedup_spans(spark, sf_dir):
    """Maximal duplicated token spans (Lee et al. 2022 exact-substring
    dedup, arXiv:2107.06499): every shared token run >= 8 between doc
    pairs, found by 6-gram anchors merged along alignment diagonals —
    exact span boundaries, unlike winnow_pairs' sampled candidates."""
    return dedup.duplicate_spans(
        _docs(spark, sf_dir), seed_n=6, min_len=8, max_gram_df=1000
    )


O_DEDUP_SPANS = f"""
WITH t AS (SELECT doc_id, {WS_SQL} AS tk FROM documents),
g AS (SELECT doc_id, list_transform(range(1, greatest(len(tk) - 4, 1)),
        i -> array_to_string(tk[i:i+5], ' ')) AS gr
      FROM t WHERE len(tk) >= 6),
s0 AS (SELECT doc_id, unnest(gr) AS g,
              (generate_subscripts(gr, 1) - 1)::int AS pos FROM g),
rare AS (SELECT g FROM s0 GROUP BY g HAVING count(*) <= 1000),
s AS (SELECT s0.doc_id, s0.g, s0.pos FROM s0 JOIN rare USING (g)),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
             a.pos - b.pos AS diag
      FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id),
i AS (SELECT *, pa - row_number() OVER
        (PARTITION BY id_a, id_b, diag ORDER BY pa) AS isl FROM p)
SELECT id_a, id_b, min(pa)::int AS start_a, (min(pa) - diag)::int AS start_b,
       (count(*) + 5)::bigint AS span_len
FROM i GROUP BY id_a, id_b, diag, isl
HAVING count(*) + 5 >= 8
"""


def q_textrank(spark, sf_dir):
    """Corpus TextRank keywords: 10 fixed power iterations over the
    adjacent-term co-occurrence graph; deterministic, oracle = the same
    iterations unrolled in SQL."""
    return keyness.textrank_terms(_docs(spark, sf_dir), k=20)


_TR_D, _TR_BASE = repr(0.85), repr(1.0 - 0.85)
_TR_STEPS = "\n".join(
    f"s{i + 1} AS (SELECT en.dst AS term, "
    f"{_TR_BASE} + {_TR_D} * sum(en.nw * s{i}.score) AS score "
    f"FROM en JOIN s{i} ON en.src = s{i}.term GROUP BY en.dst),"
    for i in range(10)
)

O_TEXTRANK = f"""
WITH fl AS (SELECT doc_id, {TOK_SQL} AS l FROM documents),
tk AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS ord
       FROM fl),
dp AS (SELECT a.w AS w1, b.w AS w2
       FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1
       WHERE a.w <> b.w),
cnt AS (SELECT w1, w2, count(*)::double AS c FROM dp GROUP BY 1, 2),
e AS (SELECT src, dst, sum(c) AS w FROM (
        SELECT w1 AS src, w2 AS dst, c FROM cnt
        UNION ALL SELECT w2, w1, c FROM cnt)
      GROUP BY 1, 2),
deg AS (SELECT src, sum(w) AS wd FROM e GROUP BY 1),
en AS (SELECT e.src, e.dst, e.w / deg.wd AS nw FROM e JOIN deg USING (src)),
s0 AS (SELECT src AS term, 1.0::double AS score FROM deg),
{_TR_STEPS}
r AS (SELECT term, round(score, 6) AS score FROM s10)
SELECT term, score FROM r ORDER BY score DESC, term ASC LIMIT 20
"""


KWIC_TERM = "merge"


def q_kwic(spark, sf_dir):
    """Keyword-in-context concordance for one term: every occurrence
    with 3 tokens of left/right context, (doc_id, pos) order, first 100
    rows — the classic corpus-browser query over the positions model."""
    return concordance.kwic(
        _docs(spark, sf_dir), KWIC_TERM, width=3, k=100
    )


O_KWIC = f"""
WITH fl AS (SELECT doc_id, {WS_SQL} AS tk FROM documents),
m AS (SELECT doc_id, tk,
        unnest(list_filter(range(1, len(tk) + 1),
                           i -> tk[i] = '{KWIC_TERM}')) AS i
      FROM fl)
SELECT doc_id, (i - 1)::int AS pos,
       coalesce(array_to_string(
         list_slice(tk, greatest(i - 3, 1), i - 1), ' '), '') AS left_ctx,
       coalesce(array_to_string(
         list_slice(tk, i + 1, least(i + 3, len(tk))), ' '), '') AS right_ctx
FROM m ORDER BY doc_id ASC, pos ASC LIMIT 100
"""


def q_term_dispersion(spark, sf_dir):
    """Gries DP dispersion of the 20 most frequent terms — burstiness
    QC: high-cf terms concentrated in few docs flag boilerplate."""
    return concordance.term_dispersion(_corpus(spark, sf_dir), top_n=20)


O_TERM_DISPERSION = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM dt GROUP BY 1),
cf AS (SELECT term, sum(tf) AS cf FROM dt GROUP BY 1),
tot AS (SELECT sum(tf) AS n FROM dt),
j AS (SELECT dt.term, dt.tf, dl.dl, cf.cf, tot.n
      FROM dt JOIN dl USING (doc_id) JOIN cf USING (term) CROSS JOIN tot),
pt AS (SELECT term, max(cf)::bigint AS cf,
              round(0.5 * (sum(abs(tf / cf - dl / n))
                           + (1 - sum(dl / n))), 6) AS dp
       FROM j GROUP BY term)
SELECT term, cf, dp FROM pt ORDER BY cf DESC, term ASC LIMIT 20
"""


def q_zipf_fit(spark, sf_dir):
    """Zipf rank-frequency OLS fit over the corpus vocabulary (one-row
    corpus diagnostic; slope ~ -1 for natural text)."""
    return wordcounts.zipf_fit(_corpus(spark, sf_dir), top_n=1000)


O_ZIPF_FIT = f"""
WITH {TOKS_CTE},
cf AS (SELECT term, count(*)::double AS cf FROM toks GROUP BY term),
top AS (SELECT term, cf FROM cf ORDER BY cf DESC, term ASC LIMIT 1000),
xy AS (SELECT ln((row_number() OVER (ORDER BY cf DESC, term ASC))::double) AS x,
              ln(cf) AS y FROM top),
s AS (SELECT count(*)::double AS n, sum(x) AS sx, sum(y) AS sy,
             sum(x * y) AS sxy, sum(x * x) AS sx2, sum(y * y) AS sy2
      FROM xy)
SELECT n::bigint AS n_terms,
       round((n * sxy - sx * sy) / (n * sx2 - sx * sx), 6) AS slope,
       round((sy - ((n * sxy - sx * sy) / (n * sx2 - sx * sx)) * sx) / n, 6)
         AS intercept,
       round(((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sx2 - sx * sx) * (n * sy2 - sy * sy)), 6) AS r2
FROM s
"""


def q_collocations(spark, sf_dir):
    """Top-20 PMI collocations (Church & Hanks 1990) over the corpus;
    min pair count 5 guards PMI's low-count pathology."""
    return keyness.collocations(_docs(spark, sf_dir), k=20, min_count=5)


O_COLLOCATIONS = f"""
WITH fl AS (SELECT doc_id, {TOK_SQL} AS l FROM documents),
tk AS (SELECT doc_id, unnest(l) AS w, generate_subscripts(l, 1) AS ord
       FROM fl),
dp AS (SELECT a.w AS w1, b.w AS w2
       FROM tk a JOIN tk b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
c12 AS (SELECT w1, w2, count(*)::double AS c12 FROM dp
        GROUP BY 1, 2 HAVING count(*) >= 5),
uni AS (SELECT w, count(*)::double AS c FROM tk GROUP BY 1),
tot AS (SELECT (SELECT count(*) FROM tk)::double AS n1,
               (SELECT count(*) FROM dp)::double AS n2)
SELECT w1, w2, c12::bigint AS pair_count,
       round(ln((c12 / n2) / ((u1.c / n1) * (u2.c / n1))), 6) AS pmi
FROM c12
JOIN uni u1 ON u1.w = c12.w1
JOIN uni u2 ON u2.w = c12.w2
CROSS JOIN tot
ORDER BY pmi DESC, w1 ASC, w2 ASC LIMIT 20
"""


def q_dedup_span_excise(spark, sf_dir):
    """ExactSubstr dedup, removal half (Lee et al. 2022): every doc
    re-emitted with duplicated passages cut from the later copy (id_b
    side), earliest occurrence kept as canonical."""
    docs = _docs(spark, sf_dir)
    spans = dedup.duplicate_spans(docs, seed_n=6, min_len=8, max_gram_df=1000)
    return dedup.excise_spans(docs, spans)


O_DEDUP_SPAN_EXCISE = f"""
WITH t AS (SELECT doc_id, {WS_SQL} AS tk FROM documents),
g AS (SELECT doc_id, list_transform(range(1, greatest(len(tk) - 4, 1)),
        i -> array_to_string(tk[i:i+5], ' ')) AS gr
      FROM t WHERE len(tk) >= 6),
s0 AS (SELECT doc_id, unnest(gr) AS g,
              (generate_subscripts(gr, 1) - 1)::int AS pos FROM g),
rare AS (SELECT g FROM s0 GROUP BY g HAVING count(*) <= 1000),
s AS (SELECT s0.doc_id, s0.g, s0.pos FROM s0 JOIN rare USING (g)),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa,
             a.pos - b.pos AS diag
      FROM s a JOIN s b ON a.g = b.g AND a.doc_id < b.doc_id),
i AS (SELECT *, pa - row_number() OVER
        (PARTITION BY id_a, id_b, diag ORDER BY pa) AS isl FROM p),
sp AS (SELECT id_b, (min(pa) - diag)::int AS start_b,
              (count(*) + 5)::bigint AS span_len
       FROM i GROUP BY id_a, id_b, diag, isl
       HAVING count(*) + 5 >= 8),
iv AS (SELECT id_b AS doc_id,
              list(struct_pack(s := start_b,
                               e := (start_b + span_len - 1)::int)) AS iv
       FROM sp GROUP BY id_b),
cut AS (SELECT t.doc_id, t.tk,
          CASE WHEN iv.iv IS NULL THEN t.tk
               ELSE list_filter(t.tk, (x, i) ->
                 len(list_filter(iv.iv,
                     v -> i - 1 >= v.s AND i - 1 <= v.e)) = 0)
          END AS kept
        FROM t LEFT JOIN iv USING (doc_id))
SELECT doc_id, len(tk)::bigint AS n_tokens,
       (len(tk) - len(kept))::bigint AS n_removed,
       coalesce(array_to_string(kept, ' '), '') AS text
FROM cut
"""


def q_winnow_pairs(spark, sf_dir):
    """Substring-overlap candidate pairs (copied passages) via shared
    winnowing fingerprints — equality-join dedup like the others, but at
    passage granularity."""
    return textqc.winnow_pairs(_docs(spark, sf_dir), k=8, w=4, min_shared=2)


O_WINNOW_PAIRS = r"""
WITH n AS (SELECT doc_id,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
           FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 6, 1)),
          i -> ('0x' || substr(md5(substr(t, i::int, 8)), 1, 15))::bigint)
          AS grams
      FROM n WHERE length(t) >= 8),
m AS (SELECT doc_id,
        list_transform(range(1, greatest(len(grams) - 2, 1)),
          j -> list_aggregate(grams[j:j+3], 'min')) AS mins
      FROM g WHERE len(grams) >= 4),
fp AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::bigint AS shared_fps
FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING count(*) >= 2
"""


def q_winnow_fingerprints(spark, sf_dir):
    """MOSS winnowing (rolling k-gram hash, per-window minima): the
    substring-level dedup fingerprint — any shared run of k+w-1 chars
    between docs yields a shared fp. Exact values oracle-checked (60-bit
    md5 gram identity, same cross-engine trick as simhash)."""
    return textqc.winnow_fingerprints(_docs(spark, sf_dir), k=8, w=4)


O_WINNOW = r"""
WITH n AS (SELECT doc_id,
             regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
           FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 6, 1)),
          i -> ('0x' || substr(md5(substr(t, i::int, 8)), 1, 15))::bigint)
          AS grams
      FROM n WHERE length(t) >= 8),
m AS (SELECT doc_id,
        list_transform(range(1, greatest(len(grams) - 2, 1)),
          j -> list_aggregate(grams[j:j+3], 'min')) AS mins
      FROM g WHERE len(grams) >= 4)
SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m
"""


def q_repetition_features(spark, sf_dir):
    """Gopher-style within-doc repetition signals (top token / top bigram
    coverage, duplicated-3-gram fraction): the standard quality filters
    for machine-generated & boilerplate text. One codegen'd scan, array
    HOFs, zero shuffle."""
    return textqc.repetition_features(_docs(spark, sf_dir), ngram=3)


O_REPETITION = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
           FROM documents),
u AS (SELECT doc_id, unnest(tk) AS w FROM t),
uc AS (SELECT doc_id, max(c) AS topw
       FROM (SELECT doc_id, w, count(*) AS c FROM u GROUP BY 1, 2)
       GROUP BY doc_id),
bgu AS (SELECT doc_id, unnest(list_transform(range(1, len(tk)),
          i -> tk[i] || ' ' || tk[i+1])) AS g
        FROM t WHERE len(tk) >= 2),
bgc AS (SELECT doc_id, max(c) AS topbg, sum(c) AS nbg
        FROM (SELECT doc_id, g, count(*) AS c FROM bgu GROUP BY 1, 2)
        GROUP BY doc_id),
ngu AS (SELECT doc_id, unnest(list_transform(range(1, len(tk) - 1),
          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])) AS g
        FROM t WHERE len(tk) >= 3),
ngc AS (SELECT doc_id,
          coalesce(sum(c) FILTER (c >= 2), 0) AS dup, sum(c) AS tot
        FROM (SELECT doc_id, g, count(*) AS c FROM ngu GROUP BY 1, 2)
        GROUP BY doc_id)
SELECT t.doc_id, len(tk)::bigint AS n_tokens,
       round(coalesce(topw, 0)::double / greatest(len(tk), 1), 6)
           AS top_token_frac,
       round(coalesce(topbg, 0)::double / greatest(coalesce(nbg, 0), 1), 6)
           AS top_bigram_frac,
       round(coalesce(dup, 0)::double / greatest(coalesce(tot, 0), 1), 6)
           AS dup_ngram_frac
FROM t
LEFT JOIN uc USING (doc_id)
LEFT JOIN bgc USING (doc_id)
LEFT JOIN ngc USING (doc_id)
"""


def q_contamination_pairs(spark, sf_dir):
    """Benchmark decontamination (GPT-3/Llama recipe): training docs
    sharing any word 4-gram with a held-out eval set (deterministic
    doc_id % 97 == 3 slice standing in for the benchmark). Eval n-grams
    broadcast; corpus side is one scan."""
    docs = _docs(spark, sf_dir)
    ev = docs.filter(F.col("doc_id") % 97 == 3)
    corpus = docs.filter(F.col("doc_id") % 97 != 3)
    return textqc.contamination_pairs(corpus, ev, n=4)


O_CONTAMINATION = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
           FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
          range(1, len(tk) - 2),
          i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] || ' ' || tk[i+3])))
          AS gram
      FROM t WHERE len(tk) >= 4),
ev AS (SELECT doc_id AS eval_id, gram FROM g WHERE doc_id % 97 = 3),
co AS (SELECT doc_id, gram FROM g WHERE doc_id % 97 != 3)
SELECT co.doc_id, ev.eval_id, count(*)::bigint AS shared_ngrams
FROM co JOIN ev USING (gram) GROUP BY 1, 2
"""


def q_pack_sequences(spark, sf_dir):
    """Concat-and-chunk sequence packing (LLM pre-training layout): each
    doc's placement in per-shard fixed-length token streams. Hash-bucket
    shards (engine-reproducible md5), one per-shard prefix-sum window."""
    return textqc.pack_sequences(_docs(spark, sf_dir), seq_len=256, n_shards=8)


O_PACK_SEQUENCES = r"""
WITH t AS (SELECT doc_id,
    len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+'))::bigint
        AS n_tokens,
    ('0x' || substr(md5('pack' || doc_id::varchar), 1, 8))::bigint % 8
        AS shard
  FROM documents),
w AS (SELECT doc_id, shard, n_tokens,
    sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                        ROWS UNBOUNDED PRECEDING) - n_tokens AS pos_start
  FROM t)
SELECT doc_id, shard, n_tokens, pos_start,
       pos_start // 256 AS seq_first,
       greatest(pos_start + n_tokens - 1, pos_start) // 256 AS seq_last
FROM w
"""


def q_dedup_clusters(spark, sf_dir):
    """Near-dup pair graph -> dedup clusters: connected components (min
    reachable doc_id) over the winnowing passage-overlap pairs, via
    pointer-jumping min-label propagation (O(log diameter) rounds).
    Turns pairwise dedup evidence into keep-one-per-cluster decisions."""
    pairs = textqc.winnow_pairs(_docs(spark, sf_dir), k=8, w=4, min_shared=2)
    return dedup.dedup_clusters(pairs)


O_DEDUP_CLUSTERS = r"""
WITH RECURSIVE
n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 6, 1)),
          i -> ('0x' || substr(md5(substr(t, i::int, 8)), 1, 15))::bigint)
          AS grams
      FROM n WHERE length(t) >= 8),
m AS (SELECT doc_id,
        list_transform(range(1, greatest(len(grams) - 2, 1)),
          j -> list_aggregate(grams[j:j+3], 'min')) AS mins
      FROM g WHERE len(grams) >= 4),
fp AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT id_a AS src, id_b AS dst FROM p
      UNION SELECT id_b, id_a FROM p),
r AS (SELECT src AS id, src AS reach FROM e
      UNION SELECT r.id, e.dst FROM r JOIN e ON e.src = r.reach)
SELECT id AS doc_id, min(reach) AS cluster_id FROM r GROUP BY id
"""


def q_dedup_keep_best(spark, sf_dir):
    """Keep-best-copy dedup (FineWeb-style): winnowing pair graph ->
    connected components -> keep the highest-quality member per cluster
    (ties: lowest doc_id); singletons always kept."""
    docs = _docs(spark, sf_dir)
    pairs = textqc.winnow_pairs(docs, k=8, w=4, min_shared=2)
    clusters = dedup.dedup_clusters(pairs)
    scored = textqc.quality_score(docs).select("doc_id", "quality")
    return dedup.keep_best(scored, clusters, "quality")


O_DEDUP_KEEP_BEST = rf"""
WITH RECURSIVE
n AS (SELECT doc_id, regexp_replace(trim(lower(text)), '\s+', ' ', 'g') AS t
      FROM documents),
g AS (SELECT doc_id,
        list_transform(range(1, greatest(length(t) - 6, 1)),
          i -> ('0x' || substr(md5(substr(t, i::int, 8)), 1, 15))::bigint)
          AS grams
      FROM n WHERE length(t) >= 8),
m AS (SELECT doc_id,
        list_transform(range(1, greatest(len(grams) - 2, 1)),
          j -> list_aggregate(grams[j:j+3], 'min')) AS mins
      FROM g WHERE len(grams) >= 4),
fp AS (SELECT DISTINCT doc_id, unnest(mins) AS fp FROM m),
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM fp a JOIN fp b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT id_a AS src, id_b AS dst FROM p
      UNION SELECT id_b, id_a FROM p),
r AS (SELECT src AS id, src AS reach FROM e
      UNION SELECT r.id, e.dst FROM r JOIN e ON e.src = r.reach),
cl AS (SELECT id AS doc_id, min(reach) AS cluster_id FROM r GROUP BY id),
qx AS ({O_QUALITY}),
j AS (SELECT qx.doc_id, coalesce(cl.cluster_id, qx.doc_id) AS cluster_id,
             qx.quality
      FROM qx LEFT JOIN cl USING (doc_id)),
rk AS (SELECT *, row_number() OVER (PARTITION BY cluster_id
           ORDER BY quality DESC, doc_id ASC) AS rn FROM j)
SELECT doc_id, cluster_id, quality, (rn = 1) AS keep FROM rk
"""


def q_bpe_pair_counts(spark, sf_dir):
    """Corpus-wide adjacent char-pair frequencies over the word-frequency
    table (the statistic behind BPE merge #1). The only corpus-sized op
    is the vocab groupBy; pairs are enumerated on |vocab| rows."""
    return bpe.bpe_pair_counts(_docs(spark, sf_dir), top_k=50)


O_BPE_PAIRS = r"""
WITH u AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
           FROM documents),
wc AS (SELECT term, count(*)::bigint AS cnt FROM u GROUP BY term),
p AS (SELECT unnest(list_transform(range(1, length(term)),
          i -> substr(term, i, 2))) AS pair, cnt
      FROM wc WHERE length(term) >= 2)
SELECT pair, sum(cnt)::bigint AS pair_count FROM p GROUP BY pair
ORDER BY pair_count DESC, pair ASC LIMIT 50
"""


def q_chunk_documents(spark, sf_dir):
    """Overlapping context-window chunking (32-token windows, stride 24):
    the long-document treatment for embedding/retrieval corpora. One JVM
    scan, tokens projected once, slice+join per window, no shuffle."""
    return textqc.chunk_documents(_docs(spark, sf_dir), window=32, stride=24)


O_CHUNK_DOCUMENTS = r"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS tk
           FROM documents),
s AS (SELECT doc_id, tk, unnest(range(1, len(tk) + 1, 24)) AS i
      FROM t WHERE len(tk) >= 1)
SELECT doc_id, ((i - 1) // 24)::bigint AS chunk_idx,
       array_to_string(tk[i:i+31], ' ') AS chunk_text,
       least(32, len(tk) - i + 1)::bigint AS n_tokens
FROM s
"""

def q_corpus_profile(spark, sf_dir):
    """One-pass per-language + whole-corpus data card (rollup grouping
    sets): doc counts, token totals, exact length percentiles."""
    return textqc.corpus_profile(_docs(spark, sf_dir), stratum_col="lang")


O_CORPUS_PROFILE = r"""
SELECT CASE WHEN GROUPING(lang) = 1 THEN 'ALL' ELSE lang END AS stratum,
       count(*)::bigint AS n_docs,
       sum(len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+')))::bigint
           AS total_tokens,
       round(avg(length(text)), 6) AS mean_chars,
       round(quantile_cont(length(text), 0.5), 6) AS p50_chars,
       round(quantile_cont(length(text), 0.95), 6) AS p95_chars
FROM documents GROUP BY ROLLUP(lang)
"""

_RESAMPLE_WEIGHTS = {"en": 0.6, "es": 0.25, "fr": 1.5, "de": 1.0, "zh": 2.3}


def q_resample_weighted(spark, sf_dir):
    """Deterministic per-language corpus mixing (DoReMi-style reweighting):
    floor(w) copies + one more below the hash threshold; identical
    replicas on any engine/cluster size."""
    out = textqc.resample_weighted(
        _docs(spark, sf_dir), _RESAMPLE_WEIGHTS, "lang"
    )
    return out.select("doc_id", "lang", "repeat_idx")


O_RESAMPLE_WEIGHTED = r"""
WITH t AS (SELECT doc_id, lang,
    ('0x' || substr(md5('resample' || doc_id::varchar), 1, 8))::bigint
        / 4294967295.0 AS u,
    CASE lang WHEN 'de' THEN 1.0 WHEN 'en' THEN 0.6 WHEN 'es' THEN 0.25
              WHEN 'fr' THEN 1.5 WHEN 'zh' THEN 2.3 ELSE 1.0 END AS w
  FROM documents),
r AS (SELECT doc_id, lang,
    (floor(w) + CASE WHEN u < w - floor(w) THEN 1 ELSE 0 END)::bigint AS nr
  FROM t)
SELECT doc_id, lang, unnest(range(0, nr)) AS repeat_idx FROM r WHERE nr >= 1
"""


BPE_NUM_MERGES = 20


def q_bpe_merges(spark, sf_dir):
    """Learned BPE merge list (greedy Sennrich loop over the distributed
    word-frequency table; deterministic (-count, left, right) tie-break).
    ORACLED despite being iterative: the oracle unrolls all 20 greedy
    steps as chained materialized CTEs (the textrank trick) — the merge
    application is a list_reduce string fold whose greedy left-to-right
    non-overlap matches the Python loop exactly (a merged token can
    never string-equal `left`, so the fold never double-merges)."""
    merges = bpe.learn_bpe_merges(
        _docs(spark, sf_dir), num_merges=BPE_NUM_MERGES
    )
    return spark.createDataFrame(
        [(i, l, r, c) for i, (l, r, c) in enumerate(merges)],
        "rank int, left string, right string, pair_count bigint",
    )


def _o_bpe_merges() -> str:
    parts = [
        f"""toks AS (SELECT unnest({TOK_SQL}) AS term FROM documents),
wc AS (SELECT term, count(*)::bigint AS cnt FROM toks GROUP BY 1
       ORDER BY cnt DESC, term LIMIT 100000),
w0 AS MATERIALIZED (
  SELECT array_to_string(list_transform(range(1, len(term) + 1),
                                        i -> term[i]), ' ') AS s, cnt
  FROM wc)"""
    ]
    for i in range(BPE_NUM_MERGES):
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT z[1] AS l, z[2] AS r, sum(cnt)::bigint AS c
  FROM (SELECT unnest(list_zip(syms, syms[2:])) AS z, cnt
        FROM (SELECT string_split(s, ' ') AS syms, cnt FROM w{i}))
  WHERE z[2] IS NOT NULL GROUP BY 1, 2),
b{i} AS MATERIALIZED (SELECT l, r, c FROM p{i} ORDER BY c DESC, l, r LIMIT 1)"""
        )
        if i < BPE_NUM_MERGES - 1:
            parts.append(
                f"""w{i + 1} AS MATERIALIZED (
  SELECT s, sum(cnt)::bigint AS cnt FROM (
    SELECT list_reduce(string_split(s, ' '), (acc, x) ->
      CASE WHEN regexp_extract(acc, '([^ ]+)$', 1) = b{i}.l AND x = b{i}.r
           THEN acc || b{i}.r ELSE acc || ' ' || x END) AS s, cnt
    FROM w{i} CROSS JOIN b{i})
  GROUP BY s)"""
            )
    union = " UNION ALL ".join(
        f'SELECT {i} AS rank, l AS "left", r AS "right", c AS pair_count'
        f" FROM b{i}"
        for i in range(BPE_NUM_MERGES)
    )
    return "WITH " + ",\n".join(parts) + f"\n{union} ORDER BY rank"


O_BPE_MERGES = _o_bpe_merges()


# --------------------------------------------------------------------- #
