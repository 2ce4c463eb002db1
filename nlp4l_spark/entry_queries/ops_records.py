# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    CHI2_TERMS, F, LUCENE_ENGLISH_STOPWORDS, STANDARD_ANALYZER,
    TFIDF_FEATURES, TOKS_CTE, TOK_SQL, WS_SQL, Window, _corpus, _docs,
    _lineitem, processors, textqc, tfidf, wordcounts,
)
# Term vectors / positions (RawReader PosAndOffset surface, SURVEY §1.3)
# --------------------------------------------------------------------- #
POS_TERM = "merge"


def q_term_positions(spark, sf_dir):
    """Per-doc positions of one term over the full token stream (Lucene
    StopFilter position-increment semantics), exploded to scalar rows."""
    tv = _corpus(spark, sf_dir).term_vectors()
    return (
        tv.filter(F.col("term") == POS_TERM)
        .select("doc_id", F.explode("positions").alias("pos"))
        .select("doc_id", F.col("pos").cast("int").alias("pos"))
    )


O_TERM_POSITIONS = f"""
WITH fl AS (SELECT doc_id, {WS_SQL} AS l FROM documents),
t AS (SELECT doc_id, unnest(l) AS tok,
             (generate_subscripts(l, 1) - 1)::int AS pos FROM fl)
SELECT doc_id, pos FROM t WHERE tok = '{POS_TERM}'
"""


# --------------------------------------------------------------------- #
# ReplayProcessor overlay (SURVEY §2.4) — MERGE INTO semantics
# --------------------------------------------------------------------- #
REPLAY_DELETES = [0, 97, 194]
REPLAY_MODS = [5, 101]
REPLAY_ADDS = [(10_000_000, "replayed new doc alpha"), (10_000_001, "replayed new doc beta")]


def q_replay(spark, sf_dir):
    docs = _docs(spark, sf_dir).select("doc_id", "text", "source")
    mods = spark.createDataFrame(
        [(i, "EDITED", "edit") for i in REPLAY_MODS],
        "doc_id long, text string, source string",
    )
    adds = spark.createDataFrame(
        [(i, t, "add") for i, t in REPLAY_ADDS],
        "doc_id long, text string, source string",
    )
    return processors.replay(
        docs, modified=mods, deleted_hashes=REPLAY_DELETES,
        added=adds, hash_col="doc_id",
    )


O_REPLAY = f"""
SELECT doc_id, text, source FROM documents
WHERE doc_id NOT IN ({", ".join(map(str, REPLAY_DELETES + REPLAY_MODS))})
UNION ALL
SELECT * FROM (VALUES
  {", ".join(f"({i}::bigint, 'EDITED', 'edit')" for i in REPLAY_MODS)},
  {", ".join(f"({i}::bigint, '{t}', 'add')" for i, t in REPLAY_ADDS)}
) v(doc_id, text, source)
"""


# --------------------------------------------------------------------- #
# StopWordsProcessor record filter (SURVEY §2.3)
# --------------------------------------------------------------------- #
def q_stop_filter(spark, sf_dir):
    kept = processors.stop_words(_docs(spark, sf_dir), "lang", ["es", "de"])
    return kept.groupBy("lang").agg(F.count("*").alias("cnt"))


O_STOP_FILTER = """
SELECT lang, count(*)::bigint AS cnt FROM documents
WHERE lang NOT IN ('es', 'de') GROUP BY lang
"""


# --------------------------------------------------------------------- #
# KEA keyphrase candidates + features (SURVEY §2.3/§2.5)
# --------------------------------------------------------------------- #
def q_kea_bigrams(spark, sf_dir):
    from nlp4l_spark.ops import kea

    return (
        kea.candidate_counts(_docs(spark, sf_dir), 2)
        .orderBy(F.desc("cnt"), F.asc("phrase"))
        .limit(20)
    )


_STOPLIST_SQL = ", ".join(f"'{w}'" for w in sorted(LUCENE_ENGLISH_STOPWORDS))

O_KEA_BIGRAMS = f"""
WITH fl AS (SELECT doc_id, {WS_SQL} AS l FROM documents),
t AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord FROM fl),
p AS (SELECT a.tok || ' ' || b.tok AS phrase
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1)
SELECT phrase, count(*)::bigint AS cnt FROM p
WHERE split_part(phrase, ' ', 1) NOT IN ({_STOPLIST_SQL})
  AND split_part(phrase, ' ', 2) NOT IN ({_STOPLIST_SQL})
GROUP BY phrase ORDER BY cnt DESC, phrase ASC LIMIT 20
"""


def q_kea_features(spark, sf_dir):
    from nlp4l_spark.ops import kea

    feats = kea.kea_features(_docs(spark, sf_dir), CHI2_TERMS)
    return feats.select(
        "doc_id",
        "term",
        F.round("kea_tfidf", 6).alias("kea_tfidf"),
        F.round("first_occ", 6).alias("first_occ"),
    )


_KEA_TERMS_SQL = ", ".join(f"'{t}'" for t in CHI2_TERMS)

O_KEA_FEATURES = f"""
WITH fl AS (SELECT doc_id, {WS_SQL} AS l FROM documents),
t AS (SELECT doc_id, len(l) AS doc_size, unnest(l) AS tok,
             (generate_subscripts(l, 1) - 1) AS pos FROM fl),
per_doc AS (SELECT doc_id, tok AS term, count(*) AS tf, min(pos) AS first_pos,
                   min(doc_size) AS doc_size
            FROM t WHERE tok IN ({_KEA_TERMS_SQL}) GROUP BY doc_id, tok),
dfm AS (SELECT term, count(*) AS df FROM per_doc GROUP BY term),
n AS (SELECT count(*) AS n FROM documents)
SELECT p.doc_id, p.term,
       round(p.tf::double / p.doc_size * -(log2(d.df::double / n.n)), 6) AS kea_tfidf,
       round(p.first_pos::double / p.doc_size, 6) AS first_occ
FROM per_doc p JOIN dfm d USING (term) CROSS JOIN n
"""


def q_kea_extract(spark, sf_dir):
    """Full KEA flow (rows-only: MDLP + NB not SQL-expressible): train on
    docs labeled with their own top tfidf phrase, extract on the corpus."""
    from nlp4l_spark.ops import kea

    docs = _docs(spark, sf_dir).limit(200)
    n_docs = docs.count()
    feats = kea.candidate_features(kea.doc_candidates(docs, (1, 2)), n_docs)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("phrase")
    )
    labels = (
        feats.withColumn("r", F.row_number().over(w))
        .filter("r = 1")
        .groupBy("doc_id")
        .agg(F.collect_list("phrase").alias("keyphrases"))
    )
    train = docs.join(labels, "doc_id")
    model = kea.fit_kea_model(train, ns=(1, 2))
    return kea.extract_keyphrases(docs, model, max_keyphrases=3, ns=(1, 2))


def q_kea_top_keyphrases(spark, sf_dir):
    from nlp4l_spark.ops import kea

    return kea.top_keyphrases(_docs(spark, sf_dir), k=15)


O_KEA_TOP_KEYPHRASES = f"""
WITH fl AS (SELECT doc_id, {WS_SQL} AS l FROM documents),
t AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) AS ord FROM fl),
n AS (SELECT count(*) AS n FROM documents),
c1 AS (SELECT tok AS phrase, 1 AS n, count(*) AS cf,
              count(DISTINCT doc_id) AS df
       FROM t WHERE tok NOT IN ({_STOPLIST_SQL}) AND length(tok) > 1
         AND NOT regexp_matches(tok, '^\\d+$')
       GROUP BY tok),
p2 AS (SELECT a.doc_id, a.tok || ' ' || b.tok AS phrase
       FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.ord = a.ord + 1),
c2 AS (SELECT phrase, 2 AS n, count(*) AS cf,
              count(DISTINCT doc_id) AS df
       FROM p2
       WHERE split_part(phrase, ' ', 1) NOT IN ({_STOPLIST_SQL})
         AND split_part(phrase, ' ', 2) NOT IN ({_STOPLIST_SQL})
       GROUP BY phrase),
cand AS (SELECT phrase, n, cf, df,
                cf * -(log2(df::double / (SELECT n FROM n))) AS score
         FROM (SELECT * FROM c1 UNION ALL SELECT * FROM c2)
         ORDER BY score DESC, phrase ASC LIMIT 750),
ranked AS (SELECT *, row_number() OVER (ORDER BY score DESC, phrase ASC) AS rank
           FROM cand),
dropped AS (SELECT DISTINCT u.phrase
            FROM ranked u JOIN ranked b
              ON b.n = 2 AND u.n = 1 AND b.rank < u.rank
             AND (u.phrase = split_part(b.phrase, ' ', 1)
               OR u.phrase = split_part(b.phrase, ' ', 2)))
SELECT phrase, n, cf::bigint AS cf, df::bigint AS df,
       round(score, 6) AS score
FROM ranked WHERE phrase NOT IN (SELECT phrase FROM dropped)
ORDER BY rank LIMIT 15
"""


# --------------------------------------------------------------------- #
# LTR feature extraction (SURVEY §3.3; DocFeature shape)
# --------------------------------------------------------------------- #
LTR_QUERIES = [(1, "join merge vector"), (2, "hash scan"), (3, "window stream")]


def q_ltr_features(spark, sf_dir):
    from nlp4l_spark.ops import ltr

    feats = ltr.extract_features(_corpus(spark, sf_dir), LTR_QUERIES)
    return feats.select(
        "qid",
        "doc_id",
        F.round("bm25", 6).alias("bm25"),
        F.col("sum_tf").cast("long").alias("sum_tf"),
        F.round("sum_idf", 6).alias("sum_idf"),
        F.col("dl").cast("long").alias("dl"),
        F.col("n_matched").cast("long").alias("n_matched"),
    )


def _ltr_qterms_values() -> str:
    rows = []
    for qid, q in LTR_QUERIES:
        for t in sorted(set(STANDARD_ANALYZER.tokenize(q))):
            rows.append(f"({qid}, '{t}')")
    return ", ".join(rows)


O_LTR_FEATURES = f"""
WITH {TOKS_CTE},
dl AS (SELECT doc_id, len({TOK_SQL}) AS dl FROM documents),
n AS (SELECT count(*) AS n FROM documents),
qt(qid, term) AS (VALUES {_ltr_qterms_values()}),
tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
       WHERE term IN (SELECT term FROM qt) GROUP BY doc_id, term),
dfm AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT qt.qid, tf.doc_id, tf.tf, dl.dl,
         ln(1.0 + (n.n - dfm.df + 0.5) / (dfm.df + 0.5)) AS idf
  FROM qt JOIN tf USING (term) JOIN dfm USING (term)
  JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN n
)
SELECT qid, doc_id,
       round(sum(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / (
           SELECT sum(dl)::double / count(*) FROM dl)))), 6) AS bm25,
       sum(tf)::bigint AS sum_tf,
       round(sum(idf), 6) AS sum_idf,
       min(dl)::bigint AS dl,
       count(*)::bigint AS n_matched
FROM scored GROUP BY qid, doc_id
"""


# --------------------------------------------------------------------- #
# Spellcheck char-ngram suggest (SURVEY §2.2 spellcheck index)
# --------------------------------------------------------------------- #
SPELL_WORD = "spakr"


def q_spellcheck_suggest(spark, sf_dir):
    from nlp4l_spark.ops import spellcheck

    terms = (
        _corpus(spark, sf_dir)
        .tokens()
        .select(F.explode("tokens").alias("term"))
        .distinct()
    )
    return spellcheck.suggest(terms, SPELL_WORD, k=10)


def _spell_grams_sql() -> str:
    w = SPELL_WORD
    grams = sorted({w[i : i + 2] for i in range(max(len(w) - 1, 1))})
    return "[" + ", ".join(f"'{g}'" for g in grams) + "]"


O_SPELLCHECK_SUGGEST = f"""
WITH {TOKS_CTE},
terms AS (SELECT DISTINCT term FROM toks),
g AS (SELECT term,
        list_distinct(list_transform(
          generate_series(1, greatest(length(term) - 1, 1)),
          i -> substr(term, i, 2))) AS grams
      FROM terms),
s AS (SELECT term,
        len(list_intersect(grams, {_spell_grams_sql()}))::bigint AS overlap,
        levenshtein(term, '{SPELL_WORD}')::bigint AS distance
      FROM g)
SELECT term, overlap, distance FROM s WHERE overlap >= 1
ORDER BY overlap DESC, distance ASC, term ASC LIMIT 10
"""


# --------------------------------------------------------------------- #
# Acronym extraction (SURVEY §2.3) — python alignment logic, rows-only
# --------------------------------------------------------------------- #
ACRONYM_SENTENCES = [
    "The HTTP Hyper Text Transfer Protocol is a protocol.",
    "We use the Apache Software Foundation (ASF) releases.",
    "latency of the CPU central processing unit matters",
    "no acronyms in this line at all",
]


def q_acronyms(spark, sf_dir):
    from nlp4l_spark.ops import acronyms

    df = spark.createDataFrame([(s,) for s in ACRONYM_SENTENCES], "text string")
    return acronyms.extract_acronyms(df)


def q_acronym_candidates(spark, sf_dir):
    """Regex candidate-find half of AcronymExtractionProcessor (JVM-side,
    SQL-oracled); the alignment half is the rows-only `acronyms` query."""
    from nlp4l_spark.ops import acronyms

    df = spark.createDataFrame([(s,) for s in ACRONYM_SENTENCES], "text string")
    return acronyms.acronym_candidates(df)


O_ACRONYM_CANDIDATES = r"""
WITH s(text) AS (VALUES {vals}),
c AS (SELECT unnest(regexp_extract_all(text, '[A-Z][A-Za-z/\-]*[A-Z]')) AS acronym FROM s)
SELECT acronym, count(*)::bigint AS cnt FROM c
WHERE length(acronym) <= 10 GROUP BY acronym
""".format(vals=", ".join(f"('{s}')" for s in ACRONYM_SENTENCES))


# --------------------------------------------------------------------- #
# MDLP discretizer (SURVEY §2.11 vendored MDLPDiscretizer) — rows-only
# (recursive MDL acceptance is not SQL-expressible)
# --------------------------------------------------------------------- #
def q_mdlp_cuts(spark, sf_dir):
    from nlp4l_spark.ops import discretizer

    li = _lineitem(spark, sf_dir).select(
        "l_quantity", "l_extendedprice", "l_discount", "l_returnflag"
    )
    cuts = discretizer.fit_mdlp(
        li, ["l_quantity", "l_extendedprice", "l_discount"], "l_returnflag"
    )
    return cuts.select(
        "feature", F.size("cuts").alias("n_cuts"), F.explode_outer("cuts").alias("cut")
    ).select("feature", "n_cuts", F.round("cut", 6).alias("cut"))


# --------------------------------------------------------------------- #
# NER record processor (SURVEY §2.3 OpenNLPNerRecordProcessor) —
# rows-only (pluggable tagger; heuristic fake in this environment)
# --------------------------------------------------------------------- #
NER_SENTENCES = [
    (0, "We visited London Bridge today. Dr Smith was there."),
    (1, "Call Mr Jones about the Tokyo launch."),
    (2, "nothing capitalized here"),
]

_CAP_RUN = r"[A-Z][A-Za-z.\-]*(?:\s+[A-Z][A-Za-z.\-]*)*"


def q_ner_candidates(spark, sf_dir):
    """SQL-expressible half of the NER processor: maximal capitalized-token
    runs (the heuristic tagger's candidate spans) via regexp_extract_all —
    JVM-side, DuckDB-oracled. The typed span alignment stays in the Arrow
    UDF (`ner_entities`, rows-only)."""
    df = spark.createDataFrame(NER_SENTENCES, "doc_id long, text string")
    return (
        df.select(
            "doc_id",
            F.explode(
                F.regexp_extract_all("text", F.lit(_CAP_RUN), 0)
            ).alias("span"),
        )
        .groupBy("doc_id", "span")
        .agg(F.count("*").alias("cnt"))
    )


O_NER_CANDIDATES = """
WITH s(doc_id, text) AS (VALUES {vals}),
c AS (SELECT doc_id, unnest(regexp_extract_all(text, '{pat}')) AS span FROM s)
SELECT doc_id, span, count(*)::bigint AS cnt FROM c GROUP BY doc_id, span
""".format(
    vals=", ".join(f"({i}, '{t}')" for i, t in NER_SENTENCES),
    pat=_CAP_RUN,
)


def q_ner_entities(spark, sf_dir):
    """Typed NER spans from the LEARNED model file (ops/ner.py::
    PerceptronTagger — averaged perceptron over BIO labels, the
    NameFinderME family; trained offline by scripts/train_ner_model.py,
    shipped as the pickle-free TSV the OpenNLPNerProcessor model-file
    contract expects). Rows-only: a trained model has no SQL twin."""
    from nlp4l_spark.ops import ner

    df = spark.createDataFrame(NER_SENTENCES, "doc_id long, text string")
    return ner.extract_entities(
        df, tagger=ner.PerceptronTagger.load(ner.default_model_path())
    )


# --------------------------------------------------------------------- #
# ML classification round-trip (SURVEY §2.11) — rows-only (model-based)
# --------------------------------------------------------------------- #
def q_ml_classify(spark, sf_dir):
    from nlp4l_spark.ops import ml
    from nlp4l_spark.stats import Corpus as _C

    docs = _docs(spark, sf_dir).limit(200).withColumn(
        "label", F.col("lang")
    )
    corpus = _C(docs, "text", "doc_id")
    featurizer = ml.fit_featurizer(corpus, min_df=2)
    labels = ml.label_map(docs, "label")
    feat = featurizer.transform(docs.join(labels, "label"))
    model, _precision = ml.train_classifier(feat, "naive_bayes")
    pred = ml.classify(model, featurizer, docs.select("doc_id", "text"))
    return pred.select("doc_id", F.col("prediction").cast("int").alias("pred"))


# --------------------------------------------------------------------- #
# Pipeline hygiene: PII redaction, deterministic sampling, percentiles
# --------------------------------------------------------------------- #
PII_SENTENCES = [
    (0, "contact bob@example.com or call 555-123-4567 today"),
    (1, "ssn 123-45-6789 leaked from host 10.1.2.3"),
    (2, "nothing sensitive in this line"),
]


def q_redact_pii(spark, sf_dir):
    """Regex PII scrub (ops/textqc.redact_pii): chained JVM regexp_replace;
    the standard first-pass scrub of a training corpus."""
    df = spark.createDataFrame(PII_SENTENCES, "sid long, text string")
    return textqc.redact_pii(df, "text", out_col="redacted").select(
        "sid", "redacted"
    )


O_REDACT_PII = r"""
WITH s(sid, text) AS (VALUES {vals})
SELECT sid,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
        '\b[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}\b', '[SSN]', 'g'),
      '\b(?:\+?1[-. ]?)?\(?[0-9]{{3}}\)?[-. ][0-9]{{3}}[-. ][0-9]{{4}}\b',
      '[PHONE]', 'g'),
    '\b(?:[0-9]{{1,3}}\.){{3}}[0-9]{{1,3}}\b', '[IP]', 'g') AS redacted
FROM s
""".format(vals=", ".join(f"({i}, '{t}')" for i, t in PII_SENTENCES))


SAMPLE_RATES = {"en": 0.5, "fr": 1.0, "de": 0.25}


def q_sample_stratified(spark, sf_dir):
    """Deterministic per-language sampling (ops/textqc.stratified_sample):
    hash-threshold keep rule — the SAME rows survive on any cluster size or
    engine, the reproducibility a resumable pipeline needs (vs rand())."""
    return textqc.stratified_sample(
        _docs(spark, sf_dir), SAMPLE_RATES, "lang", "doc_id"
    ).select("doc_id", "lang")


O_SAMPLE_STRATIFIED = """
SELECT doc_id, lang FROM documents
WHERE ('0x' || substr(md5('sample' || doc_id::VARCHAR), 1, 8))::BIGINT::DOUBLE
      / 4294967295.0
      < CASE lang WHEN 'en' THEN 0.5 WHEN 'fr' THEN 1.0
                  WHEN 'de' THEN 0.25 ELSE 0.0 END
"""


def q_length_percentiles(spark, sf_dir):
    """Exact interpolated percentiles of document length per language
    (corpus-shape profiling)."""
    pcts = [0.25, 0.5, 0.75, 0.9]
    return (
        _docs(spark, sf_dir)
        .groupBy("lang")
        .agg(
            F.percentile("n_chars", F.array(*[F.lit(p) for p in pcts])).alias("_p")
        )
        .select(
            "lang",
            F.posexplode("_p").alias("idx", "val"),
        )
        .select(
            "lang",
            F.col("idx").cast("int").alias("idx"),
            F.round("val", 6).alias("val"),
        )
    )


O_LENGTH_PERCENTILES = """
SELECT lang, idx::int AS idx, round(q, 6) AS val
FROM (
  SELECT lang,
         unnest([0, 1, 2, 3]) AS idx,
         unnest(quantile_cont(n_chars, [0.25, 0.5, 0.75, 0.9])) AS q
  FROM documents GROUP BY lang
)
"""


# --------------------------------------------------------------------- #
# Dictionary phrase matching (SimpleFST surface, SURVEY §1.4)
# --------------------------------------------------------------------- #
DICT_PHRASES = [
    "join",
    "window",
    "merge join",
    "sort merge",
    "hash scan",
    "sort merge join",
]


def q_dict_match(spark, sf_dir):
    """All dictionary-phrase occurrences (FST substring lookup re-expressed
    as a broadcast n-gram equality join; ops/dictmatch.py)."""
    from nlp4l_spark.ops import dictmatch

    return dictmatch.phrase_occurrences(
        _docs(spark, sf_dir), DICT_PHRASES, "text", "doc_id"
    )


def _dict_gram_cte(n: int) -> str:
    concat = " || ' ' || ".join(f"tk[i+{j}]" for j in range(n))
    guard = f" WHERE len(tk) >= {n}" if n > 1 else ""
    return (
        f"g{n} AS (SELECT doc_id, unnest(list_transform("
        f"range(1, len(tk) - {n} + 2), i -> {{'s': i - 1, 'p': {concat}}})) "
        f"AS u FROM t{guard})"
    )


O_DICT_MATCH = f"""
WITH t AS (SELECT doc_id, {WS_SQL} AS tk FROM documents),
p(phrase, n_toks) AS (VALUES {", ".join(
    f"('{ph}', {len(ph.split())})" for ph in DICT_PHRASES)}),
{_dict_gram_cte(1)}, {_dict_gram_cte(2)}, {_dict_gram_cte(3)},
g AS (SELECT doc_id, u.s AS start_tok, 1 AS n_toks, u.p AS phrase FROM g1
      UNION ALL SELECT doc_id, u.s, 2, u.p FROM g2
      UNION ALL SELECT doc_id, u.s, 3, u.p FROM g3)
SELECT g.doc_id, g.start_tok::int AS start_tok, g.n_toks::int AS n_toks,
       g.phrase
FROM g JOIN p ON g.phrase = p.phrase AND g.n_toks = p.n_toks
"""


# --------------------------------------------------------------------- #
# Validators / vocab pruning / label map / TF vectors / pairwise LTR
# (SURVEY §2.3, §2.5, §2.11 gap-fill)
# --------------------------------------------------------------------- #
def q_validator_regex(spark, sf_dir):
    """RegexValidator (FeaturedValidators.scala:88-130): violation count of
    source values failing the accept pattern ^src\\d$."""
    _, bad = processors.regex_validator(_docs(spark, sf_dir), "source", r"^src\d$")
    return spark.createDataFrame([(bad,)], "violations long")


O_VALIDATOR_REGEX = r"""
SELECT count(*)::bigint AS violations FROM documents
WHERE NOT regexp_matches(source, '^src[0-9]$')
"""

SEARCH_VALIDATE_VALUES = ["join", "merge", "zzzunseen", "vector", "qqqmissing"]


def q_search_validator(spark, sf_dir):
    """SolrSearchValidator (FeaturedValidators.scala:144-192) re-expressed
    against our own term dictionary: per value, found = >=1 hit."""
    vals = spark.createDataFrame(
        [(v,) for v in SEARCH_VALIDATE_VALUES], "value string"
    )
    terms = _corpus(spark, sf_dir).doc_terms().select("term")
    return processors.search_validator(vals, "value", terms)


O_SEARCH_VALIDATOR = f"""
WITH {TOKS_CTE},
v(value) AS (VALUES {", ".join(f"('{v}')" for v in SEARCH_VALIDATE_VALUES)})
SELECT value,
       EXISTS(SELECT 1 FROM toks WHERE term = lower(value)) AS found
FROM v
"""


def q_select_features(spark, sf_dir):
    """Vocabulary pruning (CommonProcessor.selectFeatures,
    spark/mllib/CommonProcessor.scala:31-39): df>=5 ∧ df/N<=80% ∧ top-50."""
    from nlp4l_spark.ops import ml

    out = ml.select_features(
        _corpus(spark, sf_dir), min_df=5, max_df_percent=80.0, top_k=50
    )
    return out.select("term", F.col("df").cast("long").alias("df"))


O_SELECT_FEATURES = f"""
WITH {TOKS_CTE},
dfm AS (SELECT term, count(DISTINCT doc_id)::bigint AS df FROM toks GROUP BY term),
n AS (SELECT count(*)::double AS n FROM documents)
SELECT term, df FROM dfm, n
WHERE df >= 5 AND df / n.n <= 0.80
ORDER BY df DESC, term ASC LIMIT 50
"""


def q_label_map(spark, sf_dir):
    """selectLabelMap (CommonProcessor.scala:41-47): distinct labels ->
    dense ordered ids."""
    from nlp4l_spark.ops import ml

    out = ml.label_map(_docs(spark, sf_dir), "lang")
    return out.select("lang", F.col("label_id").cast("int").alias("label_id"))


O_LABEL_MAP = """
SELECT lang, (row_number() OVER (ORDER BY lang) - 1)::int AS label_id
FROM (SELECT DISTINCT lang FROM documents)
"""


def q_tf_vectors(spark, sf_dir):
    """TFIDF.tfVector/tfVectors (TFIDF.scala:37-54): dense per-doc TF rows
    (explicit zeros) over the sorted feature vocab, docs 0..29."""
    docs = _docs(spark, sf_dir).filter(F.col("doc_id") < 30).select("doc_id")
    return tfidf.tf_vectors(_corpus(spark, sf_dir), TFIDF_FEATURES, doc_ids=docs)


O_TF_VECTORS = f"""
WITH {TOKS_CTE},
v(term) AS (VALUES {", ".join(f"('{t}')" for t in sorted(TFIDF_FEATURES))}),
d AS (SELECT doc_id FROM documents WHERE doc_id < 30),
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY doc_id, term)
SELECT d.doc_id, v.term, coalesce(tf.tf, 0)::bigint AS tf
FROM d CROSS JOIN v
LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.term = v.term
"""

COUNT_WORDS_TEXT = "The quick brown Fox jumps over the lazy dog and the fox"


def q_count_words(spark, sf_dir):
    """WordCounts.countWords (WordCounts.scala:153-158): analyze a raw
    string, count tokens (query-side TF)."""
    return wordcounts.count_words(spark, COUNT_WORDS_TEXT)


O_COUNT_WORDS = f"""
WITH one AS (SELECT '{COUNT_WORDS_TEXT}' AS text),
t AS (SELECT unnest({TOK_SQL}) AS term FROM one)
SELECT term, count(*)::bigint AS cnt FROM t GROUP BY term
"""


def q_ltr_pairwise(spark, sf_dir):
    """RankingSVM pairwise difference transform
    (RankingSVMTrainer.scala:48-63) over the LTR feature frame, label =
    n_matched, restricted to the top-5 docs by bm25 within each
    (qid, n_matched) grade so pairs span label grades (deterministic)."""
    from pyspark.sql import Window

    from nlp4l_spark.ops import ltr

    feats = ltr.extract_features(_corpus(spark, sf_dir), LTR_QUERIES)
    w = Window.partitionBy("qid", "n_matched").orderBy(
        F.round("bm25", 6).desc(), F.col("doc_id").asc()
    )
    top = (
        feats.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 5)
        .select(
            "qid",
            "doc_id",
            "n_matched",
            F.round("bm25", 6).alias("bm25"),
            F.col("sum_tf").cast("long").alias("sum_tf"),
            F.col("dl").cast("long").alias("dl"),
        )
    )
    pairs = ltr.ranking_svm_pairwise(
        top,
        qid_col="qid",
        label_col="n_matched",
        feature_cols=["bm25", "sum_tf", "dl"],
        id_col="doc_id",
    )
    return pairs.select(
        "qid",
        "id_hi",
        "id_lo",
        "label",
        F.round("d_bm25", 6).alias("d_bm25"),
        F.col("d_sum_tf").cast("long").alias("d_sum_tf"),
        F.col("d_dl").cast("long").alias("d_dl"),
    )


O_LTR_PAIRWISE = f"""
WITH feats AS ({O_LTR_FEATURES}),
ranked AS (SELECT *, row_number() OVER (
             PARTITION BY qid, n_matched ORDER BY bm25 DESC, doc_id ASC) AS r
           FROM feats),
t AS (SELECT * FROM ranked WHERE r <= 5)
SELECT a.qid, a.doc_id AS id_hi, b.doc_id AS id_lo, 1 AS label,
       round(a.bm25 - b.bm25, 6) AS d_bm25,
       (a.sum_tf - b.sum_tf)::bigint AS d_sum_tf,
       (a.dl - b.dl)::bigint AS d_dl
FROM t a JOIN t b ON a.qid = b.qid AND a.n_matched > b.n_matched
"""


# --------------------------------------------------------------------- #
