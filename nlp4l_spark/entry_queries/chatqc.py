# Auto-split from the former monolithic entry_queries.py (round 4);
# cross-part names are imported explicitly so each query resolves
# from its own module globals exactly as in the monolith.
from __future__ import annotations

from nlp4l_spark.entry_queries.core import (  # noqa: F401
    BM25_K, BM25_TERMS, F, STANDARD_ANALYZER, TOKS_CTE, TOK_SQL, Window,
    _docs, _embeddings, _events, math, textqc,
)
from nlp4l_spark.entry_queries.search import (  # noqa: F401
    SPAN_A, SPAN_B, SPAN_SLOP, _bm25_corpus_stats, _bm25_per_doc,
    _bm25_score_col,
)
# Conversation-format QC (ops/chatqc.py) over a deterministic transcript
# view of the documents table: conv_id = doc_id // 4, turn_idx =
# doc_id % 4, roles alternate user/assistant with a deterministic
# corruption (doc_id % 37 == 3 flips the expected role), tool calls on
# doc_id % 11 in {5: search, 7: code}. The derivation is mirrored
# verbatim in CHAT_CTE so both engines see the identical transcript.
# --------------------------------------------------------------------- #
CHAT_CTE = """chat AS (
  SELECT doc_id // 4 AS conv_id,
         (doc_id % 4)::int AS turn_idx,
         CASE WHEN ((doc_id % 4) % 2
                    + CASE WHEN doc_id % 37 = 3 THEN 1 ELSE 0 END) % 2 = 0
              THEN 'user' ELSE 'assistant' END AS role,
         text,
         CASE WHEN doc_id % 11 = 5 THEN 'search'
              WHEN doc_id % 11 = 7 THEN 'code' END AS tool
  FROM documents)"""


def _chat_turns(spark, sf_dir):
    d = F.col("doc_id")
    base = (d % 4) % 2
    flip = F.when(d % 37 == 3, F.lit(1)).otherwise(F.lit(0))
    role = F.when((base + flip) % 2 == 0, F.lit("user")).otherwise(
        F.lit("assistant")
    )
    tool = (
        F.when(d % 11 == 5, F.lit("search"))
        .when(d % 11 == 7, F.lit("code"))
        .otherwise(F.lit(None).cast("string"))
    )
    return _docs(spark, sf_dir).select(
        F.floor(d / 4).alias("conv_id"),
        (d % 4).cast("int").alias("turn_idx"),
        role.alias("role"),
        "text",
        tool.alias("tool"),
    )


def q_chat_validate(spark, sf_dir):
    """Chat-SFT format validation (ops/chatqc.py::validate_conversations):
    per conversation, starts-with-user / ends-with-assistant /
    roles-alternate / empty-turn flags and the combined valid bit. One
    lag window pass + one groupBy(conv_id) — a single shuffle on the
    conversation key, no per-conv turn lists materialized."""
    from nlp4l_spark.ops.chatqc import validate_conversations

    return validate_conversations(_chat_turns(spark, sf_dir)).orderBy(
        "conv_id"
    )


O_CHAT_VALIDATE = f"""
WITH {CHAT_CTE},
t AS (SELECT *, lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
               AS prev FROM chat),
agg AS (SELECT conv_id,
               count(*) AS n_turns,
               min_by(role, turn_idx) = 'user' AS starts_with_user,
               max_by(role, turn_idx) = 'assistant' AS ends_with_assistant,
               count(*) FILTER (role = prev) = 0 AS roles_alternate,
               count(*) FILTER (trim(text) = '') > 0 AS has_empty_turn
        FROM t GROUP BY conv_id)
SELECT *, starts_with_user AND ends_with_assistant AND roles_alternate
          AND NOT has_empty_turn AS valid
FROM agg ORDER BY conv_id
"""


CHAT_FLAG_TERMS = ("slow", "dup")


def q_chat_flagged(spark, sf_dir):
    """Policy-term triage over assistant turns
    (ops/chatqc.py::flagged_turn_triage): per conversation, the count /
    rate / earliest turn_idx of assistant messages containing >= 1
    flagged term {CHAT_FLAG_TERMS} (the refusal/safety-phrase screening
    shape; the synthetic corpus stands the phrase list in with vocab
    terms). One filtered scan + one groupBy(conv_id)."""
    from nlp4l_spark.ops.chatqc import flagged_turn_triage

    return flagged_turn_triage(
        _chat_turns(spark, sf_dir), list(CHAT_FLAG_TERMS)
    )


O_CHAT_FLAGGED = f"""
WITH {CHAT_CTE},
a AS (SELECT conv_id, turn_idx,
        len(list_filter({TOK_SQL},
            x -> x IN ({", ".join(f"'{t}'" for t in CHAT_FLAG_TERMS)}))) > 0
          AS f
      FROM chat WHERE role = 'assistant')
SELECT conv_id, count(*)::bigint AS n_role_turns,
       sum(f::int)::bigint AS n_flagged,
       round(sum(f::int)::double / count(*), 6) AS flag_rate,
       min(CASE WHEN f THEN turn_idx END)::int AS first_flag_turn
FROM a GROUP BY conv_id ORDER BY conv_id
"""


def q_tool_usage(spark, sf_dir):
    """Agent-transcript tool stats (ops/chatqc.py::tool_usage): per tool,
    call count, distinct conversations, share of all tool calls. One
    filter + one groupBy; the normalizer is a broadcast scalar."""
    from nlp4l_spark.ops.chatqc import tool_usage

    return tool_usage(_chat_turns(spark, sf_dir)).orderBy(
        F.desc("n_calls"), F.asc("tool")
    )


O_TOOL_USAGE = f"""
WITH {CHAT_CTE},
calls AS (SELECT tool, conv_id FROM chat WHERE tool IS NOT NULL),
agg AS (SELECT tool, count(*) AS n_calls,
               count(DISTINCT conv_id) AS n_convs
        FROM calls GROUP BY tool)
SELECT tool, n_calls, n_convs,
       round(n_calls::double / (SELECT sum(n_calls) FROM agg), 6) AS share
FROM agg ORDER BY n_calls DESC, tool ASC
"""


def q_loop_detect(spark, sf_dir):
    """Agent-loop detection (ops/chatqc.py::detect_turn_loops): longest
    run of consecutive turns sharing a loop key per conversation — the
    stuck-agent retry check. The key here is the turn's first token
    (demo granularity so the fixture exhibits real runs; production use
    passes the default normalized-full-text key or a fingerprint). Runs
    via the run-id island trick: two conv-keyed window passes + one
    groupBy, a single shuffle, no per-conv turn lists."""
    from nlp4l_spark.ops.chatqc import detect_turn_loops

    key = F.split(F.lower(F.trim(F.col("text"))), r"\s+")[0]
    return detect_turn_loops(
        _chat_turns(spark, sf_dir), min_repeats=2, key=key
    ).orderBy("conv_id")


O_LOOP_DETECT = f"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx,
             (string_split_regex(lower(trim(text)), '\\s+'))[1] AS key
      FROM chat),
c AS (SELECT *, CASE WHEN lag(key) OVER w IS NULL
                       OR key != lag(key) OVER w THEN 1 ELSE 0 END AS chg
      FROM t WINDOW w AS (PARTITION BY conv_id ORDER BY turn_idx)),
r AS (SELECT *, sum(chg) OVER (PARTITION BY conv_id ORDER BY turn_idx
                               ROWS UNBOUNDED PRECEDING) AS run FROM c),
g AS (SELECT conv_id, run, count(*) AS run_len, min(key) AS key,
             min(turn_idx) AS start FROM r GROUP BY 1, 2),
b AS (SELECT conv_id, run_len AS max_run, key AS loop_key,
             run_len >= 2 AS has_loop,
             row_number() OVER (PARTITION BY conv_id
                                ORDER BY run_len DESC, start ASC) AS rn
      FROM g)
SELECT conv_id, max_run, loop_key, has_loop FROM b WHERE rn = 1
ORDER BY conv_id
"""


def q_role_profile(spark, sf_dir):
    """Per-role turn profile (ops/chatqc.py::role_profile): turn count,
    mean turn chars, share of all turns — the user/assistant balance
    check before SFT packing. One groupBy."""
    from nlp4l_spark.ops.chatqc import role_profile

    return role_profile(_chat_turns(spark, sf_dir)).orderBy("role")


O_ROLE_PROFILE = f"""
WITH {CHAT_CTE},
agg AS (SELECT role, count(*) AS n_turns,
               round(avg(length(text)), 6) AS avg_chars
        FROM chat GROUP BY role)
SELECT role, n_turns, avg_chars,
       round(n_turns::double / (SELECT sum(n_turns) FROM agg), 6) AS share
FROM agg ORDER BY role
"""


def q_token_fertility(spark, sf_dir):
    """Tokenizer fertility audit per language (the tokens-per-word /
    bytes-per-token sanity check run before choosing a tokenizer for a
    multilingual corpus): words = whitespace tokens, tokens = the BPE-ish
    alnum/punct-run proxy, fertility = tokens/words, bytes_per_token.
    One scan + one groupBy(lang); everything JVM expressions."""
    words = F.size(F.expr(r"regexp_extract_all(trim(text), '\\S+', 0)"))
    toks = F.size(
        F.expr(
            "regexp_extract_all(lower(text),"
            " '[a-z0-9]+|[^a-z0-9\\\\s]+', 0)"
        )
    )
    d = _docs(spark, sf_dir).select(
        "lang",
        words.alias("w"),
        toks.alias("t"),
        F.octet_length("text").alias("b"),
    )
    return (
        d.groupBy("lang")
        .agg(
            F.sum("w").alias("words"),
            F.sum("t").alias("tokens"),
            F.sum("b").alias("bytes"),
        )
        .select(
            "lang",
            "words",
            "tokens",
            F.round(F.col("tokens") / F.col("words"), 6).alias("fertility"),
            F.round(F.col("bytes") / F.col("tokens"), 6).alias(
                "bytes_per_token"
            ),
        )
        .orderBy("lang")
    )


O_TOKEN_FERTILITY = r"""
WITH d AS (SELECT lang,
             len(regexp_extract_all(trim(text), '\S+')) AS w,
             len(regexp_extract_all(lower(text), '[a-z0-9]+|[^a-z0-9\s]+')) AS t,
             strlen(text) AS b
           FROM documents)
SELECT lang, sum(w)::bigint AS words, sum(t)::bigint AS tokens,
       round(sum(t)::double / sum(w), 6) AS fertility,
       round(sum(b)::double / sum(t), 6) AS bytes_per_token
FROM d GROUP BY lang ORDER BY lang
"""


def q_lexical_diversity(spark, sf_dir):
    """Lexical diversity per language (corpus-QC: low type-token ratio /
    hapax rate flags templated or looping text): types = distinct terms,
    tokens = total analyzed tokens, ttr = types/tokens, hapax_frac =
    share of types occurring once. One tokenize pass + a (lang, term)
    agg + a lang agg — two shuffles, both key-pruned."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    per_term = (
        _docs(spark, sf_dir)
        .select("lang", F.explode(toks).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count("*").alias("cf"))
    )
    return (
        per_term.groupBy("lang")
        .agg(
            F.count("*").alias("types"),
            F.sum("cf").alias("tokens"),
            F.count_if(F.col("cf") == 1).alias("hapax"),
        )
        .select(
            "lang",
            "types",
            "tokens",
            F.round(F.col("types").cast("double") / F.col("tokens"), 6).alias(
                "ttr"
            ),
            F.round(F.col("hapax").cast("double") / F.col("types"), 6).alias(
                "hapax_frac"
            ),
        )
        .orderBy("lang")
    )


O_LEXICAL_DIVERSITY = f"""
WITH t AS (SELECT lang, unnest({TOK_SQL}) AS term FROM documents),
pt AS (SELECT lang, term, count(*)::bigint AS cf FROM t GROUP BY 1, 2),
ag AS (SELECT lang, count(*)::bigint AS types, sum(cf)::bigint AS tokens,
              count(*) FILTER (cf = 1)::bigint AS hapax
       FROM pt GROUP BY lang)
SELECT lang, types, tokens,
       round(types::double / tokens, 6) AS ttr,
       round(hapax::double / types, 6) AS hapax_frac
FROM ag ORDER BY lang
"""


# --------------------------------------------------------------------- #
# Text-statistics extensions (round 3): readability, per-doc token
# entropy, term burstiness, SpanFirstQuery parity, Jaccard top-k
# --------------------------------------------------------------------- #
SPANF_TERM, SPANF_END = "merge", 8
JACCARD_DOC, JACCARD_K = 7, 10
BURST_TOPN = 20


def q_readability(spark, sf_dir):
    """Flesch reading ease per document (pipeline QC: very low scores
    flag boilerplate/code, very high flag trivial text). words =
    [a-z]+ runs of the lowered text, sentences = [.!?]+ runs (min 1),
    syllables = vowel-group count per word (min 1 — the standard
    heuristic). One codegen scan, no shuffle at all."""
    words = F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
    n_words = F.size(words)
    n_sents = F.greatest(
        F.size(F.expr("regexp_extract_all(text, '[.!?]+', 0)")), F.lit(1)
    )
    n_syll = F.aggregate(
        F.transform(
            words,
            lambda w: F.greatest(
                F.size(F.regexp_extract_all(w, F.lit("[aeiouy]+"), F.lit(0))),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / n_sents)
        - F.lit(84.6) * (n_syll.cast("double") / n_words)
    )
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            n_sents.cast("long").alias("n_sents"),
            n_words.cast("long").alias("n_words"),
            n_syll.cast("long").alias("n_syll"),
            F.round(flesch, 6).alias("flesch"),
        )
        .filter(F.col("n_words") > 0)
    )


O_READABILITY = """
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z]+') AS words,
                  greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS n_sents
           FROM documents),
s AS (SELECT doc_id, n_sents, len(words) AS n_words,
             list_sum(list_transform(words,
               x -> greatest(len(regexp_extract_all(x, '[aeiouy]+')), 1))) AS n_syll
      FROM w WHERE len(words) > 0)
SELECT doc_id, n_sents::bigint AS n_sents, n_words::bigint AS n_words,
       n_syll::bigint AS n_syll,
       round(206.835 - 1.015 * (n_words::double / n_sents)
                     - 84.6 * (n_syll::double / n_words), 6) AS flesch
FROM s
"""


def q_token_entropy(spark, sf_dir):
    """Per-document unigram entropy over analyzed tokens (templated /
    looping text scores low): H = ln(dl) - (Σ tf·ln tf)/dl, normalized
    by ln(dl). One tokenize pass + one (doc, term) agg + one doc agg."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    agg = tf.groupBy("doc_id").agg(
        F.sum("tf").alias("dl"),
        F.sum(F.col("tf").cast("double") * F.log(F.col("tf"))).alias("s"),
    )
    dl = F.col("dl").cast("double")
    entropy = F.log(dl) - F.col("s") / dl
    return (
        agg.filter(F.col("dl") >= 2)
        .select(
            "doc_id",
            F.col("dl").cast("long").alias("dl"),
            F.round(entropy, 6).alias("entropy"),
            F.round(entropy / F.log(dl), 6).alias("norm_entropy"),
        )
    )


O_TOKEN_ENTROPY = f"""
WITH {TOKS_CTE},
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY 1, 2),
ag AS (SELECT doc_id, sum(tf)::bigint AS dl,
              sum(tf::double * ln(tf)) AS s
       FROM tf GROUP BY doc_id)
SELECT doc_id, dl,
       round(ln(dl::double) - s / dl::double, 6) AS entropy,
       round((ln(dl::double) - s / dl::double) / ln(dl::double), 6)
         AS norm_entropy
FROM ag WHERE dl >= 2
"""


def q_ngram_novelty(spark, sf_dir):
    """Per-doc 3-gram novelty (textqc.ngram_novelty): fraction of the
    doc's distinct analyzer-token trigrams first seen (min doc_id) at
    this doc — the batch-diversity / memorization proxy. One tokenize
    scan, one gram-keyed min agg, one join-back, one doc agg."""
    return textqc.ngram_novelty(
        _docs(spark, sf_dir), "text", "doc_id", n=3, analyzer=STANDARD_ANALYZER
    )


O_NGRAM_NOVELTY = f"""
WITH t AS (SELECT doc_id, {TOK_SQL} AS at FROM documents),
g AS (SELECT doc_id, unnest(list_distinct(list_transform(
           range(1, len(at) - 1),
           i -> at[i] || ' ' || at[i + 1] || ' ' || at[i + 2]))) AS gram
      FROM t WHERE len(at) >= 3),
f AS (SELECT gram, min(doc_id) AS first FROM g GROUP BY 1)
SELECT doc_id, count(*)::bigint AS n_grams,
       round(sum((first = doc_id)::int)::double / count(*), 6) AS novelty
FROM g JOIN f USING (gram)
GROUP BY doc_id ORDER BY doc_id ASC
"""


def q_burstiness(spark, sf_dir):
    """Church-Gale burstiness for the top-{BURST_TOPN} corpus terms:
    variance-to-mean ratio of tf over the docs CONTAINING the term
    (content words are bursty, function words Poisson-like). Plan: one
    (doc, term) partial agg then a term agg — two map-side-combined
    shuffles; top-k is TakeOrdered."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    tf = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    per_term = tf.groupBy("term").agg(
        F.count("*").alias("df"),
        F.sum("tf").alias("cf"),
        F.sum(F.col("tf") * F.col("tf")).alias("s2"),
    )
    dfd = F.col("df").cast("double")
    mean = F.col("cf").cast("double") / dfd
    vmr = (F.col("s2").cast("double") / dfd - mean * mean) / mean
    return (
        per_term.select(
            "term",
            F.col("df").cast("long").alias("df"),
            F.col("cf").cast("long").alias("cf"),
            F.round(mean, 6).alias("mean_tf"),
            F.round(vmr, 6).alias("vmr"),
        )
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(BURST_TOPN)
    )


O_BURSTINESS = f"""
WITH {TOKS_CTE},
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY 1, 2),
pt AS (SELECT term, count(*)::bigint AS df, sum(tf)::bigint AS cf,
              sum(tf * tf)::bigint AS s2
       FROM tf GROUP BY term)
SELECT term, df, cf,
       round(cf::double / df::double, 6) AS mean_tf,
       round((s2::double / df::double
              - (cf::double / df::double) * (cf::double / df::double))
             / (cf::double / df::double), 6) AS vmr
FROM pt ORDER BY cf DESC, term ASC LIMIT {BURST_TOPN}
"""


def q_span_first(spark, sf_dir):
    """Lucene SpanFirstQuery: docs where '{SPANF_TERM}' occurs within the
    first {SPANF_END} full-stream token positions (stopword holes
    preserved — the span_near contract). Index path:
    Searcher.search_span_first (term_vectors positions), identity-tested
    in tests/test_boolean.py."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    pos = F.filter(
        F.transform(
            ft, lambda x, i: F.when(x == SPANF_TERM, i).otherwise(F.lit(None))
        ),
        lambda v: v.isNotNull(),
    )
    in_win = F.filter(pos, lambda p: p < F.lit(SPANF_END))
    return (
        _docs(spark, sf_dir)
        .select(
            "doc_id",
            F.size(in_win).cast("long").alias("n_first"),
            F.array_min(in_win).cast("long").alias("first_pos"),
        )
        .filter(F.col("n_first") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_FIRST = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
             list_filter(range(1, len(ft) + 1),
                         i -> ft[i] = '{SPANF_TERM}' AND i <= {SPANF_END}) AS pw
      FROM t)
SELECT doc_id, len(pw)::bigint AS n_first,
       (list_min(pw) - 1)::bigint AS first_pos
FROM p WHERE len(pw) > 0 ORDER BY doc_id ASC LIMIT 20
"""


def q_jaccard_topk(spark, sf_dir):
    """Top-{JACCARD_K} documents by token-SET Jaccard similarity to doc
    {JACCARD_DOC} (near-dup triage / related-docs). Plan: the query
    doc's term set is a broadcast semi-join side (one doc's vocabulary,
    bounded); the corpus side is one distinct + two key-pruned aggs —
    never an all-pairs join. Rank key = 6dp-rounded jaccard, doc_id asc."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    dt = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
        .distinct()
    )
    qterms = dt.filter(F.col("doc_id") == JACCARD_DOC).select("term")
    qn = qterms.count()  # one doc's vocabulary — bounded scalar
    types = dt.groupBy("doc_id").agg(F.count("*").alias("types"))
    inter = (
        dt.filter(F.col("doc_id") != JACCARD_DOC)
        .join(F.broadcast(qterms), "term")
        .groupBy("doc_id")
        .agg(F.count("*").alias("inter"))
    )
    jac = F.col("inter").cast("double") / (
        F.col("types") + F.lit(qn) - F.col("inter")
    )
    return (
        inter.join(types, "doc_id")
        .select(
            "doc_id",
            F.col("inter").cast("long").alias("inter"),
            F.col("types").cast("long").alias("types"),
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy(F.desc("jaccard"), F.asc("doc_id"))
        .limit(JACCARD_K)
    )


O_JACCARD_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT DISTINCT doc_id, term FROM toks),
q AS (SELECT term FROM dt WHERE doc_id = {JACCARD_DOC}),
qn AS (SELECT count(*)::bigint AS qn FROM q),
ty AS (SELECT doc_id, count(*)::bigint AS types FROM dt GROUP BY doc_id),
it AS (SELECT doc_id, count(*)::bigint AS inter
       FROM dt JOIN q USING (term)
       WHERE doc_id != {JACCARD_DOC} GROUP BY doc_id)
SELECT doc_id, inter, types,
       round(inter::double / (types + qn - inter), 6) AS jaccard
FROM it JOIN ty USING (doc_id), qn
ORDER BY jaccard DESC, doc_id ASC LIMIT {JACCARD_K}
"""


def q_conversation_stats(spark, sf_dir):
    """Per-conversation profile of the transcripts payload (the triage
    table an SFT pipeline reads before filtering): turn count, user-turn
    count, role-alternation rate over adjacent pairs, mean tokens per
    turn. One lag window + one conv agg — a single keyed shuffle."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev = F.lag("role").over(w)
    t = (
        _chat_turns(spark, sf_dir)
        .select("conv_id", "turn_idx", "role", F.size(ft).alias("toks"))
        .withColumn(
            "chg",
            F.when(prev.isNull(), F.lit(None)).otherwise(
                (F.col("role") != prev).cast("int")
            ),
        )
    )
    agg = t.groupBy("conv_id").agg(
        F.count("*").alias("n_turns"),
        F.count_if(F.col("role") == "user").alias("n_user"),
        F.sum("chg").alias("alt"),
        F.sum("toks").alias("total_toks"),
    )
    return (
        agg.filter(F.col("n_turns") > 1)
        .select(
            F.col("conv_id").cast("long").alias("conv_id"),
            F.col("n_turns").cast("long").alias("n_turns"),
            F.col("n_user").cast("long").alias("n_user"),
            F.round(
                F.col("alt").cast("double") / (F.col("n_turns") - 1), 6
            ).alias("alternation_rate"),
            F.round(
                F.col("total_toks").cast("double") / F.col("n_turns"), 6
            ).alias("mean_turn_tokens"),
        )
        .orderBy("conv_id")
    )


O_CONVERSATION_STATS = f"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx, role,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks,
             lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev
      FROM chat),
a AS (SELECT conv_id, count(*)::bigint AS n_turns,
             count(*) FILTER (role = 'user')::bigint AS n_user,
             sum(CASE WHEN prev IS NULL THEN NULL
                      WHEN role != prev THEN 1 ELSE 0 END) AS alt,
             sum(toks)::bigint AS total_toks
      FROM t GROUP BY conv_id)
SELECT conv_id::bigint AS conv_id, n_turns, n_user,
       round(alt::double / (n_turns - 1), 6) AS alternation_rate,
       round(total_toks::double / n_turns, 6) AS mean_turn_tokens
FROM a WHERE n_turns > 1 ORDER BY conv_id
"""


def q_retention_cohorts(spark, sf_dir):
    """Weekly retention cohorts over the events table (the engagement
    report every analytics stack ships): cohort = user's first active
    epoch-week, n_users retained per (cohort_week, week_offset). Plan:
    one user agg + one user join + one distinct agg — three keyed
    shuffles, no window. Week = floor(epoch_seconds / 604800) on both
    engines (the floor(epoch(ts)) parity convention)."""
    sec = F.col("ts").cast("timestamp").cast("long")
    ev = _events(spark, sf_dir).select(
        "user_id",
        F.floor(sec / 604800).cast("long").alias("week"),
    )
    first = ev.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        ev.join(first, "user_id")
        .select(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count("*").alias("n_users"))
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_users").cast("long").alias("n_users"),
        )
        .orderBy("cohort_week", "week_offset")
    )


O_RETENTION_COHORTS = """
WITH e AS (SELECT user_id,
                  floor(floor(epoch(ts))::bigint / 604800)::bigint AS week
           FROM events),
f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
d AS (SELECT DISTINCT cohort_week, week - cohort_week AS week_offset,
                      user_id
      FROM e JOIN f USING (user_id))
SELECT cohort_week, week_offset, count(*)::bigint AS n_users
FROM d GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_date_histogram(spark, sf_dir):
    """Elasticsearch date_histogram aggregation with a per-bucket terms
    sub-aggregation + metric (the kibana-dashboard staple): events
    bucketed by day × event_type with doc count and sum(value). Day =
    floor(epoch_seconds / 86400) (the retention_cohorts epoch-bucket
    parity convention — no timezone/date-type drift between engines).
    The metric sums round(value*100) as exact integer cents (value is
    2-decimal by construction) so the aggregate is order-independent —
    a distributed double sum would be ulp-unstable at hash granularity.
    One hash-keyed groupBy; at 100 TB the (day, type) key space stays
    tiny so the final agg is safe."""
    sec = F.col("ts").cast("timestamp").cast("long")
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        _events(spark, sf_dir)
        .select(
            F.floor(sec / 86400).cast("long").alias("day"),
            "event_type",
            cents.alias("_c"),
        )
        .groupBy("day", "event_type")
        .agg(
            F.count("*").cast("long").alias("cnt"),
            (F.sum("_c").cast("double") / 100.0).alias("sum_value"),
        )
        .orderBy("day", "event_type")
    )


O_DATE_HISTOGRAM = """
SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
       event_type,
       count(*)::bigint AS cnt,
       sum(round(value * 100)::bigint)::double / 100.0 AS sum_value
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_span_not(spark, sf_dir):
    """Lucene SpanNotQuery: '{SPAN_A}' positions with NO '{SPAN_B}'
    within {SPAN_SLOP} intervening tokens either side; docs with at
    least one surviving position, n_clean = survivor count. Index path:
    Searcher.search_span_not (term_vectors), identity-tested in
    tests/test_boolean.py. Full-stream position contract as span_near."""
    win = SPAN_SLOP + 1
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def positions(term):
        return F.filter(
            F.transform(
                ft, lambda x, i: F.when(x == term, i).otherwise(F.lit(None))
            ),
            lambda v: v.isNotNull(),
        )

    pa, pb = positions(SPAN_A), positions(SPAN_B)
    n_clean = F.size(
        F.filter(
            pa, lambda p0: ~F.exists(pb, lambda p1: F.abs(p1 - p0) <= win)
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_clean.cast("long").alias("n_clean"))
        .filter(F.col("n_clean") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_NOT = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_A}') AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_B}') AS pb
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb, p1 -> abs(p1 - p0) <= {SPAN_SLOP + 1})) = 0
        ))::bigint AS n_clean
      FROM p)
SELECT doc_id, n_clean FROM s WHERE n_clean > 0 ORDER BY doc_id ASC LIMIT 20
"""


SPAN_OR_ALTS = ("merge", "vector")


def q_span_or(spark, sf_dir):
    """Lucene SpanOrQuery under SpanNearQuery (the canonical SpanOr use):
    near(or({SPAN_OR_ALTS}), '{SPAN_B}', slop={SPAN_SLOP}, unordered).
    The OR clause's positions are the union of its members'; each needs a
    '{SPAN_B}' partner within the window. Docs with >= 1 qualifying
    position, n_spans = qualifying count. Index path:
    Searcher.search_span_or_near (term_vectors), identity-tested in
    tests/test_boolean.py. Full-stream position contract as span_near."""
    win = SPAN_SLOP + 1
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def positions(term):
        return F.filter(
            F.transform(
                ft, lambda x, i: F.when(x == term, i).otherwise(F.lit(None))
            ),
            lambda v: v.isNotNull(),
        )

    pa = F.array_sort(
        F.concat(*[positions(t) for t in SPAN_OR_ALTS])
    )
    pb = positions(SPAN_B)
    n_spans = F.size(
        F.filter(
            pa,
            lambda p0: F.exists(
                pb, lambda p1: (p1 != p0) & (F.abs(p1 - p0) <= win)
            ),
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_spans.cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_OR = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_sort(list_concat(
          list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_OR_ALTS[0]}'),
          list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_OR_ALTS[1]}')
        )) AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPAN_B}') AS pb
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb, p1 -> p1 <> p0 AND abs(p1 - p0) <= {SPAN_SLOP + 1})) > 0
        ))::bigint AS n_spans
      FROM p)
SELECT doc_id, n_spans FROM s WHERE n_spans > 0 ORDER BY doc_id ASC LIMIT 20
"""


SPANC_BIG = ("merge", "join")
SPANC_LITTLE = "data"
SPANC_SLOP = 4


def _spanc_frames():
    """Shared position columns for the containing/within corpus twins:
    (pa, pb, pc) full-stream positions of big-start, big-end, little."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def positions(term):
        return F.filter(
            F.transform(
                ft, lambda x, i: F.when(x == term, i).otherwise(F.lit(None))
            ),
            lambda v: v.isNotNull(),
        )

    return positions(SPANC_BIG[0]), positions(SPANC_BIG[1]), positions(
        SPANC_LITTLE
    )


def q_span_containing(spark, sf_dir):
    """Lucene SpanContainingQuery, corpus path (index twin
    Searcher.search_span_containing): big spans = ordered
    ('{SPANC_BIG[0]}' .. '{SPANC_BIG[1]}') with <= {SPANC_SLOP}
    intervening tokens; an anchor qualifies iff SOME such span contains
    a '{SPANC_LITTLE}' position. Docs with >= 1 qualifying anchor,
    n_spans = anchor count, docID asc (constant-score span-family
    contract). One HOF scan."""
    win = SPANC_SLOP + 1
    pa, pb, pc = _spanc_frames()
    n_spans = F.size(
        F.filter(
            pa,
            lambda p0: F.exists(
                pb,
                lambda p1: (p1 > p0)
                & (p1 - p0 <= win)
                & F.exists(pc, lambda q: (q >= p0) & (q <= p1)),
            ),
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_spans.cast("long").alias("n_spans"))
        .filter(F.col("n_spans") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_CONTAINING = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPANC_BIG[0]}') AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPANC_BIG[1]}') AS pb,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPANC_LITTLE}') AS pc
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pa, p0 ->
          len(list_filter(pb, p1 -> p1 > p0 AND p1 - p0 <= {SPANC_SLOP + 1}
              AND len(list_filter(pc, q -> q >= p0 AND q <= p1)) > 0)) > 0
        ))::bigint AS n_spans
      FROM p)
SELECT doc_id, n_spans FROM s WHERE n_spans > 0 ORDER BY doc_id ASC LIMIT 20
"""


def q_span_within(spark, sf_dir):
    """Lucene SpanWithinQuery, corpus path (index twin
    Searcher.search_span_within) — the dual of span_containing:
    '{SPANC_LITTLE}' positions sitting INSIDE some ordered
    ('{SPANC_BIG[0]}' .. '{SPANC_BIG[1]}') span with <= {SPANC_SLOP}
    intervening tokens. n_within = qualifying little positions, docID
    asc. One HOF scan."""
    win = SPANC_SLOP + 1
    pa, pb, pc = _spanc_frames()
    n_within = F.size(
        F.filter(
            pc,
            lambda q: F.exists(
                pa,
                lambda p0: (q >= p0)
                & F.exists(
                    pb,
                    lambda p1: (p1 > p0) & (p1 - p0 <= win) & (q <= p1),
                ),
            ),
        )
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", n_within.cast("long").alias("n_within"))
        .filter(F.col("n_within") > 0)
        .orderBy(F.asc("doc_id"))
        .limit(20)
    )


O_SPAN_WITHIN = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
p AS (SELECT doc_id,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPANC_BIG[0]}') AS pa,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPANC_BIG[1]}') AS pb,
        list_filter(range(1, len(ft) + 1), i -> ft[i] = '{SPANC_LITTLE}') AS pc
      FROM t),
s AS (SELECT doc_id,
        len(list_filter(pc, q ->
          len(list_filter(pa, p0 -> q >= p0 AND
            len(list_filter(pb, p1 -> p1 > p0 AND p1 - p0 <= {SPANC_SLOP + 1}
                AND q <= p1)) > 0)) > 0
        ))::bigint AS n_within
      FROM p)
SELECT doc_id, n_within FROM s WHERE n_within > 0 ORDER BY doc_id ASC LIMIT 20
"""


BOOST_NEG = "slow"
BOOST_FACTOR = 0.3


def q_boosting_topk(spark, sf_dir):
    """Lucene queries-module BoostingQuery / ES `boosting` query top-k,
    corpus path (index twin Searcher.search_boosting): BM25 on
    {BM25_TERMS}, score × {BOOST_FACTOR} for docs also containing
    '{BOOST_NEG}' — demotion without exclusion (contrast bm25_not_topk's
    MUST_NOT). Same one-tokenize two-pass corpus shape as bm25_topk; the
    demotion is a map-membership flag on the same scan."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    base = _bm25_score_col(BM25_TERMS, n, avgdl, dfs)
    score = F.when(
        F.col("m")[BOOST_NEG].isNotNull(), base * F.lit(BOOST_FACTOR)
    ).otherwise(base)
    return (
        per_doc.filter(
            F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull()
        )
        .withColumn("s", score)
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(BM25_K)
        .select("doc_id", F.round("s", 6).alias("score"))
    )


O_BOOSTING_TOPK = f"""
WITH {TOKS_CTE},
dt AS (SELECT doc_id, term, count(*)::double AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT doc_id, count(*)::double AS dl FROM toks GROUP BY 1),
st AS (SELECT count(*)::double AS n,
              (SELECT count(*) FROM toks)::double / count(*) AS avgdl FROM dl),
qt AS (SELECT unnest({BM25_TERMS!r}) AS term),
dfm AS (SELECT term, count(*)::double AS df FROM dt JOIN qt USING (term) GROUP BY 1),
neg AS (SELECT DISTINCT doc_id FROM dt WHERE term = '{BOOST_NEG}'),
sc AS (SELECT dt.doc_id,
              sum(ln(1 + (n - df + 0.5) / (df + 0.5))
                  * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))) AS s
       FROM dt JOIN dfm USING (term) JOIN dl USING (doc_id) CROSS JOIN st
       GROUP BY dt.doc_id),
b AS (SELECT sc.doc_id,
             CASE WHEN neg.doc_id IS NOT NULL
                  THEN s * {BOOST_FACTOR!r} ELSE s END AS s
      FROM sc LEFT JOIN neg ON sc.doc_id = neg.doc_id)
SELECT doc_id, round(s, 6) AS score FROM b
ORDER BY s DESC, doc_id ASC LIMIT {BM25_K}
"""


def q_explain_score(spark, sf_dir):
    """Lucene IndexSearcher.explain parity as a query: the per-term BM25
    decomposition (tf, df, idf, tf_norm, term score) for the TOP-1 doc of
    '{BM25_QUERY}' — the numbers Searcher.explain returns (index path,
    identity-tested in tests/test_boolean.py). Same one-tokenize two-pass
    corpus shape as q_bm25_topk, plus a bounded top-1 collect; the detail
    rows are one narrow scan of the single doc's tf map."""
    per_doc = _bm25_per_doc(spark, sf_dir)
    n, avgdl, dfs = _bm25_corpus_stats(per_doc, BM25_TERMS)
    top = (
        per_doc.withColumn("s", _bm25_score_col(BM25_TERMS, n, avgdl, dfs))
        .filter(F.greatest(*[F.col("m")[t] for t in BM25_TERMS]).isNotNull())
        .orderBy(F.desc("s"), F.asc("doc_id"))
        .limit(1)
        .select("doc_id")
        .collect()
    )
    top_id = int(top[0]["doc_id"])
    qt = F.explode(F.array(*[F.lit(t) for t in BM25_TERMS])).alias("term")
    d = per_doc.filter(F.col("doc_id") == top_id).select(
        "doc_id", "dl", "m", qt
    )
    df_map = F.create_map(
        *[c for t in BM25_TERMS for c in (F.lit(t), F.lit(dfs[t]))]
    )
    tf = F.col("m")[F.col("term")].cast("double")
    dfc = F.element_at(df_map, F.col("term"))
    idf_c = F.log(F.lit(1.0) + (F.lit(float(n)) - dfc + 0.5) / (dfc + 0.5))
    tf_norm = (
        tf
        * F.lit(2.2)
        / (tf + F.lit(1.2) * (F.lit(0.25) + F.lit(0.75) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        d.filter(tf.isNotNull())
        .select(
            "doc_id",
            "term",
            tf.alias("tf"),
            dfc.cast("long").alias("df"),
            F.round(idf_c, 6).alias("idf"),
            F.round(tf_norm, 6).alias("tf_norm"),
            F.round(idf_c * tf_norm, 6).alias("score"),
        )
        .orderBy(F.asc("term"))
    )


O_EXPLAIN_SCORE = f"""
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
top AS (SELECT doc_id FROM sc ORDER BY s DESC, doc_id ASC LIMIT 1)
SELECT dt.doc_id, dt.term, dt.tf,
       df::bigint AS df,
       round(ln(1 + (n - df + 0.5) / (df + 0.5)), 6) AS idf,
       round(tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS tf_norm,
       round(ln(1 + (n - df + 0.5) / (df + 0.5))
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 6) AS score
FROM dt JOIN top USING (doc_id) JOIN dfm USING (term)
     JOIN dl ON dl.doc_id = dt.doc_id CROSS JOIN st
ORDER BY dt.term ASC
"""


SHUFFLE_SEED = 20260818


def q_shuffle_export(spark, sf_dir):
    """Deterministic seeded global shuffle for training-data export (the
    last step of every LLM pre-training pipeline: break source/temporal
    locality before the data loader sees the corpus). Shuffle key =
    md5(doc_id || ':' || seed) — engine-independent, stable across reruns
    and cluster sizes (unlike rand(), whose draw depends on partition
    layout), and uniformly distributed so the export's range partitioner
    balances at any scale. Emits the shuffled position for the first 50
    docs of the ordering. At 100 TB this is ONE range-partitioned sort by
    a precomputed uniform key: no skew by construction, and writers
    stream each output partition without a further pass."""
    key = F.md5(F.concat_ws(":", F.col("doc_id"), F.lit(str(SHUFFLE_SEED))))
    head = (
        _docs(spark, sf_dir)
        .select("doc_id", key.alias("skey"))
        .orderBy(F.asc("skey"))
        .limit(50)  # TakeOrdered — distributed top-k, no global sort
    )
    # the numbering window runs on the 50 surviving rows only
    w = Window.orderBy(F.asc("skey"))
    return (
        head.withColumn("pos", F.row_number().over(w).cast("long"))
        .select("pos", "doc_id", "skey")
        .orderBy("pos")
    )


O_SHUFFLE_EXPORT = f"""
WITH k AS (SELECT doc_id, md5(doc_id || ':' || '{SHUFFLE_SEED}') AS skey
           FROM documents),
r AS (SELECT doc_id, skey,
             row_number() OVER (ORDER BY skey ASC)::bigint AS pos
      FROM k)
SELECT pos, doc_id, skey FROM r WHERE pos <= 50 ORDER BY pos
"""


CONV_DUP_PROMPTS = [
    "how do i sort a table by key",
    "explain the merge join plan",
    "why is my query slow",
]


def q_conv_dedup(spark, sf_dir):
    """Conversation-level PROMPT dedup (SFT triage: the same user-prompt
    sequence collected twice should train once, whatever the assistant
    said): signature = md5 of the conversation's user turns joined in
    turn order; emit duplicated signatures with group size and the
    keeper (min conv_id). The corpus carries no natural conv-level dups,
    so every 5th conversation's user turns are deterministically
    overridden with one of two canned prompts — the
    dedup then finds exactly those planted groups. Plan: one
    conv-keyed agg (sort_array keeps turn order under collect_list's
    nondeterminism) + one signature-keyed agg — two hash shuffles, no
    row amplification, driver state zero."""
    t = _chat_turns(spark, sf_dir)
    planted = F.element_at(
        F.array(*[F.lit(p) for p in CONV_DUP_PROMPTS]),
        (F.col("conv_id") % 2 + 1).cast("int"),
    )
    t = t.withColumn(
        "text",
        F.when(
            (F.col("conv_id") % 5 == 1) & (F.col("role") == "user"),
            planted,
        ).otherwise(F.col("text")),
    )
    sig = F.md5(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("turn_idx", "text"))
                ),
                lambda s: s["text"],
            ),
            " | ",
        )
    )
    per_conv = (
        t.filter(F.col("role") == "user")
        .groupBy("conv_id")
        .agg(sig.alias("sig"))
    )
    return (
        per_conv.groupBy("sig")
        .agg(
            F.count("*").alias("n_convs"),
            F.min("conv_id").alias("keeper"),
        )
        .filter(F.col("n_convs") > 1)
        .orderBy("sig")
    )


def _o_conv_dedup() -> str:
    def q(s: str) -> str:
        return s.replace("'", "''")

    whens = " ".join(
        f"WHEN {i} THEN '{q(p)}'" for i, p in enumerate(CONV_DUP_PROMPTS)
    )
    return f"""
WITH {CHAT_CTE},
t AS (SELECT conv_id, turn_idx, role,
             CASE WHEN conv_id % 5 = 1 AND role = 'user'
                  THEN CASE conv_id % 2 {whens} END
                  ELSE text END AS text
      FROM chat),
pc AS (SELECT conv_id,
              md5(string_agg(text, ' | ' ORDER BY turn_idx)) AS sig
       FROM t WHERE role = 'user' GROUP BY conv_id)
SELECT sig, count(*)::bigint AS n_convs, min(conv_id) AS keeper
FROM pc GROUP BY sig HAVING count(*) > 1 ORDER BY sig
"""


O_CONV_DEDUP = _o_conv_dedup()


TERM_BROWSE_SEEK = "mer"
TERM_BROWSE_N = 30


def q_term_browse(spark, sf_dir):
    """Lucene TermsEnum.seekCeil + next() paging (the reference's Terms
    walk, Terms.scala:30-60): the first {TERM_BROWSE_N} terms >=
    '{TERM_BROWSE_SEEK}' in term order with (df, cf). Index path:
    Searcher.browse_terms — a pushed >= range filter on the sorted term
    dictionary (min/max file skipping = seekCeil). Corpus twin: one
    tokenize + (term) agg."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term") >= TERM_BROWSE_SEEK)
        .groupBy("term")
        .agg(
            F.count_distinct("doc_id").alias("df"),
            F.count("*").alias("cf"),
        )
        .orderBy(F.asc("term"))
        .limit(TERM_BROWSE_N)
    )


O_TERM_BROWSE = f"""
WITH {TOKS_CTE}
SELECT term, count(DISTINCT doc_id)::bigint AS df, count(*)::bigint AS cf
FROM toks WHERE term >= '{TERM_BROWSE_SEEK}'
GROUP BY term ORDER BY term ASC LIMIT {TERM_BROWSE_N}
"""


TOP_TFIDF_K = 3


def q_top_tfidf_terms(spark, sf_dir):
    """Per-doc top-{TOP_TFIDF_K} terms by tf·idf (keyword-extraction
    lite; idf = ln(N/df)): rank key = 6dp-rounded weight then term asc.
    Plan: (doc,term) agg + term df agg + broadcast scalar N + a
    per-doc window that compiles to WindowGroupLimit (rank pushed
    below the sort)."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir)
    n = d.count()
    tf = (
        d.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count("*").alias("df"))
    w = F.round(
        F.col("tf").cast("double") * F.log(F.lit(float(n)) / F.col("df")), 6
    )
    ranked = (
        tf.join(df_, "term")
        .select("doc_id", "term", w.alias("weight"))
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(
                    F.desc("weight"), F.asc("term")
                )
            ),
        )
        .filter(F.col("rank") <= TOP_TFIDF_K)
    )
    return ranked.select(
        "doc_id", F.col("rank").cast("long").alias("rank"), "term", "weight"
    )


O_TOP_TFIDF_TERMS = f"""
WITH {TOKS_CTE},
tf AS (SELECT doc_id, term, count(*)::bigint AS tf FROM toks GROUP BY 1, 2),
dfm AS (SELECT term, count(*)::bigint AS df FROM tf GROUP BY term),
n AS (SELECT count(*)::double AS n FROM documents),
w AS (SELECT doc_id, term,
             round(tf::double * ln(n / df), 6) AS weight,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY round(tf::double * ln(n / df), 6) DESC,
                                         term ASC) AS rank
      FROM tf JOIN dfm USING (term), n)
SELECT doc_id, rank::bigint AS rank, term, weight
FROM w WHERE rank <= {TOP_TFIDF_K}
"""


OOV_VOCAB = 1000


def q_oov_rate(spark, sf_dir):
    """Out-of-vocabulary rate per doc against the top-{OOV_VOCAB}
    corpus terms by cf (the vocab-coverage audit run before fixing a
    tokenizer vocab): oov_frac = tokens outside the vocab / dl. Plan:
    the vocab is a broadcast LEFT-join side (bounded top-k); the corpus
    tokenizes once."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    t = _docs(spark, sf_dir).select("doc_id", F.explode(toks).alias("term"))
    vocab = (
        t.groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.desc("cf"), F.asc("term"))
        .limit(OOV_VOCAB)
        .select("term", F.lit(1).alias("_inv"))
    )
    agg = (
        t.join(F.broadcast(vocab), "term", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("dl"),
            F.count_if(F.col("_inv").isNull()).alias("oov"),
        )
    )
    return agg.select(
        "doc_id",
        F.col("dl").cast("long").alias("dl"),
        F.col("oov").cast("long").alias("oov"),
        F.round(F.col("oov").cast("double") / F.col("dl"), 6).alias(
            "oov_frac"
        ),
    )


O_OOV_RATE = f"""
WITH {TOKS_CTE},
cf AS (SELECT term, count(*)::bigint AS cf FROM toks GROUP BY term),
v AS (SELECT term FROM cf ORDER BY cf DESC, term ASC LIMIT {OOV_VOCAB}),
j AS (SELECT t.doc_id, (v.term IS NULL)::int AS is_oov
      FROM toks t LEFT JOIN v ON t.term = v.term)
SELECT doc_id, count(*)::bigint AS dl, sum(is_oov)::bigint AS oov,
       round(sum(is_oov)::double / count(*), 6) AS oov_frac
FROM j GROUP BY doc_id
"""


HL_W = 10  # highlight window width (tokens)


def q_highlight(spark, sf_dir):
    """Lucene UnifiedHighlighter shape: per matching doc, the best
    {HL_W}-token window (max distinct query-term hits, earliest on tie)
    rendered as a snippet with matched terms UPPERCASED (a deterministic
    ASCII-safe stand-in for <em> tags). Two-stage plan: candidate
    selection first — "contains >= 1 query term" (arrays_overlap,
    codegen) is EQUIVALENT to "best window score > 0" since a W-token
    window can cover any term position, so the docID-asc top-20 prunes
    with a cheap filter + TakeOrdered — then the expensive window-argmax
    HOFs run on the 20 surviving rows only (was: the whole corpus;
    9.7 s -> sub-second at sf0.1), still zero Python."""
    ft = F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")

    def win_score(s):
        w = F.slice(F.col("_ft"), s + 1, HL_W)
        sc = F.lit(0)
        for q in BM25_TERMS:
            sc = sc + F.array_contains(w, q).cast("int")
        return sc

    starts = F.sequence(
        F.lit(0), F.greatest(F.size("_ft") - HL_W, F.lit(0))
    )
    # single evaluation per window: score each start once, then one
    # struct array_max — (score asc, -s asc) ordering == max score,
    # earliest start on ties
    best_ns = F.array_max(
        F.transform(
            starts,
            lambda s: F.struct(win_score(s).alias("score"), (-s).alias("ns")),
        )
    )
    best = F.struct(
        best_ns["score"].alias("score"), (-best_ns["ns"]).alias("s")
    )
    qarr = F.array(*[F.lit(t) for t in BM25_TERMS])
    snippet = F.concat_ws(
        " ",
        F.transform(
            F.slice(F.col("_ft"), F.col("_best.s") + 1, HL_W),
            lambda x: F.when(
                F.array_contains(qarr, x), F.upper(x)
            ).otherwise(x),
        ),
    )
    return (
        _docs(spark, sf_dir)
        .select("doc_id", ft.alias("_ft"))
        .filter(F.arrays_overlap(F.col("_ft"), qarr))
        .orderBy("doc_id")
        .limit(20)
        .withColumn("_best", best)
        .filter(F.col("_best.score") > 0)
        .select(
            "doc_id",
            F.col("_best.score").cast("long").alias("n_terms"),
            F.col("_best.s").cast("long").alias("start"),
            snippet.alias("snippet"),
        )
        .orderBy("doc_id")
    )


O_HIGHLIGHT = f"""
WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ft
           FROM documents),
st AS (SELECT doc_id, ft,
              unnest(range(0, greatest(len(ft) - {HL_W}, 0) + 1)) AS s
       FROM t),
sc AS (SELECT doc_id, ft, s,
              ({" + ".join(f"list_contains(ft[s+1:s+{HL_W}], '{t}')::int" for t in BM25_TERMS)}) AS score
       FROM st),
best AS (SELECT doc_id, ft, s, score,
                row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, s ASC) AS rn
         FROM sc)
SELECT doc_id, score::bigint AS n_terms, s::bigint AS start,
       list_aggregate(list_transform(ft[s+1:s+{HL_W}],
         x -> CASE WHEN x IN ({", ".join(f"'{t}'" for t in BM25_TERMS)})
                   THEN upper(x) ELSE x END), 'string_agg', ' ') AS snippet
FROM best WHERE rn = 1 AND score > 0 ORDER BY doc_id LIMIT 20
"""


def q_dedup_rate_by_source(spark, sf_dir):
    """Per-source exact-duplication report (the corpus-triage table a
    dedup run starts from: which sources are worth deduping): docs,
    distinct texts, duplicate fraction. One hash-agg shuffle."""
    d = _docs(spark, sf_dir)
    agg = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("text").alias("n_uniq"),
    )
    dup = F.lit(1.0) - F.col("n_uniq").cast("double") / F.col("n_docs")
    return (
        agg.select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_uniq").cast("long").alias("n_uniq"),
            F.round(dup, 6).alias("dup_frac"),
        )
        .orderBy("source")
    )


O_DEDUP_RATE_BY_SOURCE = """
SELECT source, count(*)::bigint AS n_docs,
       count(DISTINCT text)::bigint AS n_uniq,
       round(1.0 - count(DISTINCT text)::double / count(*), 6) AS dup_frac
FROM documents GROUP BY source ORDER BY source
"""


def q_source_ttest(spark, sf_dir):
    """Welch's two-sample t-test between the two lexicographically first
    sources on per-doc token count — the A/B significance check a
    pipeline runs before trusting a source-level quality difference
    (extends the reference's Stats moments surface,
    /root/reference/app/org/nlp4l/lucene/stats/Stats.scala:27-57, to
    inference). t = (m1-m2)/sqrt(v1/n1+v2/n2), df by
    Welch–Satterthwaite; one scan + one two-group aggregate, all
    closed-form scalars."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = (
        _docs(spark, sf_dir)
        .select("source", F.size(toks).cast("double").alias("x"))
    )
    srcs = sorted(
        r["source"] for r in d.select("source").distinct().collect()
    )[:2]
    g = (
        d.filter(F.col("source").isin(srcs))
        .groupBy("source")
        .agg(
            F.count("*").alias("n"),
            F.avg("x").alias("m"),
            F.var_samp("x").alias("v"),
        )
        .collect()
    )
    a, b = sorted(g, key=lambda r: r["source"])
    se2 = a["v"] / a["n"] + b["v"] / b["n"]
    t = (a["m"] - b["m"]) / math.sqrt(se2)
    dof = se2 * se2 / (
        (a["v"] / a["n"]) ** 2 / (a["n"] - 1)
        + (b["v"] / b["n"]) ** 2 / (b["n"] - 1)
    )
    return spark.createDataFrame(
        [(a["source"], b["source"], round(t, 6), round(dof, 6))],
        "source_a string, source_b string, t double, df double",
    )


O_SOURCE_TTEST = f"""
WITH d AS (SELECT source, len({TOK_SQL})::double AS x FROM documents),
s2 AS (SELECT source FROM d GROUP BY 1 ORDER BY source LIMIT 2),
g AS (SELECT source, count(*)::double AS n, avg(x) AS m, var_samp(x) AS v
      FROM d JOIN s2 USING (source) GROUP BY 1),
ab AS (SELECT
         min(source) AS source_a, max(source) AS source_b,
         min_by(n, source) AS n1, min_by(m, source) AS m1, min_by(v, source) AS v1,
         max_by(n, source) AS n2, max_by(m, source) AS m2, max_by(v, source) AS v2
       FROM g)
SELECT source_a, source_b,
       round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t,
       round(pow(v1 / n1 + v2 / n2, 2)
             / (pow(v1 / n1, 2) / (n1 - 1) + pow(v2 / n2, 2) / (n2 - 1)),
             6) AS df
FROM ab
"""


RARE_K = 10


def q_rare_terms(spark, sf_dir):
    """Elasticsearch rare_terms aggregation surface — the long-tail end
    of the dictionary (typo/entity mining), here as the bottom-{RARE_K}
    terms by document frequency (df asc, term asc) so the result is
    non-degenerate at any corpus scale (ES's absolute max_doc_count
    threshold selects nothing on this fixed synthetic vocabulary). One
    tokenize scan + one (term) df agg + TakeOrdered — the inverse sort
    of top_terms_by_docfreq."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    return (
        _docs(spark, sf_dir)
        .select(F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .select("term", F.col("df").cast("long").alias("df"))
        .orderBy(F.asc("df"), F.asc("term"))
        .limit(RARE_K)
    )


O_RARE_TERMS = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({TOK_SQL})) AS term
           FROM documents)
SELECT term, count(*)::bigint AS df FROM t
GROUP BY term ORDER BY df ASC, term ASC LIMIT {RARE_K}
"""


def q_event_derivative(spark, sf_dir):
    """Elasticsearch derivative pipeline aggregation over a
    date_histogram: day-over-day delta of the daily event count (the
    trend panel next to every histogram). The parent histogram is the
    date_histogram plan (one keyed groupBy); the derivative is a lag
    window over the DAYS-sized bucket frame — window input is bucket
    count, never event count."""
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
            (F.col("cnt") - F.lag("cnt").over(w)).cast("long").alias("delta"),
        )
        .orderBy("day")
    )


O_EVENT_DERIVATIVE = """
WITH d AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  count(*)::bigint AS cnt
           FROM events GROUP BY 1)
SELECT day, cnt, (cnt - lag(cnt) OVER (ORDER BY day))::bigint AS delta
FROM d ORDER BY day
"""


def q_source_similarity(spark, sf_dir):
    """Pairwise cosine similarity between sources' unigram frequency
    vectors — the corpus-comparison triage before mixing sources (which
    crawls are near-duplicates of each other at the DISTRIBUTION level,
    the keyness family's symmetric sibling). All dot products and norms
    are exact int64 sums of integer term counts, so the aggregate is
    order-independent; only the final cosine divides in double (rounded
    6dp). Plan: one tokenize scan -> (source, term) cf agg (vocab-sized)
    -> term-keyed self-join of the per-source vectors -> pair agg —
    pairs are |sources|², never corpus-sized."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    gt = (
        _docs(spark, sf_dir)
        .select("source", F.explode(toks).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").cast("long").alias("cf"))
    )
    norms = gt.groupBy("source").agg(
        F.sum(F.col("cf") * F.col("cf")).alias("_n2")
    )
    a = gt.select(
        F.col("source").alias("source_a"), "term", F.col("cf").alias("_ca")
    )
    b = gt.select(
        F.col("source").alias("source_b"), "term", F.col("cf").alias("_cb")
    )
    dots = (
        a.join(b, "term")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"))
    )
    na = norms.select(
        F.col("source").alias("source_a"), F.col("_n2").alias("_na")
    )
    nb = norms.select(
        F.col("source").alias("source_b"), F.col("_n2").alias("_nb")
    )
    cos = F.col("_dot").cast("double") / (
        F.sqrt(F.col("_na").cast("double")) * F.sqrt(F.col("_nb").cast("double"))
    )
    return (
        dots.join(na, "source_a")
        .join(nb, "source_b")
        .select(
            "source_a", "source_b", F.round(cos, 6).alias("cosine")
        )
        .orderBy("source_a", "source_b")
    )


O_SOURCE_SIMILARITY = f"""
WITH t AS (SELECT source, unnest({TOK_SQL}) AS term FROM documents),
gt AS (SELECT source, term, count(*)::bigint AS cf FROM t GROUP BY 1, 2),
n AS (SELECT source, sum(cf * cf)::bigint AS n2 FROM gt GROUP BY 1),
d AS (SELECT a.source AS source_a, b.source AS source_b,
             sum(a.cf * b.cf)::bigint AS dot
      FROM gt a JOIN gt b USING (term)
      WHERE a.source < b.source
      GROUP BY 1, 2)
SELECT source_a, source_b,
       round(dot::double / (sqrt(na.n2::double) * sqrt(nb.n2::double)), 6)
         AS cosine
FROM d JOIN n na ON na.source = source_a JOIN n nb ON nb.source = source_b
ORDER BY source_a, source_b
"""


def q_activity_matrix(spark, sf_dir):
    """Hour-of-day × day-of-week activity matrix over the events table
    (the triage heatmap every ops dashboard opens with). Buckets derive
    from epoch arithmetic — dow = floor(epoch/86400 + 4) % 7 (epoch day
    0 was a Thursday), hour = floor(epoch/3600) % 24 — so no calendar /
    timezone functions diverge between engines. One keyed groupBy over
    a 168-cell key space."""
    sec = F.col("ts").cast("timestamp").cast("long")
    return (
        _events(spark, sf_dir)
        .select(
            ((F.floor(sec / 86400) + 4) % 7).cast("int").alias("dow"),
            (F.floor(sec / 3600) % 24).cast("int").alias("hour"),
        )
        .groupBy("dow", "hour")
        .agg(F.count("*").cast("long").alias("cnt"))
        .orderBy("dow", "hour")
    )


O_ACTIVITY_MATRIX = """
SELECT ((floor(floor(epoch(ts))::bigint / 86400) + 4) % 7)::int AS dow,
       (floor(floor(epoch(ts))::bigint / 3600) % 24)::int AS hour,
       count(*)::bigint AS cnt
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_event_pipeline(spark, sf_dir):
    """Elasticsearch cumulative_sum + moving_fn pipeline aggregations
    over the daily histogram: running total and trailing 7-day moving
    average of the daily event count. Parent histogram = one keyed
    groupBy; both pipeline stages are frames over the DAYS-sized bucket
    series (integer sums — the moving average is an exact int/int
    division, order-independent)."""
    sec = F.col("ts").cast("timestamp").cast("long")
    daily = (
        _events(spark, sf_dir)
        .select(F.floor(sec / 86400).cast("long").alias("day"))
        .groupBy("day")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    w_cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    w_ma = Window.orderBy("day").rowsBetween(-6, 0)
    return daily.select(
        "day",
        "cnt",
        F.sum("cnt").over(w_cum).cast("long").alias("cum"),
        F.round(F.avg("cnt").over(w_ma), 6).alias("ma7"),
    ).orderBy("day")


O_EVENT_PIPELINE = """
WITH d AS (SELECT floor(floor(epoch(ts))::bigint / 86400)::bigint AS day,
                  count(*)::bigint AS cnt
           FROM events GROUP BY 1)
SELECT day, cnt,
       sum(cnt) OVER (ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::bigint
         AS cum,
       round(avg(cnt) OVER (ORDER BY day
                            ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6)
         AS ma7
FROM d ORDER BY day
"""


COMPOSITE_PAGE = 5


def q_composite_page2(spark, sf_dir):
    """Elasticsearch composite aggregation with after-key paging: the
    SECOND page of (lang, source) doc-count buckets in composite key
    order, page size {COMPOSITE_PAGE}. Keyset pagination — the page-2
    predicate is a key-tuple comparison against page 1's last key, NOT
    an OFFSET scan, so any page costs one pruned agg at any bucket
    count (the scale argument for composite over terms+offset). The
    after-key is derived driver-side from the page-1 frame (buckets are
    tiny); the corpus sees one groupBy."""
    buckets = (
        _docs(spark, sf_dir)
        .groupBy("lang", "source")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    page1 = (
        buckets.orderBy("lang", "source").limit(COMPOSITE_PAGE).collect()
    )
    if len(page1) < COMPOSITE_PAGE:
        return buckets.orderBy("lang", "source").limit(0)
    after_lang, after_src = page1[-1]["lang"], page1[-1]["source"]
    return (
        buckets.filter(
            (F.col("lang") > after_lang)
            | ((F.col("lang") == after_lang) & (F.col("source") > after_src))
        )
        .orderBy("lang", "source")
        .limit(COMPOSITE_PAGE)
    )


O_COMPOSITE_PAGE2 = f"""
WITH b AS (SELECT lang, source, count(*)::bigint AS cnt
           FROM documents GROUP BY 1, 2),
p1 AS (SELECT * FROM b ORDER BY lang, source LIMIT {COMPOSITE_PAGE}),
ak AS (SELECT lang AS al, source AS asrc FROM p1
       ORDER BY lang DESC, source DESC LIMIT 1)
SELECT b.lang, b.source, b.cnt FROM b CROSS JOIN ak
WHERE (SELECT count(*) FROM p1) = {COMPOSITE_PAGE}
  AND (b.lang > al OR (b.lang = al AND b.source > asrc))
ORDER BY lang, source LIMIT {COMPOSITE_PAGE}
"""


ADJ_FILTERS = ("join", "merge", "vector", "scan")


def q_term_adjacency(spark, sf_dir):
    """Elasticsearch adjacency_matrix aggregation: doc counts for every
    named filter and every pairwise intersection — the co-occurrence
    matrix dashboards build topic chord diagrams from. Filters here are
    term-presence tests over {ADJ_FILTERS}. ONE scan computes all k
    presence flags; the k(k+1)/2 cell counts are sums of flag products
    in a single aggregate row, then unpivoted driver-side — no joins,
    no shuffle beyond the scalar agg."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    flags = [
        F.array_contains(toks, t).cast("long").alias(f"_f{i}")
        for i, t in enumerate(ADJ_FILTERS)
    ]
    base = _docs(spark, sf_dir).select(*flags)
    aggs = []
    names = []
    for i, a in enumerate(ADJ_FILTERS):
        for j, b in enumerate(ADJ_FILTERS):
            if i > j:
                continue
            key = a if i == j else f"{a}&{b}"
            names.append(key)
            aggs.append(
                F.sum(F.col(f"_f{i}") * F.col(f"_f{j}")).alias(
                    f"_c{len(aggs)}"
                )
            )
    row = base.agg(*aggs).collect()[0]
    out = [(names[i], int(row[f"_c{i}"] or 0)) for i in range(len(names))]
    return (
        spark.createDataFrame(out, "pair string, cnt long")
        .filter(F.col("cnt") > 0)
        .orderBy("pair")
    )


def _o_term_adjacency() -> str:
    cells = []
    for i, a in enumerate(ADJ_FILTERS):
        for j, b in enumerate(ADJ_FILTERS):
            if i > j:
                continue
            key = a if i == j else f"{a}&{b}"
            cells.append(
                f"SELECT '{key}' AS pair, sum(f{i} * f{j})::bigint AS cnt FROM fl"
            )
    flags = ", ".join(
        f"list_contains({TOK_SQL}, '{t}')::bigint AS f{i}"
        for i, t in enumerate(ADJ_FILTERS)
    )
    return f"""
WITH fl AS (SELECT {flags} FROM documents)
SELECT pair, cnt FROM ({" UNION ALL ".join(cells)})
WHERE cnt > 0 ORDER BY pair
"""


O_TERM_ADJACENCY = _o_term_adjacency()


BOILER_MIN_SHARE = 0.5


def q_boilerplate_terms(spark, sf_dir):
    """Per-source boilerplate vocabulary (the template-detection pass a
    crawl pipeline runs before line/doc dedup — C4/RefinedWeb strip
    boilerplate by ubiquity): terms present in >= {BOILER_MIN_SHARE:.0%}
    of ONE source's docs, with per-source doc share. Plan: one tokenize
    scan -> distinct (source, term, doc) -> (source, term) df agg + a
    broadcast per-source doc-count join — two keyed shuffles, vocab-sized
    output."""
    toks = STANDARD_ANALYZER.tokens_expr("text")
    d = _docs(spark, sf_dir)
    per_src = F.broadcast(
        d.groupBy("source").agg(F.count("*").alias("_n"))
    )
    df_tbl = (
        d.select("source", "doc_id", F.explode(F.array_distinct(toks)).alias("term"))
        .groupBy("source", "term")
        .agg(F.count("*").alias("_df"))
    )
    share = F.col("_df").cast("double") / F.col("_n")
    return (
        df_tbl.join(per_src, "source")
        .filter(share >= BOILER_MIN_SHARE)
        .select(
            "source",
            "term",
            F.col("_df").cast("long").alias("df"),
            F.round(share, 6).alias("doc_share"),
        )
        .orderBy("source", F.desc("df"), F.asc("term"))
    )


O_BOILERPLATE_TERMS = f"""
WITH t AS (SELECT source, doc_id, unnest(list_distinct({TOK_SQL})) AS term
           FROM documents),
n AS (SELECT source, count(*)::double AS _n FROM documents GROUP BY 1),
d AS (SELECT source, term, count(*)::bigint AS df FROM t GROUP BY 1, 2)
SELECT source, term, df, round(df::double / _n, 6) AS doc_share
FROM d JOIN n USING (source)
WHERE df::double / _n >= {BOILER_MIN_SHARE!r}
ORDER BY source, df DESC, term ASC
"""


def q_label_centroids(spark, sf_dir):
    """Per-label embedding-cluster quality report (the audit before
    trusting labels for semantic dedup / stratified sampling): centroid
    norm and mean cosine of members to their centroid. Centroid
    components are 6dp-rounded BEFORE the cosine on both engines (the
    rounded-selection-key convention) so downstream arithmetic is
    order-independent. Plan: one posexplode agg (label×dim rows) +
    a broadcast centroid join — the corpus of vectors is scanned twice,
    never shuffled by vector."""
    emb = _embeddings(spark, sf_dir)
    comp = emb.select("label", F.posexplode("embedding").alias("pos", "v"))
    cent = (
        comp.groupBy("label", "pos")
        .agg(F.round(F.avg(F.col("v").cast("double")), 6).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
    )
    dot = F.aggregate(
        F.zip_with(
            "embedding", "centroid", lambda a, b: a.cast("double") * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nv = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda a: a.cast("double") * a),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    nc = F.sqrt(
        F.aggregate(
            F.transform("centroid", lambda c: c * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    per_vec = emb.join(F.broadcast(cent), "label").select(
        "label", (dot / (nv * nc)).alias("cos"), nc.alias("cnorm")
    )
    return (
        per_vec.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("cos"), 6).alias("mean_cos"),
            F.round(F.max("cnorm"), 6).alias("centroid_norm"),
        )
        .select(
            "label",
            F.col("n_vecs").cast("long").alias("n_vecs"),
            "mean_cos",
            "centroid_norm",
        )
        .orderBy("label")
    )


O_LABEL_CENTROIDS = """
WITH u AS (SELECT label,
                  unnest(list_zip(range(1, len(embedding) + 1),
                                  embedding)) AS z
           FROM embeddings),
uu AS (SELECT label, z[1] AS i, z[2]::double AS v FROM u),
c AS (SELECT label, i, round(avg(v), 6) AS c FROM uu GROUP BY 1, 2),
cent AS (SELECT label, list(c ORDER BY i) AS centroid FROM c GROUP BY label),
pv AS (SELECT e.label,
              list_aggregate(list_transform(range(1, len(embedding) + 1),
                  i -> embedding[i]::double * centroid[i]), 'sum')
              / (sqrt(list_aggregate(list_transform(embedding,
                     x -> x::double * x::double), 'sum'))
                 * sqrt(list_aggregate(list_transform(centroid,
                     x -> x * x), 'sum'))) AS cos,
              sqrt(list_aggregate(list_transform(centroid,
                  x -> x * x), 'sum')) AS cnorm
       FROM embeddings e JOIN cent USING (label))
SELECT label, count(*)::bigint AS n_vecs,
       round(avg(cos), 6) AS mean_cos,
       round(max(cnorm), 6) AS centroid_norm
FROM pv GROUP BY label ORDER BY label
"""


FOLD_SNIPPETS = [
    "café crème brûlée",
    "münchen straße gröön",
    "naïve façade déjà vu",
    "señor piñata jalapeño æther œuvre",
]
FOLD_TERMS = [
    "aether", "brulee", "cafe", "creme", "deja", "facade", "groon",
    "jalapeno", "munchen", "naive", "oeuvre", "pinata", "senor",
    "strasse", "vu",
]


def q_ascii_fold_wordcount(spark, sf_dir):
    """Wordcount through the ASCII-folding analyzer (Lucene
    ASCIIFoldingFilter; analysis/analyzer.py FOLDING_ANALYZER): the
    corpus deterministically augmented with accented-Latin snippets
    keyed by doc_id, folded (diacritics -> ASCII, æ/œ/ß -> ae/oe/ss),
    counts of the folded forms. The plain analyzer would split every
    accented word at the diacritic ('café' -> 'caf'), so this query is
    green ONLY if the folding chain matches across engines."""
    from nlp4l_spark.analysis import FOLDING_ANALYZER

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    snip = F.element_at(
        F.array(*[F.lit(s) for s in FOLD_SNIPPETS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    aug = docs.withColumn("text", F.concat_ws(" ", F.col("text"), snip))
    toks = FOLDING_ANALYZER.tokens_expr("text")
    return (
        aug.select(F.explode(toks).alias("term"))
        .filter(F.col("term").isin(FOLD_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.asc("term"))
    )


def _o_ascii_fold_wordcount() -> str:
    from nlp4l_spark.analysis import FOLDING_ANALYZER

    whens = " ".join(
        f"WHEN {i} THEN '{s}'" for i, s in enumerate(FOLD_SNIPPETS)
    )
    aug = f"(text || ' ' || CASE doc_id % 4 {whens} END)"
    tok = FOLDING_ANALYZER.duckdb_tokens_sql("text")
    inlist = ", ".join(f"'{t}'" for t in FOLD_TERMS)
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS text FROM documents),
toks AS (SELECT unnest({tok}) AS term FROM aug)
SELECT term, count(*)::bigint AS cf FROM toks
WHERE term IN ({inlist})
GROUP BY term ORDER BY term ASC
"""


O_ASCII_FOLD_WORDCOUNT = _o_ascii_fold_wordcount()


# UAX#29 fixture: word-internal apostrophes (both ' and U+2019), dotted
# acronyms, numeric grouping/decimals, combining marks (U+0301/U+0308),
# hyphen breaks — the word-break decisions the [a-z0-9]+ contract can't
# make (analysis/analyzer.py::UAX29_TOKEN_PATTERN).
UAX_SNIPPETS = [
    "don't stop believin' it's o\u2019brien's",
    "u.s.a. vs u.s.s.r. e.g. ph.d",
    "pi 3.14 total 1,000,000 swiss 1'000 v2.0 foo_bar snake_case_id",
    # round 4: marks beyond U+036F (Devanagari \u094d, Cyrillic \u0483),
    # ZWJ mid-token, ExtendNumLet joins (underscore, NNBSP \u202f,
    # undertie \u203f) — the Extend/ENL completeness fixture
    "cafe\u0301 nai\u0308ve zu\u0308rich state-of-the-art"
    " ve\u094dda c\u0483x x\u200dy _lead trail_ 1_2"
    " tok\u202fjoin x\u203f9",
]
UAX_TERMS = [
    "don't", "believin", "it's", "o\u2019brien's",
    "u.s.a", "u.s.s.r", "e.g", "ph.d",
    "3.14", "1,000,000", "1'000", "v2.0", "foo_bar", "snake_case_id",
    "cafe\u0301", "nai\u0308ve", "zu\u0308rich", "state", "art",
    "ve\u094dda", "c\u0483x", "x\u200dy", "_lead", "trail_", "1_2",
    "tok\u202fjoin", "x\u203f9",
]


def q_uax29_wordcount(spark, sf_dir):
    """Wordcount through the UAX#29 word-break analyzer
    (analysis/analyzer.py UAX29_ANALYZER; Lucene StandardTokenizer's
    UAX#29 default rules on the Latin alphabet): the corpus
    deterministically augmented with joiner/mark-bearing snippets keyed
    by doc_id, counts of the UAX#29 word forms. The default [a-z0-9]+
    contract would split every one of these tokens ('don't' -> don, t;
    '3.14' -> 3, 14), so this query is green ONLY if the typed-run
    automaton regex behaves identically in Spark (Java regex) and the
    DuckDB oracle (RE2 — no lookarounds, which is why the pattern
    encodes types positionally)."""
    from nlp4l_spark.analysis import UAX29_ANALYZER

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    snip = F.element_at(
        F.array(*[F.lit(s) for s in UAX_SNIPPETS]),
        (F.col("doc_id") % 4 + 1).cast("int"),
    )
    aug = docs.withColumn("text", F.concat_ws(" ", F.col("text"), snip))
    toks = UAX29_ANALYZER.tokens_expr("text")
    return (
        aug.select(F.explode(toks).alias("term"))
        .filter(F.col("term").isin(UAX_TERMS))
        .groupBy("term")
        .agg(F.count("*").alias("cf"))
        .orderBy(F.asc("term"))
    )


def _o_uax29_wordcount() -> str:
    from nlp4l_spark.analysis import UAX29_ANALYZER

    def q(s: str) -> str:
        return s.replace("'", "''")

    whens = " ".join(
        f"WHEN {i} THEN '{q(s)}'" for i, s in enumerate(UAX_SNIPPETS)
    )
    aug = f"(text || ' ' || CASE doc_id % 4 {whens} END)"
    tok = UAX29_ANALYZER.duckdb_tokens_sql("text")
    inlist = ", ".join(f"'{q(t)}'" for t in UAX_TERMS)
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS text FROM documents),
toks AS (SELECT unnest({tok}) AS term FROM aug)
SELECT term, count(*)::bigint AS cf FROM toks
WHERE term IN ({inlist})
GROUP BY term ORDER BY term ASC
"""


O_UAX29_WORDCOUNT = _o_uax29_wordcount()


PERC_QUERIES = [
    (1, ["join"]),
    (2, ["merge", "join"]),
    (3, ["vector", "scan", "hash"]),
    (4, ["nosuchterm"]),
    (5, ["spark", "window"]),
]


def q_percolate(spark, sf_dir):
    """Percolation / reverse search (ops/percolate.py::percolate; the ES
    percolator shape): match every doc against 5 stored conjunctive
    queries, emit (doc_id, query_id) hits. Queries broadcast; docs
    stream through one tokenize scan with an arrays_overlap prune before
    the exact subset check — zero corpus shuffle."""
    from nlp4l_spark.ops.percolate import percolate

    q = spark.createDataFrame(
        PERC_QUERIES, "query_id int, must_terms array<string>"
    )
    return percolate(_docs(spark, sf_dir), q).orderBy("doc_id", "query_id")


def _o_percolate() -> str:
    # Python list repr == DuckDB array literal for plain ascii terms
    values = ", ".join(f"({qid}, {terms!r})" for qid, terms in PERC_QUERIES)
    return f"""
WITH d AS (SELECT doc_id, list_distinct({TOK_SQL}) AS toks FROM documents),
q AS (SELECT * FROM (VALUES {values}) AS t(query_id, must))
SELECT doc_id, query_id FROM d JOIN q ON list_has_all(toks, must)
ORDER BY doc_id, query_id
"""


O_PERCOLATE = _o_percolate()


# --------------------------------------------------------------------- #
