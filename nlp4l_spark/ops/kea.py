"""KEA keyphrase candidate generation + features.

Reference semantics (what, not how):
* KEAStandardAnalyzer: standard tokenize -> lowercase -> n-gram shingles
  (n = 1..3) (/root/reference/app/org/nlp4l/framework/builtin/kea/
  KEAStandardAnalyzer.java:35-90). NOTE: no stopword *removal* before
  shingling — stop filtering applies to the assembled phrase.
* KEAStopFilter: n=1 drops stopwords / single chars / pure numbers;
  n>=2 drops phrases that begin with a begin-stopword or end with an
  end-stopword (KEAStopFilter.java:29-62).
* Features per (doc, phrase): tfidf = tf/docSize * -log2(df/N),
  first_occurrence = first_pos/docSize (CommonProcessor.scala:132-142).

Rebuild: shingles are a JVM-side ``transform(sequence(...))`` over the
token array (no Python); candidate counting is one groupBy. ``docSize``
is the full (pre-stop) token count of the doc; phrase positions index the
full token stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from nlp4l_spark.analysis import (
    Analyzer,
    LUCENE_ENGLISH_STOPWORDS,
    WHITESPACE_ANALYZER,
)


def shingles_expr(tokens: Column, n: int) -> Column:
    """array<string> of n-token phrases (space-joined), JVM-side.
    Docs with fewer than n tokens yield an empty array (``sequence(0,-1)``
    would count DOWN and drive element_at out of bounds in ANSI mode)."""
    if n == 1:
        return tokens
    return F.when(
        F.size(tokens) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(tokens) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(tokens, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def phrase_filter(phrase: Column, n: int, stopwords: frozenset[str]) -> Column:
    """KEAStopFilter.accept as a boolean Column."""
    stop_arr = F.array(*[F.lit(w) for w in sorted(stopwords)])
    if n == 1:
        return (
            (~F.array_contains(stop_arr, phrase))
            & (F.length(phrase) > 1)
            & (~phrase.rlike(r"^\d+$"))
        )
    first = F.element_at(F.split(phrase, " "), 1)
    last = F.element_at(F.split(phrase, " "), -1)
    return (~F.array_contains(stop_arr, first)) & (
        ~F.array_contains(stop_arr, last)
    )


def candidate_counts(
    df: DataFrame,
    n: int,
    *,
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
    stopwords: frozenset[str] = LUCENE_ENGLISH_STOPWORDS,
) -> DataFrame:
    """(phrase, cnt) — corpus-wide counts of accepted n-gram candidates."""
    toks = analyzer.tokens_expr(text_col)
    exploded = df.select(
        F.explode(shingles_expr(toks, n)).alias("phrase")
    ).filter(phrase_filter(F.col("phrase"), n, stopwords))
    return exploded.groupBy("phrase").agg(F.count("*").alias("cnt"))


def keyphrase_scores(
    df: DataFrame,
    n: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
    stopwords: frozenset[str] = LUCENE_ENGLISH_STOPWORDS,
) -> DataFrame:
    """(phrase, n, cf, df, score) for accepted n-gram candidates;
    score = cf * -log2(df/N) (KEA tfidf shape at corpus level)."""
    n_docs = df.count()
    toks = analyzer.tokens_expr(text_col)
    exploded = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles_expr(toks, n)).alias("phrase"),
    ).filter(phrase_filter(F.col("phrase"), n, stopwords))
    return exploded.groupBy("phrase").agg(
        F.lit(n).alias("n"),
        F.count("*").alias("cf"),
        F.countDistinct("doc_id").alias("df"),
    ).withColumn(
        "score",
        F.col("cf") * -(F.log2(F.col("df") / F.lit(float(n_docs)))),
    )


def top_keyphrases(
    df: DataFrame,
    k: int = 15,
    **kwargs,
) -> DataFrame:
    """KEA keyphrase ranking (KeyphraseExtractionProcessor.scala:144-158
    semantics, corpus-level): rank uni+bigram candidates by
    (score desc, phrase asc), drop any unigram that is a word of a
    higher-ranked bigram (subphrase dedup), take top k."""
    from pyspark.sql import Window

    cand = keyphrase_scores(df, 1, **kwargs).unionByName(
        keyphrase_scores(df, 2, **kwargs)
    )
    # pre-prune to top k*50 by the rank key (TakeOrderedAndProject, no
    # global sort) before the single-partition ranking window: a dropped
    # unigram's dominating bigram always ranks above it, so the top-M
    # prefix is closed under the dedup rule and results are unchanged
    # while the window input stays k-bounded at any vocabulary size.
    m = k * 50
    cand = cand.orderBy(F.desc("score"), F.asc("phrase")).limit(m)
    w = Window.orderBy(F.desc("score"), F.asc("phrase"))
    ranked = cand.withColumn("rank", F.row_number().over(w))
    bigrams = ranked.filter("n = 2").select(
        F.col("rank").alias("b_rank"),
        F.split("phrase", " ")[0].alias("w1"),
        F.split("phrase", " ")[1].alias("w2"),
    )
    sub = (
        ranked.filter("n = 1")
        .join(
            bigrams,
            (
                (F.col("phrase") == F.col("w1"))
                | (F.col("phrase") == F.col("w2"))
            )
            & (F.col("b_rank") < F.col("rank")),
            "left_semi",
        )
        .select("phrase")
    )
    return (
        ranked.join(sub, "phrase", "left_anti")
        .orderBy("rank")
        .limit(k)
        .select("phrase", "n", "cf", "df", F.round("score", 6).alias("score"))
    )


def doc_candidates(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
    stopwords: frozenset[str] = LUCENE_ENGLISH_STOPWORDS,
) -> DataFrame:
    """(doc_id, phrase, n, tf, first_pos, doc_size) for every accepted
    1..3-gram candidate of every doc (KEAStandardAnalyzer candidates)."""
    toks_col = analyzer.tokens_expr(text_col)
    parts = []
    for n in ns:
        parts.append(
            df.select(
                F.col(id_col).alias("doc_id"),
                F.size(toks_col).alias("doc_size"),
                F.posexplode(shingles_expr(toks_col, n)).alias("pos", "phrase"),
            )
            .filter(phrase_filter(F.col("phrase"), n, stopwords))
            .groupBy("doc_id", "phrase")
            .agg(
                F.lit(n).alias("n"),
                F.count("*").alias("tf"),
                F.min("pos").alias("first_pos"),
                F.first("doc_size").alias("doc_size"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def candidate_features(cands: DataFrame, n_docs: int) -> DataFrame:
    """Adds the two KEA features (CommonProcessor.scala:132-142):
    tfidf = tf/doc_size * -log2(df/N), first_occ = first_pos/doc_size."""
    dfm = cands.groupBy("phrase").agg(F.countDistinct("doc_id").alias("df"))
    return cands.join(dfm, "phrase").select(
        "doc_id",
        "phrase",
        "n",
        (
            F.col("tf")
            / F.col("doc_size")
            * -(F.log2(F.col("df") / F.lit(float(n_docs))))
        ).alias("tfidf"),
        (F.col("first_pos") / F.col("doc_size")).alias("first_occ"),
    )


class KeaModel:
    """Trained KEA keyphrase model: MDLP cut points + Naive Bayes tables
    (KeyphraseExtractionProcessor.scala:239-321). The model is a handful
    of floats — broadcast as literals, scoring is pure JVM expressions."""

    def __init__(self, cuts_tfidf, cuts_dist, p_yes, p_no,
                 p_tfidf_yes, p_tfidf_no, p_dist_yes, p_dist_no,
                 df_table=None, n_docs: int = 0):
        self.cuts_tfidf = cuts_tfidf
        self.cuts_dist = cuts_dist
        self.p_yes = p_yes
        self.p_no = p_no
        self.p_tfidf_yes = p_tfidf_yes
        self.p_tfidf_no = p_tfidf_no
        self.p_dist_yes = p_dist_yes
        self.p_dist_no = p_dist_no
        # model-index stats: phrase -> training docFreq, + training numDocs
        # (KeyphraseExtractionProcessor.getFeatures reads docFreq from the
        # MODEL index, not the extraction corpus, with +1 'inc' smoothing
        # for docs outside the model index)
        self.df_table = df_table
        self.n_docs = n_docs

    @staticmethod
    def _bin_expr(col: str, cuts: list[float]):
        arr = F.array(*[F.lit(float(c)) for c in cuts])
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, c: acc + F.when(F.col(col) >= c, 1).otherwise(0),
        )

    @staticmethod
    def _prob_expr(bin_col, probs: list[float]):
        return F.element_at(
            F.array(*[F.lit(float(p)) for p in probs]), bin_col + 1
        )

    def score_expr(self):
        """Column: P(yes|tfidf_bin, dist_bin) for rows with columns
        tfidf / first_occ. probYes = P(yes)*P(tb|yes)*P(db|yes);
        score = probYes / (probYes + probNo) — exactly KeyphraseScore."""
        tb = self._bin_expr("tfidf", self.cuts_tfidf)
        db = self._bin_expr("first_occ", self.cuts_dist)
        py = (
            F.lit(self.p_yes)
            * self._prob_expr(tb, self.p_tfidf_yes)
            * self._prob_expr(db, self.p_dist_yes)
        )
        pn = (
            F.lit(self.p_no)
            * self._prob_expr(tb, self.p_tfidf_no)
            * self._prob_expr(db, self.p_dist_no)
        )
        return py / (py + pn)


def fit_kea_model(
    df: DataFrame,
    *,
    keyphrases_col: str = "keyphrases",
    max_bins: int = 20,
    **cand_kwargs,
) -> KeaModel:
    """Train from docs carrying a `keyphrases` array<string> column of
    known (lowercased) keyphrases — the KEAModelBuildProcessor flow:
    candidates -> (tfidf, first_occ, label) rows -> MDLP cuts per feature
    -> per-bin class counts -> probability tables."""
    from nlp4l_spark.ops import discretizer

    n_docs = df.count()
    # persist: candidates feed the feature table, the label join, the
    # MDLP passes (label collect + histogram) and the model df table —
    # without the cache the shingle/tfidf pipeline re-runs 4-5x. Both
    # caches are released before returning; the model's df_table is
    # eagerly materialized first (phrase-level, tiny).
    cands = doc_candidates(df, **cand_kwargs).persist()
    feats = candidate_features(cands, n_docs)
    labeled = feats.join(
        df.select(
            F.col(cand_kwargs.get("id_col", "doc_id")).alias("doc_id"),
            F.col(keyphrases_col).alias("_kp"),
        ),
        "doc_id",
    ).withColumn(
        "label", F.array_contains("_kp", F.col("phrase")).cast("string")
    ).persist()
    cuts_df = discretizer.fit_mdlp(
        labeled, ["tfidf", "first_occ"], "label", max_bins=max_bins
    )
    cuts = {r["feature"]: list(r["cuts"]) for r in cuts_df.collect()}
    ct, cd = cuts.get(0, []), cuts.get(1, [])

    binned = labeled.select(
        "label",
        KeaModel._bin_expr("tfidf", ct).alias("tb"),
        KeaModel._bin_expr("first_occ", cd).alias("db"),
    )
    rows = binned.groupBy("label", "tb", "db").count().collect()
    n_tb, n_db = len(ct) + 1, len(cd) + 1
    cnt_t = {"true": [0] * n_tb, "false": [0] * n_tb}
    cnt_d = {"true": [0] * n_db, "false": [0] * n_db}
    tot = {"true": 0, "false": 0}
    for r in rows:
        lbl = r["label"]
        cnt_t[lbl][r["tb"]] += r["count"]
        cnt_d[lbl][r["db"]] += r["count"]
        tot[lbl] += r["count"]
    n_yes, n_no = max(tot["true"], 1), max(tot["false"], 1)
    df_table = (
        cands.groupBy("phrase")
        .agg(F.countDistinct("doc_id").alias("model_df"))
        .localCheckpoint(eager=True)
    )
    labeled.unpersist()
    cands.unpersist()
    return KeaModel(
        ct,
        cd,
        tot["true"] / max(tot["true"] + tot["false"], 1),
        tot["false"] / max(tot["true"] + tot["false"], 1),
        [c / n_yes for c in cnt_t["true"]],
        [c / n_no for c in cnt_t["false"]],
        [c / n_yes for c in cnt_d["true"]],
        [c / n_no for c in cnt_d["false"]],
        df_table=df_table,
        n_docs=n_docs,
    )


def extract_keyphrases(
    df: DataFrame,
    model: KeaModel,
    *,
    max_keyphrases: int = 5,
    **cand_kwargs,
) -> DataFrame:
    """(doc_id, phrase, score, tfidf, rank) — per-doc keyphrases ranked by
    (NB score desc, tfidf desc, phrase asc) with subphrase dedup, top
    max_keyphrases (KeyphraseExtractionProcessor.scala:144-158)."""
    from pyspark.sql import Window

    cands = doc_candidates(df, **cand_kwargs)
    # features against the MODEL index stats with 'inc' smoothing
    # (extraction docs are outside the model index):
    # tfidf = tf/doc_size * -log2((model_df+1)/(model_N+1))
    feats = cands.join(
        F.broadcast(model.df_table), "phrase", "left"
    ).select(
        "doc_id",
        "phrase",
        "n",
        (
            F.col("tf")
            / F.col("doc_size")
            * -(
                F.log2(
                    (F.coalesce(F.col("model_df"), F.lit(0)) + 1)
                    / F.lit(float(model.n_docs + 1))
                )
            )
        ).alias("tfidf"),
        (F.col("first_pos") / F.col("doc_size")).alias("first_occ"),
    )
    scored = feats.withColumn("score", model.score_expr())
    # ngram priority on ties: longer phrases first (reference ranking:
    # score desc, tfidf desc, ngram priority — KeyphraseExtraction
    # Processor.scala:144-158), then phrase asc for determinism
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.desc("tfidf"), F.desc("n"), F.asc("phrase")
    )
    ranked = scored.withColumn("r", F.row_number().over(w))
    # subphrase dedup: drop a candidate contained (word-bounded) in a
    # higher-ranked candidate of the same doc
    a, b = ranked.alias("a"), ranked.alias("b")
    sub = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.r") < F.col("a.r"))
            & (
                F.instr(
                    F.concat(F.lit(" "), F.col("b.phrase"), F.lit(" ")),
                    F.concat(F.lit(" "), F.col("a.phrase"), F.lit(" ")),
                )
                > 0
            ),
            "left_semi",
        )
        .select("a.doc_id", "a.phrase")
    )
    kept = ranked.join(sub, ["doc_id", "phrase"], "left_anti")
    w2 = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.desc("tfidf"), F.desc("n"), F.asc("phrase")
    )
    return (
        kept.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= max_keyphrases)
        .select(
            "doc_id",
            "phrase",
            F.round("score", 6).alias("score"),
            F.round("tfidf", 6).alias("tfidf"),
            "rank",
        )
    )


def kea_features(
    df: DataFrame,
    terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    analyzer: Analyzer = WHITESPACE_ANALYZER,
) -> DataFrame:
    """(doc_id, term, kea_tfidf, first_occ) for unigram candidates.

    tfidf = tf/docSize * -log2(df/N); first_occ = first_position/docSize,
    positions over the full token stream (CommonProcessor.scala:132-142).
    """
    n_docs = df.count()
    toks = analyzer.tokens_expr(text_col)
    pos = (
        df.select(F.col(id_col).alias("doc_id"), toks.alias("_t"))
        .select(
            "doc_id",
            F.size("_t").alias("doc_size"),
            F.posexplode("_t").alias("pos", "term"),
        )
        .filter(F.col("term").isin(terms))
    )
    per_doc = pos.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf"),
        F.min("pos").alias("first_pos"),
        F.first("doc_size").alias("doc_size"),
    )
    dfm = per_doc.groupBy("term").agg(F.count("*").alias("df"))
    return (
        per_doc.join(F.broadcast(dfm), "term")
        .select(
            "doc_id",
            "term",
            (
                F.col("tf")
                / F.col("doc_size")
                * -(F.log2(F.col("df") / F.lit(float(n_docs))))
            ).alias("kea_tfidf"),
            (F.col("first_pos") / F.col("doc_size")).alias("first_occ"),
        )
    )
