"""Learning-to-rank support (SURVEY.md §2.11 / §3.3).

Reference semantics: feature extraction round-trips to an external Solr LTR
endpoint per (qid, doc) (/root/reference/app/org/nlp4l/ltr/support/procs/
FeatureExtractor.scala:50-119); trainers are PRank (online ordinal
regression, PRankTrainer.scala:66-117) and RankingSVM (pairwise
difference-vector transform + linear SVM, RankingSVMTrainer.scala:39-92).

Rebuild:
* extract_features — the external Solr dependency is replaced by OUR index:
  per-(qid, doc) features (BM25 score, sum tf, sum idf, dl, matched-terms)
  come straight from the doc_terms/doc_lens frames and the same BM25
  formula. One scan + broadcast of the query set.
* PRank — faithful single-node reimplementation of the online algorithm
  (it is inherently sequential; the reference also runs it on one thread).
  Deterministic via seeded RNG.
* ranking_svm_pairwise — the pairwise transform as a DataFrame self-join
  per qid (the reference materializes all pairs on the driver), ready for
  pyspark.ml LinearSVC.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from nlp4l_spark.analysis import STANDARD_ANALYZER
from nlp4l_spark.search.engine import idf as bm25_idf
from nlp4l_spark.stats import Corpus

K1 = 1.2
B = 0.75


def extract_features(
    corpus: Corpus, queries: list[tuple[int, str]]
) -> DataFrame:
    """(qid, doc_id, bm25, sum_tf, sum_idf, dl, n_matched) per query-doc
    pair with >= 1 matching term — the feature-vector shape of
    DocFeature(fid, qid, docid, value) rows."""
    spark = corpus.df.sparkSession
    dt = corpus.doc_terms()
    dl = corpus.doc_lens()
    stats = dl.agg(F.count("*").alias("n"), F.sum("dl").alias("s")).collect()[0]
    n, avgdl = int(stats["n"]), stats["s"] / stats["n"]

    q_terms = [
        (qid, t)
        for qid, q in queries
        for t in sorted(set(STANDARD_ANALYZER.tokenize(q)))
    ]
    all_terms = sorted({t for _, t in q_terms})
    dfm = {
        r["term"]: r["df"]
        for r in dt.filter(F.col("term").isin(all_terms))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .collect()
    }
    rows = [
        (qid, t, bm25_idf(n, dfm[t])) for qid, t in q_terms if t in dfm
    ]
    if not rows:
        return spark.createDataFrame(
            [], "qid int, doc_id long, bm25 double, sum_tf long, "
                "sum_idf double, dl int, n_matched int",
        )
    qdf = F.broadcast(spark.createDataFrame(rows, "qid int, term string, idf double"))
    score = (
        F.col("idf")
        * F.col("tf")
        * F.lit(K1 + 1.0)
        / (F.col("tf") + F.lit(K1) * (F.lit(1 - B) + F.lit(B) * F.col("dl") / F.lit(avgdl)))
    )
    return (
        dt.join(qdf, "term")
        .join(dl, "doc_id")
        .withColumn("_s", score)
        .groupBy("qid", "doc_id")
        .agg(
            F.sum("_s").alias("bm25"),
            F.sum("tf").alias("sum_tf"),
            F.sum("idf").alias("sum_idf"),
            F.first("dl").alias("dl"),
            F.count("*").alias("n_matched"),
        )
    )


class PRank:
    """Online PRank ordinal-regression (PRankTrainer.scala:66-117):
    maxLabel ordered ranks, weight vector + thresholds b, random sample
    each iteration. Faithful including the b[last]=+inf sentinel."""

    def __init__(self, feature_num: int, max_label: int, seed: int = 42):
        self.w = np.zeros(feature_num)
        self.b = np.zeros(max_label)
        self.b[max_label - 1] = np.finfo(np.float32).max
        self.max_label = max_label
        self.rng = np.random.RandomState(seed)

    def train(self, x: np.ndarray, y: np.ndarray, num_iterations: int = 2000):
        n_thresh = self.max_label - 1
        for _ in range(1, num_iterations):
            t0 = self.rng.randint(len(x))
            f = float(self.w @ x[t0])
            if self._predict(f) != y[t0]:
                yt = np.where(y[t0] <= np.arange(1, n_thresh + 1), -1, 1)
                tau = np.where((f - self.b[:n_thresh]) * yt <= 0, yt, 0)
                self.w = self.w + tau.sum() * x[t0]
                self.b[:n_thresh] = self.b[:n_thresh] - tau
        return self.w, self.b[:n_thresh].copy()

    def _predict(self, f: float) -> int:
        for r in range(self.max_label):
            if f - self.b[r] < 0:
                return r + 1
        return self.max_label

    def predict(self, x: np.ndarray) -> int:
        return self._predict(float(self.w @ x))


def ranking_svm_pairwise(
    features: DataFrame,
    qid_col: str = "qid",
    label_col: str = "label",
    feature_cols: list[str] | None = None,
    id_col: str | None = None,
) -> DataFrame:
    """Pairwise difference-vector transform (RankingSVMTrainer.scala:48-63):
    per qid, for each doc pair with different labels emit
    (higher - lower) feature difference labeled 1. As a self-join per qid
    (distributed; the reference collects all combinations driver-side).
    With ``id_col`` the output carries (id_hi, id_lo) so pairs are
    addressable (and SQL-oracle comparable)."""
    feature_cols = feature_cols or [
        c
        for c in features.columns
        if c not in (qid_col, label_col) and c != id_col
    ]
    a = features.alias("a")
    b = features.alias("b")
    pairs = a.join(
        b,
        (F.col(f"a.{qid_col}") == F.col(f"b.{qid_col}"))
        & (F.col(f"a.{label_col}") > F.col(f"b.{label_col}")),
    )
    diff_cols = [
        (F.col(f"a.{c}") - F.col(f"b.{c}")).alias(f"d_{c}") for c in feature_cols
    ]
    id_cols = (
        [
            F.col(f"a.{id_col}").alias("id_hi"),
            F.col(f"b.{id_col}").alias("id_lo"),
        ]
        if id_col
        else []
    )
    return pairs.select(
        F.col(f"a.{qid_col}").alias(qid_col),
        *id_cols,
        F.lit(1).alias("label"),
        *diff_cols,
    )
