"""Document classification bridge (SURVEY.md §2.11).

Reference semantics: LabeledPointProcessor featurizes text with the
framework's OWN TF-IDF (not MLlib's) into LIBSVM rows, TrainAndModel trains
NaiveBayes / LogisticRegression / DecisionTree / RandomForest on a 70/30
split and reports precision, ClassificationProcessor re-vectorizes new text
with the SAVED df/params and predicts
(/root/reference/app/org/nlp4l/framework/builtin/spark/mllib/
LabeledPointProcessor.scala:63-176, TrainAndModelProcessor.scala:57-151,
ClassificationProcessor.scala:54-115).

Rebuild: featurization uses our analyzer + TFIDF formulas (the contract),
emitted as pyspark.ml vectors; training uses pyspark.ml. The fitted
Featurizer carries vocabulary+df (the reference's words/params sidecar
files) so prediction re-vectorizes identically.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nlp4l_spark.analysis import STANDARD_ANALYZER
from nlp4l_spark.stats import Corpus
from nlp4l_spark.stats.tfidf import idf_value, tf_value


@dataclass
class Featurizer:
    """Vocabulary + df snapshot: the reference's `words`/`params` sidecars
    (LabeledPointProcessor.scala:150-176). Broadcast-sized by construction
    (vocab pruned via min_df / max_df_percent / top_k, CommonProcessor
    selectFeatures semantics)."""

    vocab: list[str]
    df_map: dict[str, int]
    num_docs: int
    tf_mode: str = "n"
    idf_mode: str = "t"

    def transform(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """Adds a pyspark.ml SparseVector column `features`."""
        from pyspark.ml.linalg import SparseVector, VectorUDT

        vocab_index = {w: i for i, w in enumerate(self.vocab)}
        dim = len(self.vocab)
        idf_w = {
            w: idf_value(self.df_map[w], self.idf_mode, self.num_docs)
            for w in self.vocab
        }
        analyzer = STANDARD_ANALYZER
        tf_mode = self.tf_mode

        @F.udf(VectorUDT())
        def vectorize(text):
            from collections import Counter

            counts = Counter(analyzer.tokenize(text))
            pairs = sorted(
                (vocab_index[w], tf_value(c, tf_mode) * idf_w[w])
                for w, c in counts.items()
                if w in vocab_index
            )
            return SparseVector(dim, [i for i, _ in pairs], [v for _, v in pairs])

        return df.withColumn("features", vectorize(F.col(text_col)))


def select_features(
    corpus: Corpus,
    *,
    min_df: int = 1,
    max_df_percent: float = 100.0,
    top_k: int | None = None,
) -> DataFrame:
    """Vocabulary pruning (CommonProcessor.selectFeatures,
    spark/mllib/CommonProcessor.scala:31-39): df >= minDF ∧ df/N <= maxDF%
    ∧ optionally top-K by df."""
    n = corpus.df.count()
    dfm = corpus.doc_terms().groupBy("term").agg(F.count("*").alias("df"))
    out = dfm.filter(
        (F.col("df") >= min_df)
        & (F.col("df") / F.lit(float(n)) <= max_df_percent / 100.0)
    )
    if top_k is not None:
        out = out.orderBy(F.desc("df"), F.asc("term")).limit(top_k)
    return out


def fit_featurizer(
    corpus: Corpus,
    *,
    min_df: int = 1,
    max_df_percent: float = 100.0,
    top_k: int | None = None,
    tf_mode: str = "n",
    idf_mode: str = "t",
) -> Featurizer:
    rows = select_features(
        corpus, min_df=min_df, max_df_percent=max_df_percent, top_k=top_k
    ).collect()
    vocab = sorted(r["term"] for r in rows)
    return Featurizer(
        vocab=vocab,
        df_map={r["term"]: r["df"] for r in rows},
        num_docs=corpus.df.count(),
        tf_mode=tf_mode,
        idf_mode=idf_mode,
    )


def label_map(df: DataFrame, label_col: str) -> DataFrame:
    """selectLabelMap (CommonProcessor.scala:41-47): distinct labels ->
    dense ids, ordered."""
    from pyspark.sql import Window

    w = Window.orderBy(label_col)
    return (
        df.select(label_col)
        .distinct()
        .withColumn("label_id", F.row_number().over(w) - 1)
    )


def train_classifier(
    featurized: DataFrame,
    algorithm: str = "naive_bayes",
    *,
    label_col: str = "label_id",
    seed: int = 42,
    train_fraction: float = 0.7,
):
    """TrainAndModelProcessor (:57-151): 70/30 split, train, report
    precision. Returns (model, precision)."""
    from pyspark.ml.classification import (
        DecisionTreeClassifier,
        LogisticRegression,
        NaiveBayes,
        RandomForestClassifier,
    )
    from pyspark.ml.evaluation import MulticlassClassificationEvaluator

    algos = {
        "naive_bayes": NaiveBayes(labelCol=label_col, featuresCol="features"),
        "logistic_regression": LogisticRegression(
            labelCol=label_col, featuresCol="features"
        ),
        "decision_tree": DecisionTreeClassifier(
            labelCol=label_col, featuresCol="features"
        ),
        "random_forest": RandomForestClassifier(
            labelCol=label_col, featuresCol="features", seed=seed
        ),
    }
    train, test = featurized.randomSplit(
        [train_fraction, 1.0 - train_fraction], seed=seed
    )
    model = algos[algorithm].fit(train)
    evaluator = MulticlassClassificationEvaluator(
        labelCol=label_col, predictionCol="prediction", metricName="accuracy"
    )
    test_pred = model.transform(test)
    precision = evaluator.evaluate(test_pred) if test_pred.count() else float("nan")
    return model, precision


def classify(
    model, featurizer: Featurizer, df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """ClassificationProcessor (:54-115): vectorize NEW text with the saved
    vocabulary/df and predict."""
    return model.transform(featurizer.transform(df, text_col))
