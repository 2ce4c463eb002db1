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

import pandas as pd

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

    def _idf_weights(self) -> dict[str, float]:
        return {
            w: idf_value(self.df_map[w], self.idf_mode, self.num_docs)
            for w in self.vocab
        }

    def transform(
        self,
        df: DataFrame,
        text_col: str = "text",
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Adds a pyspark.ml vector column ``features`` (tf*idf over the
        fitted vocabulary) with a 100% JVM plan: analyzer tokens are a
        codegen regexp, the vocabulary join is a broadcast, tf-mode
        arithmetic is SQL (per-doc max/ave tf for the m/L modes come from
        one aggregate), and the vector materializes via map-lookup dense
        assembly + ``pyspark.ml.functions.array_to_vector`` — no Python
        eval node anywhere (plan-guarded in tests/test_plans.py). This
        replaces a row-at-a-time ``@F.udf(VectorUDT())`` that was the
        slowest node in the repo at scale.

        Dense-width note: the vector is dim-wide per doc; ``fit_featurizer``
        prunes the vocabulary (min_df/max_df/top_k, the reference's
        CommonProcessor.selectFeatures), so dim is broadcast-sized by
        construction. Requires a unique ``id_col`` to join features back;
        use ``transform_arrow`` for id-less frames."""
        from pyspark.ml.functions import array_to_vector

        if not self.vocab:
            raise ValueError("empty vocabulary; refit with looser pruning")
        if id_col not in df.columns:
            return self.transform_arrow(df, text_col)
        dim = len(self.vocab)
        idf_w = self._idf_weights()
        spark = df.sparkSession
        vocab_df = F.broadcast(
            spark.createDataFrame(
                [(w, i, idf_w[w]) for i, w in enumerate(self.vocab)],
                "term string, idx int, idf double",
            )
        )
        toks = STANDARD_ANALYZER.tokens_col(text_col)
        counts = (
            df.select(id_col, F.explode(toks).alias("term"))
            .groupBy(id_col, "term")
            .agg(F.count("*").cast("double").alias("c"))
        )
        mode, c = self.tf_mode, F.col("c")
        if mode in ("m", "L"):
            from pyspark.sql import Window

            w = Window.partitionBy(id_col)
            counts = counts.withColumn("max_tf", F.max("c").over(w)).withColumn(
                "ave_tf", F.avg("c").over(w)
            )
        tf = {
            "n": c,
            "l": F.lit(1.0) + F.log(c),
            "b": F.lit(1.0),
            "w": F.lit(1.0) + F.log(c),  # c > 0 after the count
            "m": F.lit(0.4) + F.lit(0.4) * c / F.col("max_tf"),
            "L": (F.lit(1.0) + F.log(c)) / (F.lit(1.0) + F.log(F.col("ave_tf"))),
        }[mode]
        # collision-safe internal name: the caller's frame may have 'm'
        mcol = "__feat_m"
        entries = (
            counts.join(vocab_df, "term")
            .select(id_col, F.struct("idx", (tf * F.col("idf")).alias("w")).alias("e"))
            .groupBy(id_col)
            .agg(F.map_from_entries(F.collect_list("e")).alias(mcol))
        )
        empty_map = F.map_from_arrays(
            F.array().cast("array<int>"), F.array().cast("array<double>")
        )
        # map[i] is KEY lookup (the 0-based vocab idx), missing key -> null
        dense = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(
                F.coalesce(F.col(mcol), empty_map)[i], F.lit(0.0)
            ),
        )
        return (
            df.join(entries, id_col, "left")
            .withColumn("features", array_to_vector(dense))
            .drop(mcol)
        )

    def transform_arrow(self, df: DataFrame, text_col: str = "text") -> DataFrame:
        """Arrow-batched fallback for frames without a unique id column:
        one pandas pass emits the dense weight array, the VectorUDT wrap
        stays JVM (array_to_vector). Never row-at-a-time Python."""
        from pyspark.ml.functions import array_to_vector

        vocab_index = {w: i for i, w in enumerate(self.vocab)}
        dim = len(self.vocab)
        idf_w = self._idf_weights()
        analyzer = STANDARD_ANALYZER
        tf_mode = self.tf_mode

        @F.pandas_udf(T.ArrayType(T.DoubleType()))
        def weights(texts: pd.Series) -> pd.Series:
            from collections import Counter

            out = []
            for t in texts:
                counts = Counter(analyzer.tokenize(t))
                vocab_counts = {
                    w: c for w, c in counts.items() if w in vocab_index
                }
                # m/L doc stats over ALL terms, matching the JVM path
                # (window before the vocab join) and the reference
                max_tf = max(counts.values(), default=1)
                ave_tf = (
                    sum(counts.values()) / len(counts) if counts else 1.0
                )
                vec = [0.0] * dim
                for w, cnt in vocab_counts.items():
                    vec[vocab_index[w]] = (
                        tf_value(cnt, tf_mode, max_tf=max_tf, ave_tf=ave_tf)
                        * idf_w[w]
                    )
                out.append(vec)
            return pd.Series(out)

        return df.withColumn(
            "features", array_to_vector(weights(F.col(text_col)))
        )


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
