"""MDLP entropy-minimization discretizer (Fayyad & Irani 1993).

Reference semantics (what, not how): the vendored Spark-1.x RDD
implementation at /root/reference/app/org/apache/spark/mllib/feature/
MDLPDiscretizer.scala:41-494 — per-feature candidate thresholds from
class-boundary points, recursive binary splits accepted by the MDL
criterion, `maxBins` cap. That implementation hand-rolls broadcast +
reduceByKey + sortByKey + mapPartitionsWithIndex; the rebuild is two
DataFrame ops:

1. one `groupBy(feature, value)` building per-value class histograms
   (map-side partial aggregation handles the shuffle; the per-feature
   histogram size is bounded by `max_candidates` via quantile pre-binning,
   exactly the role of the reference's `maxByPart` chunking), then
2. one `applyInPandas` per feature running the pure-NumPy recursive MDLP —
   a feature's histogram is tiny by construction, so the parallel unit is
   the feature, and 10^12 input rows never leave the executors unaggregated.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_CUTS_SCHEMA = T.StructType(
    [
        T.StructField("feature", T.IntegerType()),
        T.StructField("cuts", T.ArrayType(T.DoubleType())),
    ]
)


def _entropy(counts: np.ndarray) -> float:
    n = counts.sum()
    if n == 0:
        return 0.0
    p = counts[counts > 0] / n
    return float(-(p * np.log2(p)).sum())


def _mdlp_cuts(values: np.ndarray, hist: np.ndarray, max_splits: int) -> list[float]:
    """Recursive MDLP on a (sorted distinct values, per-value class
    histogram) summary. Candidate cuts are class-boundary midpoints
    (Fayyad's theorem: optimal cuts lie on boundary points)."""
    cuts: list[float] = []

    def recurse(lo: int, hi: int, depth: int) -> None:
        # [lo, hi) range over the distinct-value axis
        if hi - lo < 2 or len(cuts) >= max_splits:
            return
        total = hist[lo:hi].sum(axis=0)
        n = total.sum()
        ent_s = _entropy(total)
        # prefix class counts -> entropy of every candidate split
        prefix = np.cumsum(hist[lo:hi], axis=0)
        best_gain, best_i = -1.0, -1
        # boundary points (Fayyad): skip the cut between adjacent values
        # only when both are pure AND of the same single class
        h = hist[lo:hi]
        nz = h > 0
        pure = nz.sum(axis=1) == 1
        same_class = np.all(nz[:-1] == nz[1:], axis=1)
        changed = ~(pure[:-1] & pure[1:] & same_class)
        for i in np.flatnonzero(changed) + 1:  # split BEFORE value lo+i
            left = prefix[i - 1]
            right = total - left
            nl, nr = left.sum(), right.sum()
            if nl == 0 or nr == 0:
                continue
            ent = (nl * _entropy(left) + nr * _entropy(right)) / n
            gain = ent_s - ent
            if gain > best_gain:
                best_gain, best_i = gain, int(i)
        if best_i < 0:
            return
        # MDL acceptance criterion
        left = prefix[best_i - 1]
        right = total - left
        k = int((total > 0).sum())
        k1 = int((left > 0).sum())
        k2 = int((right > 0).sum())
        e, e1, e2 = ent_s, _entropy(left), _entropy(right)
        delta = math.log2(3.0**k - 2.0) - (k * e - k1 * e1 - k2 * e2)
        if best_gain <= (math.log2(n - 1) + delta) / n:
            return
        cut = (values[lo + best_i - 1] + values[lo + best_i]) / 2.0
        cuts.append(float(cut))
        recurse(lo, lo + best_i, depth + 1)
        recurse(lo + best_i, hi, depth + 1)

    recurse(0, len(values), 0)
    return sorted(cuts)


def fit_mdlp(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    max_bins: int = 50,
    max_candidates: int = 10_000,
) -> DataFrame:
    """(feature, cuts array<double>) — MDLP cut points per feature column.

    ``max_bins`` caps accepted splits per feature (reference `maxBins`);
    ``max_candidates`` caps the per-feature distinct-value histogram by
    quantile pre-binning so the per-feature task is always bounded.
    """
    spark = df.sparkSession
    n_labels_df = df.select(label_col).distinct()
    labels = sorted(r[0] for r in n_labels_df.collect())
    label_idx = {v: i for i, v in enumerate(labels)}
    n_labels = len(labels)

    # normalize to long form (feature idx, value, label idx)
    long_df = df.select(
        F.posexplode(
            F.array(*[F.col(c).cast("double") for c in feature_cols])
        ).alias("feature", "value"),
        F.col(label_col).alias("_lbl"),
    )
    lbl_map = F.create_map(
        *[x for v, i in label_idx.items() for x in (F.lit(v), F.lit(i))]
    )
    long_df = long_df.select("feature", "value", lbl_map[F.col("_lbl")].alias("label"))

    # histogram: one shuffle, partial agg does the heavy lifting map-side
    hist = long_df.groupBy("feature", "value", "label").agg(
        F.count("*").alias("cnt")
    )

    max_splits = max_bins - 1
    n_feat = len(feature_cols)

    def fit(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        feat = int(key[0])
        pdf = pdf.dropna(subset=["value"])
        if pdf.empty:
            return pd.DataFrame({"feature": [feat], "cuts": [[]]})
        values = np.sort(pdf["value"].unique())
        if len(values) > max_candidates:
            # quantile pre-binning: snap values to bounded representatives
            qs = np.quantile(values, np.linspace(0, 1, max_candidates))
            idx = np.searchsorted(qs, pdf["value"].to_numpy(), side="right") - 1
            pdf = pdf.assign(value=qs[np.clip(idx, 0, len(qs) - 1)])
            values = np.sort(pdf["value"].unique())
        h = np.zeros((len(values), n_labels), dtype=np.int64)
        vpos = {v: i for i, v in enumerate(values.tolist())}
        for v, l, c in zip(pdf["value"], pdf["label"], pdf["cnt"]):
            h[vpos[float(v)], int(l)] += int(c)
        return pd.DataFrame(
            {"feature": [feat], "cuts": [_mdlp_cuts(values, h, max_splits)]}
        )

    fitted = hist.groupBy("feature").applyInPandas(fit, _CUTS_SCHEMA)
    # features with no rows at all (all-null) still get an empty row
    return (
        spark.range(n_feat)
        .select(F.col("id").cast("int").alias("feature"))
        .join(fitted, "feature", "left")
        .select(
            "feature",
            F.coalesce("cuts", F.array().cast("array<double>")).alias("cuts"),
        )
    )


def transform_mdlp(
    df: DataFrame,
    cuts_df: DataFrame,
    feature_cols: list[str],
    *,
    out_suffix: str = "_bin",
) -> DataFrame:
    """Apply fitted cuts: each feature value -> bin index (0..len(cuts)).
    The cuts table is tiny -> collected + inlined as literals so binning is
    pure JVM (no join, no Python)."""
    cuts = {r["feature"]: list(r["cuts"]) for r in cuts_df.collect()}
    out = df
    for i, c in enumerate(feature_cols):
        arr = F.array(*[F.lit(float(x)) for x in cuts.get(i, [])])
        out = out.withColumn(
            c + out_suffix,
            F.aggregate(
                arr,
                F.lit(0),
                lambda acc, cut: acc
                + F.when(F.col(c).cast("double") >= cut, 1).otherwise(0),
            ),
        )
    return out
