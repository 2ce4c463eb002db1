"""Stats parity: average/variance/covariance/correlation + chi-square.

Formulas from /root/reference/app/org/nlp4l/lucene/stats/Stats.scala:27-106
— note the reference uses POPULATION variance/covariance (divide by n), so
the Spark mappings are var_pop/covar_pop/corr.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def moments(df: DataFrame, col1: str, col2: str) -> DataFrame:
    """One-row frame: avg/var_pop of col1, covar_pop and corr of (col1,col2).
    (Stats.average/variance/covariance/correlationCoefficient)."""
    return df.agg(
        F.avg(col1).alias("avg1"),
        F.var_pop(col1).alias("var1"),
        F.covar_pop(col1, col2).alias("cov12"),
        F.corr(col1, col2).alias("corr12"),
    )


def chi_square(
    wc1: float, oc1: float, wc2: float, oc2: float, yates: bool = False
) -> float:
    """2x2 chi-square on word-vs-corpus counts (Stats.chiSquare, :81-106)."""
    sumwc = float(wc1 + wc2)
    sumoc = float(oc1 + oc2)
    sum1 = float(oc1 + wc1)
    sum2 = float(oc2 + wc2)
    gs = sum1 + sum2
    exp = [
        (wc1, sum1 / gs * sumwc),
        (oc1, sum1 / gs * sumoc),
        (wc2, sum2 / gs * sumwc),
        (oc2, sum2 / gs * sumoc),
    ]
    total = 0.0
    for obs, e in exp:
        d = abs(obs - e) - 0.5 if yates else obs - e
        total += d * d / e
    return total


def chi_square_cols(wc1, oc1, wc2, oc2, yates: bool = False):
    """Column version of chi_square for per-group computation in SQL."""
    sumwc = wc1 + wc2
    sumoc = oc1 + oc2
    sum1 = oc1 + wc1
    sum2 = oc2 + wc2
    gs = sum1 + sum2

    def term(obs, e):
        d = F.abs(obs - e) - 0.5 if yates else obs - e
        return d * d / e

    return (
        term(wc1, sum1 / gs * sumwc)
        + term(oc1, sum1 / gs * sumoc)
        + term(wc2, sum2 / gs * sumwc)
        + term(oc2, sum2 / gs * sumoc)
    )
