"""TF-IDF parity surface: tf modes n/l/m/b/L/w × idf modes n/t/T/p/P.

Formulas replicated exactly from the reference
(/root/reference/app/org/nlp4l/lucene/stats/TFIDF.scala:136-197):

  tf  n: v            l: 1+ln(v)        m: a + a*v/maxTF
      b: 1 if v>0     L: (1+ln(v))/(1+ln(aveTF))   w: 1+ln(v) if v>0 else 0
  idf n: 1            t: ln(N/df)       T: ln((N+1)/(df+1))
      p: max(0, ln((N-df)/df))          P: max(0, ln((N+1-(df+1))/(df+1)))

Weights are tf * boost * idf; vectors are over a sorted feature-word vocab
(TFIDF.tfIdfVector, :200-205). Python scalar versions power the golden unit
tests; Column versions build distributed (doc_id, term, weight) frames with
the df map as a broadcast join — the stats DataFrame is tiny relative to
the corpus (north_star: stats "materialized as broadcast DataFrames").
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, functions as F

from nlp4l_spark.stats.corpus import Corpus

TF_MODES = ("n", "l", "m", "b", "L", "w")
IDF_MODES = ("n", "t", "T", "p", "P")


# ---------------- scalar (oracle/golden) versions ----------------------- #
def tf_value(
    v: float,
    mode: str,
    max_tf: float | None = None,
    a: float = 0.4,
    ave_tf: float | None = None,
) -> float:
    if mode == "n":
        return float(v)
    if mode == "l":
        return 1.0 + math.log(v)
    if mode == "m":
        if not 0.0 <= a <= 1.0:
            raise ValueError("a parameter must be in between 0.0 to 1.0")
        if max_tf is None:
            raise ValueError("maxTF parameter is required.")
        return a + (a * v) / float(max_tf)
    if mode == "b":
        return 1.0 if v > 0 else 0.0
    if mode == "L":
        if ave_tf is None:
            raise ValueError("aveTF parameter is required.")
        return (1.0 + math.log(v)) / (1.0 + math.log(ave_tf))
    if mode == "w":
        return 1.0 + math.log(v) if v > 0 else 0.0
    raise ValueError(f"Unknown notation: {mode}")


def idf_value(df: float, mode: str, num_docs: int | None = None) -> float:
    if mode == "n":
        return 1.0
    if num_docs is None:
        raise ValueError("numDocs parameter is required.")
    if mode == "t":
        return math.log(num_docs / float(df))
    if mode == "T":
        return math.log((num_docs + 1) / float(df + 1))
    if mode == "p":
        # df == N -> log(0) = -inf in the reference's JVM math -> max picks 0
        r = (num_docs - df) / float(df)
        return max(0.0, math.log(r)) if r > 0 else 0.0
    if mode == "P":
        r = (num_docs + 1 - (df + 1)) / float(df + 1)
        return max(0.0, math.log(r)) if r > 0 else 0.0
    raise ValueError(f"Unknown notation: {mode}")


def tf_idf_vector(
    count_map: dict[str, int],
    words: set[str],
    tf_mode: str,
    smth_term: float,
    idf_mode: str,
    term_boosts: dict[str, float],
    num_docs: int,
    max_tf: int,
    df_map: dict[str, int],
) -> list[float]:
    """Index-free vector (TFIDF.scala:200-205) — the golden unit case."""
    ave_tf = (
        sum(count_map.values()) / len(count_map) if tf_mode == "L" else None
    )
    out = []
    for w in sorted(words):
        if w in count_map:
            out.append(
                tf_value(count_map[w], tf_mode, max_tf, smth_term, ave_tf)
                * term_boosts.get(w, 1.0)
                * idf_value(df_map[w], idf_mode, num_docs)
            )
        else:
            out.append(0.0)
    return out


# ---------------- distributed (Column) versions -------------------------- #
def tf_col(
    v: Column, mode: str, max_tf: Column | None = None, a: float = 0.4,
    ave_tf: Column | None = None,
) -> Column:
    if mode == "n":
        return v.cast("double")
    if mode == "l":
        return F.lit(1.0) + F.log(v)
    if mode == "m":
        return F.lit(a) + (F.lit(a) * v) / max_tf
    if mode == "b":
        return F.when(v > 0, 1.0).otherwise(0.0)
    if mode == "L":
        return (F.lit(1.0) + F.log(v)) / (F.lit(1.0) + F.log(ave_tf))
    if mode == "w":
        return F.when(v > 0, F.lit(1.0) + F.log(v)).otherwise(0.0)
    raise ValueError(f"Unknown notation: {mode}")


def idf_col(df: Column, mode: str, num_docs: int | None = None) -> Column:
    if mode == "n":
        return F.lit(1.0)
    n = F.lit(float(num_docs))
    if mode == "t":
        return F.log(n / df)
    if mode == "T":
        return F.log((n + 1) / (df + 1))
    if mode == "p":
        return F.greatest(F.lit(0.0), F.log((n - df) / df))
    if mode == "P":
        return F.greatest(F.lit(0.0), F.log((n + 1 - (df + 1)) / (df + 1)))
    raise ValueError(f"Unknown notation: {mode}")


def tf_idf_weights(
    corpus: Corpus,
    tf_mode: str = "n",
    idf_mode: str = "t",
    features: list[str] | None = None,
    term_boosts: dict[str, float] | None = None,
    a: float = 0.4,
) -> DataFrame:
    """(doc_id, term, weight) — distributed TF-IDF.

    df per term is aggregated once and broadcast-joined back onto the
    doc_terms frame; num_docs is a scalar. Feature restriction prunes
    BEFORE the join so the shuffle only carries feature terms.
    """
    dt = corpus.doc_terms()
    if features is not None:
        dt = dt.filter(F.col("term").isin(list(features)))
    num_docs = corpus.df.count()
    df_map = dt.groupBy("term").agg(F.count("*").alias("df"))

    per_doc = None
    if tf_mode == "m":
        per_doc = dt.groupBy("doc_id").agg(F.max("tf").alias("_max_tf"))
    elif tf_mode == "L":
        per_doc = dt.groupBy("doc_id").agg(F.avg("tf").alias("_ave_tf"))

    out = dt.join(F.broadcast(df_map), "term")
    if per_doc is not None:
        out = out.join(per_doc, "doc_id")
    tf_expr = tf_col(
        F.col("tf"),
        tf_mode,
        max_tf=F.col("_max_tf") if tf_mode == "m" else None,
        a=a,
        ave_tf=F.col("_ave_tf") if tf_mode == "L" else None,
    )
    w = tf_expr * idf_col(F.col("df"), idf_mode, num_docs)
    if term_boosts:
        boost = F.create_map(
            *[F.lit(x) for kv in term_boosts.items() for x in kv]
        )
        w = w * F.coalesce(boost[F.col("term")], F.lit(1.0))
    return out.select("doc_id", "term", w.alias("weight"))


def tf_vectors(
    corpus: Corpus, features: list[str], doc_ids: DataFrame | None = None
) -> DataFrame:
    """Per-doc TF vector over the sorted feature vocabulary
    (TFIDF.tfVector/tfVectors, TFIDF.scala:37-54), as dense
    (doc_id, term, tf) rows with explicit zeros — the exploded form of the
    reference's fixed-width vector. The vocab is a tiny broadcast cross
    join; actual counts arrive via a left join pruned to feature terms
    before the shuffle."""
    spark = corpus.df.sparkSession
    vocab = spark.createDataFrame(
        [(t,) for t in sorted(set(features))], "term string"
    )
    docs = corpus.df.select(F.col(corpus.id_col).alias("doc_id"))
    if doc_ids is not None:
        docs = docs.join(doc_ids, "doc_id", "left_semi")
    counts = corpus.doc_terms().filter(F.col("term").isin(list(features)))
    if doc_ids is not None:
        counts = counts.join(doc_ids, "doc_id", "left_semi")
    return (
        docs.crossJoin(F.broadcast(vocab))
        .join(counts, ["doc_id", "term"], "left")
        .select(
            "doc_id", "term", F.coalesce(F.col("tf"), F.lit(0)).cast("long").alias("tf")
        )
    )
