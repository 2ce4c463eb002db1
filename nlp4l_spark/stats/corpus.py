"""Corpus: analyzed view over any (doc_id, text) DataFrame.

The stats surface (WordCounts/TFIDF parity) can run either against a built
index (IndexCatalog tables) or directly against a raw corpus DataFrame —
the reference similarly recomputes stats from term vectors or re-analysis
(/root/reference/app/org/nlp4l/lucene/stats/WordCounts.scala:40-91).

Two tokenization strategies, identical results:
* ``arrow`` — one Arrow-UDF pass emits per-doc (terms[], tfs[], dl), so the
  following explode is NARROW: the only shuffle in any downstream term agg
  is the final groupBy(term). This is the 100 TB path.
* ``sql``  — pure built-ins (regexp_extract_all + explode + groupBy),
  zero Python; used where a SQL-oracle-identical plan is preferred.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

from nlp4l_spark.analysis import Analyzer, STANDARD_ANALYZER


@dataclass
class Corpus:
    df: DataFrame
    text_col: str = "text"
    id_col: str = "doc_id"
    analyzer: Analyzer = field(default_factory=lambda: STANDARD_ANALYZER)

    def tokens(self) -> DataFrame:
        """(doc_id, tokens array<string>)"""
        return self.df.select(
            F.col(self.id_col).alias("doc_id"),
            self.analyzer.tokens_expr(self.text_col).alias("tokens"),
        )

    def doc_terms(self, method: str = "arrow") -> DataFrame:
        """(doc_id, term, tf) — the forward index."""
        if method == "arrow":
            tc = self.analyzer.term_counts_udf()
            return (
                self.df.select(
                    F.col(self.id_col).alias("doc_id"),
                    tc(F.col(self.text_col)).alias("_tc"),
                )
                .select(
                    "doc_id",
                    F.explode(F.arrays_zip("_tc.terms", "_tc.tfs")).alias("_e"),
                )
                .select(
                    "doc_id",
                    F.col("_e.terms").alias("term"),
                    F.col("_e.tfs").cast("long").alias("tf"),
                )
            )
        # sql path: explode then count — one extra shuffle but zero Python
        return (
            self.tokens()
            .select("doc_id", F.explode("tokens").alias("term"))
            .groupBy("doc_id", "term")
            .agg(F.count("*").alias("tf"))
        )

    def term_vectors(self) -> DataFrame:
        """(doc_id, term, tf, positions, start_offsets, end_offsets) —
        the reference's TermVector/PosAndOffset read model
        (/root/reference/app/org/nlp4l/lucene/Terms.scala:95-179,
        TermVector.scala:28-59). Positions keep stopword holes (Lucene
        StopFilter position increments); offsets are char spans in the
        original text. Grouped inside the Arrow UDF, so the explode is
        narrow — no shuffle."""
        tv = self.analyzer.term_vectors_udf()
        return (
            self.df.select(
                F.col(self.id_col).alias("doc_id"),
                tv(F.col(self.text_col)).alias("_tv"),
            )
            .select(
                "doc_id",
                F.explode(
                    F.arrays_zip(
                        "_tv.terms",
                        "_tv.positions",
                        "_tv.start_offsets",
                        "_tv.end_offsets",
                    )
                ).alias("_e"),
            )
            .select(
                "doc_id",
                F.col("_e.terms").alias("term"),
                F.size("_e.positions").cast("long").alias("tf"),
                F.col("_e.positions").alias("positions"),
                F.col("_e.start_offsets").alias("start_offsets"),
                F.col("_e.end_offsets").alias("end_offsets"),
            )
        )

    def doc_lens(self) -> DataFrame:
        """(doc_id, dl) — dl counts post-analysis tokens (exact, unquantized;
        see SURVEY.md §2.6 on the deliberate norm-quantization deviation)."""
        return self.tokens().select(
            "doc_id", F.size("tokens").cast("int").alias("dl")
        )
