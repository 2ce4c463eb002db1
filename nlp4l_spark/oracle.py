"""Single-node pure-Python oracle: tokenize -> postings dict -> BM25 top-k.

This is the *contract* the Spark engine must match rank-identically
(SURVEY.md §5.2, north_rule BASELINE.json:14). It reimplements, from the
published formulas, the semantics of:

* Lucene 7.2.1 default similarity BM25(k1=1.2, b=0.75) with
  idf = ln(1 + (N - df + 0.5)/(df + 0.5)), score summed over unique query
  terms (BooleanQuery SHOULD / OR semantics), ties broken by doc_id asc —
  the reference searcher sets no custom Similarity
  (/root/reference/app/org/nlp4l/lucene/ISearcher.scala:31-43).
* Deviation (documented, SURVEY.md §2.6): dl is exact, NOT Lucene's
  1-byte-quantized norm. Oracle and engine share exact-dl semantics.
* Index stats surface of RawReader/WordCounts
  (/root/reference/app/org/nlp4l/lucene/RawReader.scala:77-160,
   /root/reference/app/org/nlp4l/lucene/stats/WordCounts.scala:40-158).
"""

from __future__ import annotations

import heapq
import math
from collections import Counter
from dataclasses import dataclass, field

from nlp4l_spark.analysis import Analyzer, STANDARD_ANALYZER

K1 = 1.2
B = 0.75


@dataclass
class OracleIndex:
    analyzer: Analyzer = field(default_factory=lambda: STANDARD_ANALYZER)
    postings: dict[str, list[tuple[int, int]]] = field(default_factory=dict)
    doc_lens: dict[int, int] = field(default_factory=dict)

    # ---- build ----
    def add(self, doc_id: int, text: str) -> None:
        toks = self.analyzer.tokenize(text)
        self.doc_lens[doc_id] = len(toks)
        for term, tf in sorted(Counter(toks).items()):
            self.postings.setdefault(term, []).append((doc_id, tf))

    @classmethod
    def build(cls, docs: list[tuple[int, str]], analyzer: Analyzer | None = None):
        idx = cls(analyzer=analyzer or STANDARD_ANALYZER)
        for doc_id, text in sorted(docs):
            idx.add(doc_id, text)
        return idx

    # ---- stats surface (RawReader / WordCounts parity) ----
    @property
    def num_docs(self) -> int:
        return len(self.doc_lens)

    @property
    def sum_dl(self) -> int:
        return sum(self.doc_lens.values())

    @property
    def avgdl(self) -> float:
        return self.sum_dl / self.num_docs if self.num_docs else 0.0

    def df(self, term: str) -> int:
        return len(self.postings.get(term, []))

    def cf(self, term: str) -> int:
        return sum(tf for _, tf in self.postings.get(term, []))

    def uniq_terms(self) -> int:
        return len(self.postings)

    def count_prefix(self, prefix: str) -> int:
        return sum(1 for t in self.postings if t.startswith(prefix))

    def count_docset(self, doc_ids: set[int]) -> dict[str, int]:
        """WordCounts.count: sum tf per term over a docID set."""
        out: Counter[str] = Counter()
        for term, plist in self.postings.items():
            for d, tf in plist:
                if d in doc_ids:
                    out[term] += tf
        return dict(out)

    # ---- BM25 ----
    def idf(self, term: str) -> float:
        n = self.num_docs
        df = self.df(term)
        return math.log(1.0 + (n - df + 0.5) / (df + 0.5))

    def bm25_score(self, tf: int, dl: int, idf: float) -> float:
        return idf * tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / self.avgdl))

    def search(self, query: str, k: int = 10) -> list[tuple[int, float]]:
        """Top-k (doc_id, score), OR semantics over unique query terms,
        score desc then doc_id asc (Lucene tie-break)."""
        terms = sorted(set(self.analyzer.tokenize(query)))
        scores: dict[int, float] = {}
        for term in terms:
            plist = self.postings.get(term)
            if not plist:
                continue
            w = self.idf(term)
            for doc_id, tf in plist:
                scores[doc_id] = scores.get(doc_id, 0.0) + self.bm25_score(
                    tf, self.doc_lens[doc_id], w
                )
        # heap on (-score, doc_id): score desc, doc_id asc
        top = heapq.nsmallest(k, scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [(d, s) for d, s in top]
