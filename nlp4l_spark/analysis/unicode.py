"""Unicode-capable analyzer mode: Unicode word runs + CJK bigrams.

The base contract (`analyzer.py`) is ASCII ``[a-z0-9]+`` — exact on the
fixtures, empty on any non-ASCII corpus. This mode extends it the way
Lucene's StandardAnalyzer + CJKBigramFilter pair does (reference builds
JA analysis chains via SchemaLoader / JaUserDictionaryProcessor,
/root/reference/app/org/nlp4l/framework/builtin/FeaturedProcessors.scala:302-342
— a Kuromoji dictionary feature this sandbox cannot host; CJK bigrams are
the standard dictionary-free stand-in):

contract (identical across all four engines, in order):
1. lowercase
2. isolate maximal CJK runs (Han, Hiragana, Katakana, Hangul) with spaces
3. extract maximal Unicode letter/number runs
4. a CJK run of length n>=2 emits its n-1 character bigrams, a lone CJK
   char stays a unigram; non-CJK runs pass through
5. stopword filter

Engines: Python ``re`` (``[^\\W_]+``), Spark SQL (Java regex
``[\\p{L}\\p{N}]+`` + nested array HOFs), DuckDB SQL (RE2 + list HOFs,
the correctness oracle), Arrow pandas UDF (inherited — delegates to
``tokenize``). Engine identity is pinned by
tests/test_analyzer_engines.py over a multilingual fixture.

Documented deviation vs Lucene: bigrams never span a non-CJK character
(same as Lucene), and mixed-script tokens like "abc漢" split into "abc" +
"漢" (Lucene's UAX#29 does the same). ``token_stream`` provides
positions/offsets under the same contract (bigram offsets span their two
characters), so term vectors, position-carrying posting shards and CJK
PHRASE search all work with this analyzer (tests/test_analyzer_engines).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, functions as F

from nlp4l_spark.analysis.analyzer import LUCENE_ENGLISH_STOPWORDS, Analyzer

# Han + ext-A + compat, Hiragana, Katakana, Hangul syllables — as literal
# characters so the class embeds into Java, RE2 and Python regexes alike
CJK_CLASS = (
    "぀-ヿ㐀-䶿一-鿿가-힯豈-﫿"
)
_CJK_RUN = re.compile(f"([{CJK_CLASS}]+)")
_CJK_ONLY = re.compile(f"^[{CJK_CLASS}]+$")
# \w minus underscore == Unicode letters+numbers in Python's re; the Java
# and RE2 engines spell the same class [\p{L}\p{N}] (identity tested)
_WORD_RUN = re.compile(r"[^\W_]+", re.UNICODE)


@dataclass(frozen=True)
class UnicodeCJKAnalyzer(Analyzer):
    """Analyzer with the Unicode+CJK-bigram contract. The Arrow engines
    (tokenize_udf / term_counts_udf) are inherited — they delegate to
    ``tokenize`` — so this analyzer drops into the index build path."""

    # ---- Python engine -------------------------------------------------
    def tokenize(self, text: str | None) -> list[str]:
        if not text:
            return []
        if self.lowercase:
            text = text.lower()
        text = _CJK_RUN.sub(r" \1 ", text)
        out: list[str] = []
        for tok in _WORD_RUN.findall(text):
            if len(tok) > 1 and _CJK_ONLY.match(tok):
                out.extend(tok[i : i + 2] for i in range(len(tok) - 1))
            else:
                out.append(tok)
        if self.stopwords:
            out = [t for t in out if t not in self.stopwords]
        return out

    # ---- Spark SQL engine (JVM; nested HOFs, interpreted but corpus-
    # narrow — the Arrow twin is the hot path for index builds) ---------
    def tokens_expr(self, col_sql: str) -> Column:
        src = F.expr(f"lower({col_sql})") if self.lowercase else F.expr(col_sql)
        wrapped = F.regexp_replace(src, F.lit(f"([{CJK_CLASS}]+)"), F.lit(" $1 "))
        # patterns ride through lit Columns: SQL string literals eat
        # backslashes, F.lit does not
        runs = F.regexp_extract_all(wrapped, F.lit(r"[\p{L}\p{N}]+"), F.lit(0))
        cjk = f"^[{CJK_CLASS}]+$"
        bigrams = lambda t: F.transform(  # noqa: E731
            F.sequence(F.lit(1), F.length(t) - 1),
            lambda i: t.substr(i, F.lit(2)),
        )
        toks = F.flatten(
            F.transform(
                runs,
                lambda t: F.when(
                    t.rlike(cjk) & (F.length(t) > 1), bigrams(t)
                ).otherwise(F.array(t)),
            )
        )
        return self._strip_stopwords(toks)

    # ---- DuckDB oracle engine -----------------------------------------
    def duckdb_tokens_sql(self, col_sql: str) -> str:
        src = f"lower({col_sql})" if self.lowercase else col_sql
        wrapped = (
            f"regexp_replace({src}, '([{CJK_CLASS}]+)', ' \\1 ', 'g')"
        )
        runs = f"regexp_extract_all({wrapped}, '[\\p{{L}}\\p{{N}}]+')"
        expr = (
            f"flatten(list_transform({runs}, t -> "
            f"CASE WHEN regexp_matches(t, '^[{CJK_CLASS}]+$') AND len(t) > 1 "
            f"THEN list_transform(range(1, len(t)), i -> substr(t, i::int, 2)) "
            f"ELSE [t] END))"
        )
        if self.stopwords:
            stoplist = ", ".join(f"'{w}'" for w in sorted(self.stopwords))
            expr = f"list_filter({expr}, t -> t NOT IN ({stoplist}))"
        return expr

    # ---- token stream with positions/offsets (term-vector + phrase
    # positions path) -----------------------------------------------------
    def token_stream(self, text: str | None) -> list[tuple[str, int, int, int]]:
        """[(term, position, start_offset, end_offset)]: positions over
        the FULL token stream (bigrams included) with stopword holes
        (StopFilter position-increment contract, same as the ASCII
        analyzer); offsets are character offsets into the LOWERCASED
        text — exact offsets into the original wherever lowercasing is
        length-preserving (true for CJK, Cyrillic, ASCII and standard
        accented Latin; NOT for e.g. 'İ' U+0130, which lowers to two
        characters — the same caveat the ASCII contract documents). A CJK
        bigram's offsets span its two characters. Token sequence is
        identical to ``tokenize`` (asserted in tests): instead of the
        space-wrapping used by the string engines, word runs are
        sub-split at CJK boundaries in place so offsets stay aligned."""
        if not text:
            return []
        src = text.lower() if self.lowercase else text
        out: list[tuple[str, int, int, int]] = []
        pos = 0

        def emit(term: str, start: int, end: int) -> None:
            nonlocal pos
            if not (self.stopwords and term in self.stopwords):
                out.append((term, pos, start, end))
            pos += 1

        sub = re.compile(f"[{CJK_CLASS}]+|[^{CJK_CLASS}]+")
        for m in _WORD_RUN.finditer(src):
            for sm in sub.finditer(m.group(0)):
                seg, base = sm.group(0), m.start() + sm.start()
                if _CJK_ONLY.match(seg):
                    if len(seg) == 1:
                        emit(seg, base, base + 1)
                    else:
                        for k in range(len(seg) - 1):
                            emit(seg[k : k + 2], base + k, base + k + 2)
                else:
                    emit(seg, base, base + len(seg))
        return out


UNICODE_CJK_ANALYZER = UnicodeCJKAnalyzer(stopwords=LUCENE_ENGLISH_STOPWORDS)
