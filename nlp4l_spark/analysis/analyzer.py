"""Analyzer: the tokenization/normalization contract of the engine.

Reference semantics (what, not how): Lucene analysis chains built by
``SchemaLoader.buildAnalyzer`` (/root/reference/app/org/nlp4l/lucene/
SchemaLoader.scala:98-149) — char filters -> tokenizer -> token filters.
The indexed-text pipeline used by every golden test is ``StandardAnalyzer``:
UAX#29 word break + lowercase + the 33-word English stop set
(/root/reference/test/org/nlp4l/lucene/RawReaderSpec.scala:30,
 stats/TFIDFSuite.scala:33).

Our contract (documented deviation, pinned by the pure-Python oracle, see
SURVEY.md §7.3): tokens are maximal ASCII ``[a-z0-9]+`` runs of the
lowercased text. This is identical to UAX#29 on the fixture/synthetic
alphabet (ASCII letters, digits, whitespace incl. U+3000, and punctuation)
and is expressible 1:1 in Spark SQL, DuckDB SQL (the correctness oracle),
and NumPy/pandas.

Two execution engines produce identical tokens:

* ``tokens_col`` — pure Spark SQL expressions (JVM, whole-stage codegen;
  zero Python in the hot path). Preferred for ad-hoc queries.
* ``tokenize_udf`` / ``term_counts_udf`` — Arrow-vectorized pandas UDFs
  (the ``north_star`` index-build path; one pass computes per-doc term
  counts so the explode after it is narrow).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

import pandas as pd

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Lucene's StopAnalyzer.ENGLISH_STOP_WORDS_SET (Lucene 7.2.1), identical to
# /root/reference/test/resources/org/nlp4l/lucene/stopwords_en.txt
LUCENE_ENGLISH_STOPWORDS: frozenset[str] = frozenset(
    """a an and are as at be but by for if in into is it no not of on or
    such that the their then there these they this to was will with""".split()
)

TOKEN_PATTERN = r"[a-z0-9]+"
_TOKEN_RE = re.compile(TOKEN_PATTERN)

# ---- UAX#29 word-break mode (round 3) ------------------------------------
# A closer match to Lucene's StandardTokenizer (UAX#29 default rules) on
# the Latin contract alphabet, as ONE regex valid in Python re, Java
# regex (Spark), and RE2 (DuckDB) — so it must avoid lookarounds (RE2 has
# none). The trick: encode the word-break automaton as typed runs, where
# a mid-token joiner is only consumable when the run on BOTH sides has
# the right type:
#   WB6/WB7   letter  × ['’.] × letter   (MidLetter/MidNumLet/Single_Quote:
#             don't, u.s.a, o’brien stay single tokens)
#   WB11/WB12 numeric × [.,'’] × numeric (MidNum/MidNumLet/Single_Quote:
#             3.14, 1,000, 1'000 stay single tokens)
#   WB9/WB10  letter × digit mixes freely (b2b, x86)
#   Extend    combining marks U+0300-U+036F attach to the preceding char
#             (cafe + U+0301 is one token, mark kept)
# A joiner with mismatched sides ("x.5", "a,b") or at an edge ("foo.",
# "'bar") breaks, exactly as UAX#29 prescribes. Hyphens are NOT joiners
# (UAX#29 breaks "state-of-the-art" into four words — so does Lucene).
_UAX_L = "[a-z][\u0300-\u036f]*"
_UAX_D = "[0-9][\u0300-\u036f]*"
UAX29_TOKEN_PATTERN = (
    f"(?:{_UAX_L}(?:['’.]{_UAX_L}|{_UAX_L})*"
    f"|{_UAX_D}(?:[.,'’]{_UAX_D}|{_UAX_D})*)+"
)

# ASCII folding (Lucene ASCIIFoldingFilter, the Latin-1 Supplement /
# Latin Extended-A subset): single-char foldings go through translate(),
# the three multi-char foldings (ae/oe/ss) through replace(); both exist
# verbatim in Spark SQL, DuckDB SQL, and Python, so the folded contract
# stays engine-identical. Applied AFTER lowercasing, so only lowercase
# source chars are listed.
_FOLD_PAIRS = [
    ("àáâãäåāăą", "a"),
    ("çćč", "c"),
    ("èéêëēėę", "e"),
    ("ìíîïīį", "i"),
    ("ñń", "n"),
    ("òóôõöōø", "o"),
    ("ùúûüū", "u"),
    ("ýÿ", "y"),
    ("šś", "s"),
    ("žźż", "z"),
    ("ł", "l"),
    ("đ", "d"),
    ("ğ", "g"),
    ("ţ", "t"),
]
FOLD_MULTI = (("æ", "ae"), ("œ", "oe"), ("ß", "ss"))
FOLD_FROM = "".join(src for src, _ in _FOLD_PAIRS)
FOLD_TO = "".join(dst * len(src) for src, dst in _FOLD_PAIRS)
_FOLD_TABLE = str.maketrans(FOLD_FROM, FOLD_TO)


def load_stopwords(path: str, comment_char: str = "#") -> frozenset[str]:
    """Stopword file loader: one word per line, ``#`` comments, blank lines
    ignored (reference loader: StopWordsUtil.stopwords,
    /root/reference/app/org/nlp4l/framework/builtin/FeaturedProcessors.scala:189-213).
    """
    words: set[str] = set()
    with open(path, encoding="utf-8") as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith(comment_char):
                continue
            words.add(line.split(",")[0].strip())
    return frozenset(words)


@dataclass(frozen=True)
class Analyzer:
    """A declarative analyzer spec (reference: Schema/FieldType per-field
    analyzers, /root/reference/app/org/nlp4l/lucene/Schema.scala:45-90)."""

    lowercase: bool = True
    token_pattern: str = TOKEN_PATTERN
    stopwords: frozenset[str] = field(default_factory=frozenset)
    # Lucene ASCIIFoldingFilter (diacritics -> ASCII before tokenizing);
    # offsets in token_stream then refer to the folded text (its length
    # shifts only at the ae/oe/ss multi-char foldings)
    ascii_fold: bool = False
    # Index-time synonym injection (Lucene SynonymFilter with one-way
    # single-token rules, "dup => duplicate"): each (term, injected)
    # pair emits ``injected`` at the SAME position as ``term``
    # (posinc 0), after stop filtering. Norm semantics follow
    # BM25Similarity's discountOverlaps=true default: injected tokens
    # do NOT count toward dl (see term_counts_udf), but DO carry tf and
    # positions (phrases match through either variant).
    synonyms: tuple[tuple[str, str], ...] = ()
    # Lucene ShingleFilter (word n-grams, outputUnigrams=true, token
    # separator "_"): shingles are built over the stop-filtered
    # PRE-synonym stream and appended after the unigram stream.
    # Deviation (documented): no "_" filler tokens at stopword holes —
    # shingles join across holes. Shingles never count toward dl
    # (the discountOverlaps convention, like synonyms).
    shingle_size: int = 0
    # Lucene EdgeNGramTokenFilter(min, max) with preserveOriginal: each
    # emitted token is REPLACED by its prefixes of length
    # min..min(max, len(token)), plus the original token when longer
    # than max — the search-as-you-type index analyzer. Tokens shorter
    # than min emit nothing. Edge grams never count toward dl.
    edge_ngrams: tuple[int, ...] = ()

    def _normalize(self, text: str) -> str:
        if self.lowercase:
            text = text.lower()
        if self.ascii_fold:
            for src, dst in FOLD_MULTI:
                text = text.replace(src, dst)
            text = text.translate(_FOLD_TABLE)
        return text

    # ---- driver-side / oracle path (plain Python; used for query strings
    # and the single-node oracle, never on the distributed hot path) ----
    def _base_tokens(self, text: str | None) -> list[str]:
        """Tokens BEFORE synonym injection — the dl/norm stream
        (discountOverlaps: overlapping synonym tokens never count toward
        document length)."""
        if not text:
            return []
        text = self._normalize(text)
        toks = re.findall(self.token_pattern, text)
        if self.stopwords:
            toks = [t for t in toks if t not in self.stopwords]
        return toks

    def tokenize(self, text: str | None) -> list[str]:
        base = self._base_tokens(text)
        out = base
        if self.synonyms:
            syn: dict[str, list[str]] = {}
            for k, v in self.synonyms:
                syn.setdefault(k, []).append(v)
            out = []
            for t in base:
                out.append(t)
                out.extend(syn.get(t, ()))
        if self.shingle_size >= 2:
            n = self.shingle_size
            out = out + [
                "_".join(base[i : i + n]) for i in range(len(base) - n + 1)
            ]
        if self.edge_ngrams:
            mn, mx = self.edge_ngrams
            edged: list[str] = []
            for t in out:
                if len(t) < mn:
                    continue
                edged.extend(t[:k] for k in range(mn, min(mx, len(t)) + 1))
                if len(t) > mx:
                    edged.append(t)
            out = edged
        return out

    # ---- Spark SQL engine (JVM-side, codegen; no Python) ----
    def tokens_col(self, col: Column | str) -> Column:
        """Column[array<string>] of analyzed tokens, all built-ins
        (regexp_extract_all runs JVM-side inside whole-stage codegen)."""
        name = col if isinstance(col, str) else None
        if name is None:
            raise TypeError("tokens_col takes a column NAME (SQL identifier)")
        return self.tokens_expr(name)

    def _normalize_sql(self, col_sql: str) -> str:
        """The ``_normalize`` chain as a SQL expression — the SAME string
        is valid Spark SQL and DuckDB SQL (lower/replace/translate exist
        identically in both)."""
        src = f"lower({col_sql})" if self.lowercase else col_sql
        if self.ascii_fold:
            for s, d in FOLD_MULTI:
                src = f"replace({src}, '{s}', '{d}')"
            src = f"translate({src}, '{FOLD_FROM}', '{FOLD_TO}')"
        return src

    def tokens_expr(self, col_sql: str) -> Column:
        """Analyzed tokens from a SQL expression via regexp_extract_all
        (still JVM codegen — the pattern rides as a Column literal, so
        quote-bearing patterns like UAX29_TOKEN_PATTERN need no SQL
        string escaping)."""
        src = self._normalize_sql(col_sql)
        toks = F.regexp_extract_all(F.expr(src), F.lit(self.token_pattern), F.lit(0))
        base = self._strip_stopwords(toks)
        out = self._expand_synonyms(base)
        if self.shingle_size >= 2:
            out = F.concat(out, self._shingles_expr(base))
        if self.edge_ngrams:
            out = self._edge_expr(out)
        return out

    def _shingles_expr(self, toks: Column) -> Column:
        n = self.shingle_size
        sh = F.transform(
            F.sequence(F.lit(1), F.size(toks) - (n - 1)),
            lambda i: F.array_join(F.slice(toks, i, n), "_"),
        )
        empty = F.array().cast("array<string>")
        return F.when(F.size(toks) >= n, sh).otherwise(empty)

    def _edge_expr(self, toks: Column) -> Column:
        mn, mx = self.edge_ngrams
        empty = F.array().cast("array<string>")

        def per_token(t):
            ln = F.length(t)
            prefixes = F.transform(
                F.sequence(F.lit(mn), F.least(F.lit(mx), ln)),
                lambda k: t.substr(F.lit(1), k),
            )
            full = F.when(ln > mx, F.array(t)).otherwise(empty)
            return F.when(ln >= mn, F.concat(prefixes, full)).otherwise(empty)

        return F.flatten(F.transform(toks, per_token))

    def _expand_synonyms(self, toks: Column) -> Column:
        if not self.synonyms:
            return toks
        syn: dict[str, list[str]] = {}
        for k, v in self.synonyms:
            syn.setdefault(k, []).append(v)

        def expand(x):
            expr = F.array(x)
            for k in sorted(syn):
                expr = F.when(
                    x == k, F.array(x, *[F.lit(s) for s in syn[k]])
                ).otherwise(expr)
            return expr

        return F.flatten(F.transform(toks, expand))

    def _strip_stopwords(self, toks: Column) -> Column:
        if not self.stopwords:
            return toks
        stop_arr = F.array(*[F.lit(w) for w in sorted(self.stopwords)])
        return F.filter(toks, lambda x: ~F.array_contains(stop_arr, x))

    def duckdb_tokens_sql(self, col_sql: str) -> str:
        """The IDENTICAL tokenizer as a DuckDB SQL expression — used by the
        driver's oracle comparisons (list<varchar> of analyzed tokens)."""
        src = self._normalize_sql(col_sql)
        pat = self.token_pattern.replace("'", "''")  # SQL string escaping
        base = f"regexp_extract_all({src}, '{pat}')"
        if self.stopwords:
            stoplist = ", ".join(f"'{w}'" for w in sorted(self.stopwords))
            base = (
                f"list_filter({base}, t -> t NOT IN ({stoplist}))"
            )
        expr = base
        if self.synonyms:
            syn: dict[str, list[str]] = {}
            for k, v in self.synonyms:
                syn.setdefault(k, []).append(v)
            cases = " ".join(
                f"WHEN x = '{k}' THEN "
                f"[x, {', '.join(repr(s) for s in syn[k])}]"
                for k in sorted(syn)
            )
            expr = (
                f"flatten(list_transform({expr},"
                f" x -> CASE {cases} ELSE [x] END))"
            )
        if self.shingle_size >= 2:
            n = self.shingle_size
            # generate_series(1, m) is empty when m < 1, so no guard
            sh = (
                f"list_transform(generate_series(1, len({base}) - {n - 1}),"
                f" i -> array_to_string({base}[i:i+{n - 1}], '_'))"
            )
            expr = f"list_concat({expr}, {sh})"
        if self.edge_ngrams:
            mn, mx = self.edge_ngrams
            expr = (
                f"flatten(list_transform({expr}, t -> "
                f"CASE WHEN length(t) >= {mn} THEN list_concat("
                f"list_transform(generate_series({mn}, least({mx}, length(t))),"
                f" k -> substr(t, 1, k)),"
                f" CASE WHEN length(t) > {mx} THEN [t] ELSE []::VARCHAR[] END)"
                f" ELSE []::VARCHAR[] END))"
            )
        return expr

    # ---- Arrow-vectorized engines (index-build hot path) ----
    def tokenize_udf(self):
        """pandas UDF string -> array<string> (Arrow-batched). Delegates to
        ``self.tokenize`` so analyzer subclasses (UnicodeCJKAnalyzer)
        inherit the Arrow engine with their own contract."""
        analyzer = self  # frozen dataclass: pickles by fields

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _tok(texts: pd.Series) -> pd.Series:
            return texts.map(analyzer.tokenize)

        return _tok

    # ---- token stream with positions/offsets (term-vector path) ----
    def token_stream(self, text: str | None) -> list[tuple[str, int, int, int]]:
        """[(term, position, start_offset, end_offset)] for one text.

        Position semantics match Lucene's StopFilter position-increment
        preservation (/root/reference golden:
        test/org/nlp4l/lucene/RawReaderSpec.scala:185-192): positions are
        assigned over the FULL token stream, then stopword tokens are
        dropped, leaving holes. Offsets are character offsets into the
        original text (lowercasing is length-preserving on the contract
        alphabet)."""
        if not text:
            return []
        src = self._normalize(text)
        pattern = (
            _TOKEN_RE
            if self.token_pattern == TOKEN_PATTERN
            else re.compile(self.token_pattern)
        )
        syn: dict[str, list[str]] = {}
        for k, v in self.synonyms:
            syn.setdefault(k, []).append(v)
        out = []
        kept: list[tuple[str, int, int, int]] = []  # pre-synonym stream
        for pos, m in enumerate(pattern.finditer(src)):
            term = m.group(0)
            if self.stopwords and term in self.stopwords:
                continue
            kept.append((term, pos, m.start(), m.end()))
            out.append((term, pos, m.start(), m.end()))
            for s in syn.get(term, ()):  # posinc 0: same position/offsets
                out.append((s, pos, m.start(), m.end()))
        if self.shingle_size >= 2:
            # shingle carries its FIRST word's position; offsets span the
            # whole shingle (Lucene ShingleFilter's offset contract)
            n = self.shingle_size
            for i in range(len(kept) - n + 1):
                grams = kept[i : i + n]
                out.append(
                    (
                        "_".join(g[0] for g in grams),
                        grams[0][1],
                        grams[0][2],
                        grams[-1][3],
                    )
                )
        if self.edge_ngrams:
            mn, mx = self.edge_ngrams
            edged = []
            for term, pos, start, end in out:
                if len(term) < mn:
                    continue
                for k in range(mn, min(mx, len(term)) + 1):
                    # posinc 0: every gram sits at the source position
                    edged.append((term[:k], pos, start, end))
                if len(term) > mx:
                    edged.append((term, pos, start, end))
            out = edged
        return out

    def term_vectors_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("terms", T.ArrayType(T.StringType())),
                T.StructField(
                    "positions", T.ArrayType(T.ArrayType(T.IntegerType()))
                ),
                T.StructField(
                    "start_offsets", T.ArrayType(T.ArrayType(T.IntegerType()))
                ),
                T.StructField(
                    "end_offsets", T.ArrayType(T.ArrayType(T.IntegerType()))
                ),
            ]
        )

    def term_vectors_udf(self):
        """pandas UDF string -> per-doc term vector with positions/offsets:
        struct(terms[], positions[][], start_offsets[][], end_offsets[][]),
        arrays aligned by term index, positions ascending per term.

        Grouping happens inside the Arrow pass so the downstream explode is
        narrow — no (doc_id, term) shuffle is ever needed to materialize
        term vectors (reference walks Lucene term vectors per doc:
        /root/reference/app/org/nlp4l/lucene/TermVector.scala:28-59).
        Delegates to ``self.token_stream`` so analyzer subclasses
        (UnicodeCJKAnalyzer) inherit the engine with their contract."""
        analyzer = self

        @F.pandas_udf(self.term_vectors_schema())
        def _tv(texts: pd.Series) -> pd.DataFrame:
            terms_o, pos_o, so_o, eo_o = [], [], [], []
            for t in texts:
                acc: dict[str, list[list[int]]] = {}
                for term, pos, start, end in analyzer.token_stream(t):
                    e = acc.setdefault(term, [[], [], []])
                    e[0].append(pos)
                    e[1].append(start)
                    e[2].append(end)
                terms_o.append(list(acc.keys()))
                pos_o.append([v[0] for v in acc.values()])
                so_o.append([v[1] for v in acc.values()])
                eo_o.append([v[2] for v in acc.values()])
            return pd.DataFrame(
                {
                    "terms": terms_o,
                    "positions": pos_o,
                    "start_offsets": so_o,
                    "end_offsets": eo_o,
                }
            )

        return _tv

    def term_counts_schema(self) -> T.StructType:
        return T.StructType(
            [
                T.StructField("terms", T.ArrayType(T.StringType())),
                T.StructField("tfs", T.ArrayType(T.IntegerType())),
                T.StructField("dl", T.IntegerType()),
            ]
        )

    def term_counts_udf(self):
        """pandas UDF string -> struct(terms array, tfs array, dl int).

        One Arrow pass produces the per-doc term-frequency map AND the doc
        length, so downstream ``explode(arrays_zip(terms, tfs))`` is narrow
        (no (doc_id, term) shuffle — the reference re-walks Lucene term
        vectors for the same data, Terms.scala:118-138).
        """
        analyzer = self

        @F.pandas_udf(self.term_counts_schema())
        def _counts(texts: pd.Series) -> pd.DataFrame:
            return analyzer.term_counts_frame(texts)

        return _counts

    def term_counts_frame(self, texts) -> pd.DataFrame:
        """The term_counts_udf body as a plain pandas function — shared
        by the Arrow UDF and the driver-side micro-generation builder
        (index/microbuild.py), so the two paths cannot diverge."""
        terms_out: list[list[str]] = []
        tfs_out: list[list[int]] = []
        dls: list[int] = []
        for t in texts:
            toks = self.tokenize(t)
            if not toks:
                terms_out.append([])
                tfs_out.append([])
                dls.append(0)
                continue
            counts: dict[str, int] = {}
            for x in toks:
                counts[x] = counts.get(x, 0) + 1
            terms_out.append(list(counts.keys()))
            tfs_out.append(list(counts.values()))
            # discountOverlaps: dl counts the pre-injection stream
            dls.append(
                len(self._base_tokens(t))
                if (self.synonyms or self.shingle_size or self.edge_ngrams)
                else len(toks)
            )
        return pd.DataFrame({"terms": terms_out, "tfs": tfs_out, "dl": dls})


STANDARD_ANALYZER = Analyzer(stopwords=LUCENE_ENGLISH_STOPWORDS)
WHITESPACE_ANALYZER = Analyzer(stopwords=frozenset())
FOLDING_ANALYZER = Analyzer(
    stopwords=LUCENE_ENGLISH_STOPWORDS, ascii_fold=True
)
# UAX#29 word-break mode (see UAX29_TOKEN_PATTERN above): word-internal
# apostrophes / dotted acronyms / numeric grouping / combining marks, as
# Lucene's StandardTokenizer does. The [a-z0-9]+ contract stays the
# engine default (149 oracles encode it); this is the opt-in closer match.
UAX29_ANALYZER = Analyzer(
    token_pattern=UAX29_TOKEN_PATTERN, stopwords=LUCENE_ENGLISH_STOPWORDS
)
