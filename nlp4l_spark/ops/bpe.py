"""BPE tokenizer statistics and training over a distributed corpus.

Beyond-reference training-data ops (task brief: "token counting
(whitespace + a BPE-ish regex)" — this module is the real thing's first
half): the corpus-wide symbol-pair statistics that seed a BPE vocabulary,
and a driver-side merge learner over the distributed word-frequency table.

Scale shape: the ONLY corpus-sized op is one tokenize+explode+groupBy(term)
pass producing the word-frequency table — the same aggregate the index
build and WordCounts already do, shuffling |vocab| rows, not |corpus|.
Everything after runs on the vocabulary (Zipf: ~10^6 rows at 100 TB),
which is exactly how production BPE trainers work (SentencePiece /
HF-tokenizers train from a word-count dictionary, not the raw stream).
"""

from __future__ import annotations

from collections import Counter

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

from nlp4l_spark.analysis import Analyzer, WHITESPACE_ANALYZER


def word_counts(
    df: DataFrame, text_col: str = "text", analyzer: Analyzer | None = None
) -> DataFrame:
    """(term, cnt) word-frequency table — the one corpus-sized pass."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    toks = analyzer.tokens_expr(text_col)
    return (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def bpe_pair_counts(
    df: DataFrame,
    text_col: str = "text",
    *,
    top_k: int = 50,
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Corpus-wide adjacent character-pair frequencies — the statistic that
    picks BPE merge #1 (Sennrich et al. 2016): for every word, each
    adjacent symbol pair counts once per corpus occurrence of the word.
    Runs on the word-frequency table (vocab-sized), so the per-word HOF
    enumerating character bigrams touches |vocab| rows. Deterministic
    top-k: count desc, pair asc."""
    wc = word_counts(df, text_col, analyzer)
    # substring with a dynamic start needs the expr form: substr(term, i, 2)
    pairs = F.when(
        F.length("term") >= 2,
        F.expr("transform(sequence(1, length(term) - 1), i -> substr(term, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    return (
        wc.select(F.explode(pairs).alias("pair"), "cnt")
        .groupBy("pair")
        .agg(F.sum("cnt").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(top_k)
    )


def learn_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    *,
    num_merges: int = 50,
    max_vocab_words: int = 100_000,
    analyzer: Analyzer | None = None,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges (Sennrich et al. 2016, Algorithm 1) from the
    distributed word-frequency table: collect the top ``max_vocab_words``
    (a pruned vocabulary — driver-safe by the Zipf argument above; NOT
    corpus-proportional), then run the classic greedy merge loop in plain
    Python. Ties break lexicographically on (left, right) so the merge
    list is deterministic across runs/engines.

    Returns ``[(left, right, pair_count), ...]`` in merge order —
    iterative + trained-artifact, hence test-only (no SQL oracle), like
    kea_extract/mdlp_cuts."""
    from nlp4l_spark.plans.caps import assert_driver_cap

    rows = (
        word_counts(df, text_col, analyzer)
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(max_vocab_words)
        .collect()
    )
    # executable precondition: the greedy loop below is driver-safe
    # only on the pruned vocabulary (plans/caps.py)
    assert_driver_cap(len(rows), max_vocab_words, "learn_bpe_merges vocab")
    vocab: dict[tuple[str, ...], int] = {
        tuple(r["term"]): int(r["cnt"]) for r in rows
    }
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for syms, cnt in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += cnt
        if not counts:
            break
        (left, right), best = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0])
        )
        merges.append((left, right, best))
        merged = left + right
        new_vocab: dict[tuple[str, ...], int] = {}
        for syms, cnt in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == left and syms[i + 1] == right:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + cnt
        vocab = new_vocab
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    *,
    analyzer: Analyzer | None = None,
) -> DataFrame:
    """Segment text with a learned merge list via one Arrow-batched pandas
    UDF (rank-greedy BPE apply, the standard inference rule: repeatedly
    merge the lowest-rank adjacent pair). Python is unavoidable here (the
    merge loop is data-dependent), so it is Arrow-vectorized per batch,
    never row-at-a-time."""
    analyzer = analyzer or WHITESPACE_ANALYZER
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}

    def encode_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i, pair in enumerate(zip(syms, syms[1:])):
                rk = ranks.get(pair)
                if rk is not None and (best_rank is None or rk < best_rank):
                    best_rank, best_i = rk, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def bpe_udf(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in analyzer.tokenize(t):
                got = cache.get(w)
                if got is None:
                    got = cache[w] = encode_word(w)
                out.extend(got)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, bpe_udf(F.col(text_col)))
