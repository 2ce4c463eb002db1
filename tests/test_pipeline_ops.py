"""Tests for the round-2 training-pipeline additions: repetition signals,
decontamination, sequence packing, dedup clustering, BPE statistics."""

from __future__ import annotations

from collections import Counter

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.ops import bpe, dedup, textqc


# ---------------- repetition features -------------------------------------- #
def _rep(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r["doc_id"]: r.asDict()
        for r in textqc.repetition_features(df, **kw).collect()
    }


def test_repetition_known_values(spark):
    out = _rep(
        spark,
        [
            (0, "spam spam spam spam"),          # all one token
            (1, "a b c d e f"),                  # no repetition at all
            (2, "x y x y x y"),                  # "x y" bigram repeated
        ],
        ngram=3,
    )
    # doc0: 4 tokens, top token 4/4; bigrams: "spam spam" x3 -> 3/3;
    # 3-grams: "spam spam spam" x2, both positions duplicated -> 2/2
    assert out[0]["n_tokens"] == 4
    assert out[0]["top_token_frac"] == 1.0
    assert out[0]["top_bigram_frac"] == 1.0
    assert out[0]["dup_ngram_frac"] == 1.0
    # doc1: unique everything
    assert out[1]["top_token_frac"] == pytest.approx(1 / 6, abs=1e-6)
    assert out[1]["dup_ngram_frac"] == 0.0
    # doc2: tokens x,y 3 each of 6 -> 0.5; bigrams: x y (3), y x (2) -> 3/5;
    # 3-grams: "x y x" x2, "y x y" x2 -> all 4 positions duplicated -> 1.0
    assert out[2]["top_token_frac"] == 0.5
    assert out[2]["top_bigram_frac"] == 0.6
    assert out[2]["dup_ngram_frac"] == 1.0


def test_repetition_edge_docs(spark):
    out = _rep(spark, [(0, ""), (1, "solo"), (2, "two words")], ngram=3)
    assert out[0]["n_tokens"] == 0 and out[0]["dup_ngram_frac"] == 0.0
    assert out[1]["n_tokens"] == 1 and out[1]["top_token_frac"] == 1.0
    assert out[2]["top_bigram_frac"] == 1.0  # one bigram, occurs once
    assert out[2]["dup_ngram_frac"] == 0.0  # fewer tokens than ngram


def test_repetition_engine_identity(spark, docs_df):
    a = sorted(
        tuple(r)
        for r in textqc.repetition_features(docs_df, engine="arrow").collect()
    )
    s = sorted(
        tuple(r)
        for r in textqc.repetition_features(docs_df, engine="sql").collect()
    )
    assert a == s


# ---------------- decontamination ------------------------------------------ #
def test_contamination_and_decontaminate(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta"),   # shares 4-gram w/ eval
            (2, "one two three four five"),               # clean
            (3, "alpha beta gamma delta other stuff"),    # shares the same
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta suffix")], "doc_id long, text string"
    )
    pairs = {
        (r["doc_id"], r["eval_id"]): r["shared_ngrams"]
        for r in textqc.contamination_pairs(corpus, ev, n=4).collect()
    }
    assert pairs == {(1, 100): 1, (3, 100): 1}
    kept = sorted(
        r["doc_id"] for r in textqc.decontaminate(corpus, ev, n=4).collect()
    )
    assert kept == [2]


def test_contamination_counts_distinct_grams(spark):
    # the same shared 4-gram appearing twice in a doc counts ONCE (distinct)
    corpus = spark.createDataFrame(
        [(1, "a b c d zz a b c d")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c d")], "doc_id long, text string")
    rows = textqc.contamination_pairs(corpus, ev, n=4).collect()
    assert len(rows) == 1 and rows[0]["shared_ngrams"] == 1


# ---------------- sequence packing ----------------------------------------- #
def test_pack_sequences_prefix_sums(spark, docs_df):
    out = textqc.pack_sequences(docs_df, seq_len=256, n_shards=8).collect()
    assert len(out) == docs_df.count()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(8))
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["doc_id"])
        cum = 0
        for r in rows:
            assert r["pos_start"] == cum  # exact prefix sum, no gaps
            assert r["seq_first"] == r["pos_start"] // 256
            end = max(r["pos_start"] + r["n_tokens"] - 1, r["pos_start"])
            assert r["seq_last"] == end // 256
            cum += r["n_tokens"]


def test_pack_sequences_deterministic_sharding(spark, docs_df):
    a = {r["doc_id"]: r["shard"]
         for r in textqc.pack_sequences(docs_df, n_shards=8).collect()}
    b = {r["doc_id"]: r["shard"]
         for r in textqc.pack_sequences(docs_df.repartition(13), n_shards=8).collect()}
    assert a == b  # partitioning-independent placement


# ---------------- context-window chunking ---------------------------------- #
def test_chunk_documents_windows(spark):
    df = spark.createDataFrame(
        [(0, " ".join(f"t{i}" for i in range(10))), (1, "short"), (2, "")],
        "doc_id long, text string",
    )
    rows = sorted(
        (r["doc_id"], r["chunk_idx"], r["chunk_text"], r["n_tokens"])
        for r in textqc.chunk_documents(df, window=4, stride=3).collect()
    )
    # doc0 (10 tokens, w=4, s=3): starts 1,4,7,10 -> lengths 4,4,4,1
    doc0 = [r for r in rows if r[0] == 0]
    assert [r[3] for r in doc0] == [4, 4, 4, 1]
    assert doc0[0][2] == "t0 t1 t2 t3"
    assert doc0[1][2] == "t3 t4 t5 t6"  # overlap of 1 token (w - s)
    assert doc0[3][2] == "t9"
    assert [r for r in rows if r[0] == 1] == [(1, 0, "short", 1)]
    assert not [r for r in rows if r[0] == 2]  # empty doc -> no chunks


def test_chunk_documents_covers_all_tokens(spark, docs_df):
    chunks = textqc.chunk_documents(docs_df, window=32, stride=32)  # disjoint
    tot = chunks.groupBy("doc_id").agg(F.sum("n_tokens").alias("s"))
    base = docs_df.select(
        "doc_id",
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)")).alias("n"),
    )
    joined = base.join(tot, "doc_id", "left").filter(
        F.col("n") != F.coalesce(F.col("s"), F.lit(0))
    )
    assert joined.count() == 0  # disjoint chunking partitions the tokens


# ---------------- weighted resampling --------------------------------------- #
def test_resample_weighted_counts(spark):
    df = spark.createDataFrame(
        [(i, "x", ["a", "b"][i % 2]) for i in range(2000)],
        "doc_id long, text string, lang string",
    )
    out = textqc.resample_weighted(df, {"a": 2.5, "b": 0.0}, "lang")
    by_lang = {
        r["lang"]: r["cnt"]
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert "b" not in by_lang  # weight 0 drops the stratum
    # E[copies] = 2.5 per 'a' doc; 1000 docs -> ~2500, hash-uniform
    assert 2300 <= by_lang["a"] <= 2700
    # every 'a' doc contributes at least floor(w)=2 copies
    mins = (
        out.filter(F.col("lang") == "a")
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .agg(F.min("c"))
        .first()[0]
    )
    assert mins == 2


def test_resample_weighted_deterministic(spark, docs_df):
    w = {"en": 0.6, "zh": 2.3}
    a = sorted(
        (r["doc_id"], r["repeat_idx"])
        for r in textqc.resample_weighted(docs_df, w, "lang").collect()
    )
    b = sorted(
        (r["doc_id"], r["repeat_idx"])
        for r in textqc.resample_weighted(
            docs_df.repartition(17), w, "lang"
        ).collect()
    )
    assert a == b


# ---------------- corpus profile -------------------------------------------- #
def test_corpus_profile_rollup(spark):
    df = spark.createDataFrame(
        [(0, "one two", "en"), (1, "three", "en"), (2, "quatre cinq six", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r["stratum"]: r.asDict() for r in textqc.corpus_profile(df).collect()}
    assert set(out) == {"en", "fr", "ALL"}
    assert out["en"]["n_docs"] == 2 and out["fr"]["n_docs"] == 1
    assert out["ALL"]["n_docs"] == 3
    assert out["ALL"]["total_tokens"] == out["en"]["total_tokens"] + out["fr"]["total_tokens"]
    assert out["fr"]["p50_chars"] == float(len("quatre cinq six"))


# ---------------- dedup clusters ------------------------------------------- #
def test_dedup_clusters_components(spark):
    # chain 1-2-3 (transitive), island 7-8, and a star 20-{21,22}
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8), (20, 21), (20, 22)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r["cluster_id"]
           for r in dedup.dedup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 20: 20, 21: 20, 22: 20}


def test_dedup_clusters_long_chain(spark):
    # a 40-node path exercises pointer jumping (O(log n) rounds < max_iter)
    n = 40
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = dedup.dedup_clusters(pairs)
    assert {r["cluster_id"] for r in out.collect()} == {0}
    assert out.count() == n + 1


# ---------------- BPE ------------------------------------------------------- #
def test_bpe_pair_counts_match_counter(spark):
    rows = [(0, "low lower lowest"), (1, "new newer low")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    expected: Counter = Counter()
    for _, t in rows:
        for w in t.split():
            for i in range(len(w) - 1):
                expected[w[i : i + 2]] += 1
    got = {r["pair"]: r["pair_count"]
           for r in bpe.bpe_pair_counts(df, top_k=100).collect()}
    assert got == dict(expected)


def test_learn_bpe_merges_greedy(spark):
    df = spark.createDataFrame(
        [(0, "low low low lower lowest")], "doc_id long, text string"
    )
    merges = bpe.learn_bpe_merges(df, num_merges=3)
    # 'lo'+'w' family: first merge must be the most frequent adjacent pair;
    # every word contains l-o and o-w (5 occurrences each) -> tie broken
    # lexicographically: ('l','o') before ('o','w')
    assert merges[0][:2] == ("l", "o") and merges[0][2] == 5
    assert merges[1][:2] == ("lo", "w") and merges[1][2] == 5
    # after 'low' exists, next best pair comes from lower/lowest suffixes
    assert merges[2][2] <= 2


def test_apply_bpe_segments(spark):
    df = spark.createDataFrame(
        [(0, "low lower unseen")], "doc_id long, text string"
    )
    merges = bpe.learn_bpe_merges(
        spark.createDataFrame([(0, "low low low low")], "doc_id long, text string"),
        num_merges=2,
    )
    out = bpe.apply_bpe(df, merges).collect()[0]["bpe_tokens"]
    # 'low' fully merged; 'lower' = low + e + r; 'unseen' untouched chars
    assert out[:4] == ["low", "low", "e", "r"]
    assert out[4:] == list("unseen")


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.read.parquet("/root/testdata/sf0.001/documents.parquet")


# ---------------- C4-style line cleaning ----------------------------------- #
def test_clean_lines_rules(spark):
    rows = [
        (0, "This line is fine.\nno punct here\nshort.\nvar x = { y }.\n"
            "Uses javascript sadly.\nLorem Ipsum dolor sit amet.\nAlso good enough!"),
        (1, "tiny.\n{"),          # nothing survives -> doc dropped
        (2, 'He said "stop".\nHe said (quote) ”stop”'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in textqc.clean_lines(df).collect()}
    # doc 0: keeps the terminal-punct >=3-word lines without bans
    assert out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == "This line is fine.\nAlso good enough!"
    assert out[0]["n_lines"] == 7
    # doc 1 dropped entirely
    assert 1 not in out
    # doc 2: closing-quote counts as terminal punctuation
    assert out[2]["n_kept"] == 2


def test_clean_lines_thresholds(spark):
    df = spark.createDataFrame(
        [(0, "one two.\none two three.")], "doc_id long, text string"
    )
    strict = textqc.clean_lines(df, min_words=3).collect()[0]
    assert strict["n_kept"] == 1
    loose = textqc.clean_lines(df, min_words=2).collect()[0]
    assert loose["n_kept"] == 2
    assert textqc.clean_lines(df, min_kept_lines=3).count() == 0


# ---------------- unigram LM scoring --------------------------------------- #
def test_lm_score_known_values(spark):
    import math

    rows = [(0, "xx xx yy"), (1, "xx yy"), (2, "")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict() for r in textqc.lm_score(df).collect()}
    # corpus: cf(xx)=3, cf(yy)=2, N=5, V=2, alpha=0.5 -> denom 6
    pa, pb = 3.5 / 6.0, 2.5 / 6.0
    nll0 = -(2 * math.log(pa) + math.log(pb)) / 3
    nll1 = -(math.log(pa) + math.log(pb)) / 2
    assert out[0]["nll"] == round(nll0, 6)
    assert out[1]["nll"] == round(nll1, 6)
    assert out[0]["n_tokens"] == 3
    # empty doc surfaces with null nll, zero tokens
    assert out[2]["nll"] is None and out[2]["n_tokens"] == 0
    # rare-token soup scores worse (higher nll) than head-token text
    assert out[1]["nll"] > out[0]["nll"]


def test_ccnet_buckets(spark):
    # 9 scoreable docs per lang with strictly increasing rarity (nll), so
    # the per-lang terciles split them 3/3/3; plus one empty doc -> tail
    rows = []
    common = "aa " * 30
    for li, lang in enumerate(("en", "es")):
        for i in range(9):
            # i rare tokens (each unique) raises nll monotonically
            rare = " ".join(f"r{lang}{i}x{j}" for j in range(i))
            rows.append((li * 100 + i, lang, (common + rare).strip()))
    rows.append((999, "en", ""))
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = {r["doc_id"]: r for r in textqc.ccnet_buckets(df).collect()}
    assert len(out) == 19
    for li, lang in enumerate(("en", "es")):
        got = [out[li * 100 + i]["bucket"] for i in range(9)]
        assert got == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3, (lang, got)
    assert out[999]["bucket"] == "tail" and out[999]["nll"] is None


# ---------------- percentile-threshold filtering ---------------------------- #
def test_filter_by_percentile(spark):
    rows = [(i, "a" if i < 10 else "b", float(i)) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    # global median of 0..19 = 9.5 -> keeps 10..19
    kept = sorted(
        r["doc_id"] for r in textqc.filter_by_percentile(df, "score", 0.5).collect()
    )
    assert kept == list(range(10, 20))
    # per-stratum: median of each lang's own range
    strat = sorted(
        r["doc_id"]
        for r in textqc.filter_by_percentile(df, "score", 0.5, "lang").collect()
    )
    assert strat == [5, 6, 7, 8, 9, 15, 16, 17, 18, 19]
    below = sorted(
        r["doc_id"]
        for r in textqc.filter_by_percentile(df, "score", 0.5, "lang", keep="below").collect()
    )
    assert below == [0, 1, 2, 3, 4, 10, 11, 12, 13, 14]
    with pytest.raises(ValueError):
        textqc.filter_by_percentile(df, "score", 0.5, keep="middle")
