"""Boolean MUST (conjunction), PrefixQuery, and MatchAllDocsQuery over the
index: Lucene query-type surface beyond OR top-k. Index results must equal
the corpus-path DataFrame queries (same BM25 sums, MUST candidate set) and
respect constant-score/docID-asc semantics for the rewritten query types."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.index import IndexBuilder
from nlp4l_spark.search import Searcher

DOCS = [
    (0, "spark join merge vector window"),
    (1, "join merge nothing else"),
    (2, "vector vector join"),
    (3, "merge vector scan"),
    (4, "join merge vector join"),
    (5, "scan scan scan"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("boolidx") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    IndexBuilder(sort_cols=("conv_id", "turn_idx")).build(df, d)
    return d


def test_conjunction_candidate_set(spark, idx):
    s = Searcher(spark, idx)
    got_and = [r["doc_id"] for r in s.search("join merge vector", operator="and").collect()]
    # only docs 0 and 4 contain ALL three terms
    assert sorted(got_and) == [0, 4]
    got_or = {r["doc_id"] for r in s.search("join merge vector", k=10).collect()}
    assert {0, 1, 2, 3, 4} == got_or  # OR matches any
    # AND scores equal the OR scores for the same docs (MUST only filters)
    or_scores = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search("join merge vector", k=10, method="dataframe").collect()
    }
    for r in s.search("join merge vector", operator="and").collect():
        assert round(r["score"], 9) == or_scores[r["doc_id"]]


def test_dismax(spark, idx):
    s = Searcher(spark, idx)
    q = "join merge vector"
    # tie_breaker=1.0 is exactly the SHOULD sum
    or_scores = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search(q, k=10, method="dataframe").collect()
    }
    dm1 = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search_dismax(q, tie_breaker=1.0, k=10).collect()
    }
    assert dm1 == or_scores
    # tie_breaker=0 is the per-doc MAX over single-term scores
    singles = [
        {r["doc_id"]: r["score"] for r in s.search(t, k=10, method="dataframe").collect()}
        for t in ("join", "merge", "vector")
    ]
    expect = {}
    for d in {k for m in singles for k in m}:
        expect[d] = round(max(m.get(d, 0.0) for m in singles), 9)
    dm0 = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search_dismax(q, tie_breaker=0.0, k=10).collect()
    }
    assert dm0 == expect
    # candidate set is the OR set; 0 < tie < 1 sits strictly between
    dmh = {
        r["doc_id"]: r["score"]
        for r in s.search_dismax(q, tie_breaker=0.5, k=10).collect()
    }
    assert set(dmh) == set(or_scores)
    for d, v in dmh.items():
        assert dm0[d] - 1e-9 <= v <= dm1[d] + 1e-9


def test_rm3_feedback(spark, idx):
    s = Searcher(spark, idx)
    # alpha=0: only the uniform original-query model -> same ranking as
    # plain OR, scores scaled by 1/|q|
    plain = [
        (r["doc_id"], round(r["score"], 9))
        for r in s.search("join merge", k=10, method="dataframe").collect()
    ]
    rm0 = [
        (r["doc_id"], round(r["score"] * 2, 9))  # |q| = 2
        for r in s.search_rm3("join merge", k=10, alpha=0.0).collect()
    ]
    assert rm0 == plain
    # alpha>0: feedback docs for 'spark' (only doc 0) co-contain
    # join/merge/vector/window -> expansion must surface docs that never
    # contain 'spark' (e.g. doc 5 'scan scan scan' stays absent, doc 1
    # join/merge appears)
    got = {r["doc_id"] for r in s.search_rm3("spark", k=10, alpha=0.5).collect()}
    assert 0 in got and 1 in got and 4 in got
    assert 5 not in got
    # expansion terms carry weight: doc ordering still deterministic
    r1 = [r["doc_id"] for r in s.search_rm3("spark", k=10, alpha=0.5).collect()]
    r2 = [r["doc_id"] for r in s.search_rm3("spark", k=10, alpha=0.5).collect()]
    assert r1 == r2


def test_conjunction_missing_term_empty(spark, idx):
    s = Searcher(spark, idx)
    assert s.search("join zzznothere", operator="and").count() == 0
    # while OR still matches the present term
    assert s.search("join zzznothere", k=10).count() > 0


def test_prefix_query(spark, idx):
    s = Searcher(spark, idx)
    got = [(r["doc_id"], r["score"]) for r in s.search_prefix("sc", k=10).collect()]
    # docs containing a term starting with "sc" (scan): 3, 5 — docID asc,
    # constant score 1.0
    assert got == [(3, 1.0), (5, 1.0)]


def test_match_all(spark, idx):
    s = Searcher(spark, idx)
    got = [(r["doc_id"], r["score"]) for r in s.match_all(k=4).collect()]
    assert got == [(0, 1.0), (1, 1.0), (2, 1.0), (3, 1.0)]


def test_wildcard_query(spark, idx):
    s = Searcher(spark, idx)
    # s?a* matches "spark" (doc 0) and "scan" (docs 3, 5)
    got = [r["doc_id"] for r in s.search_wildcard("s?a*", k=10).collect()]
    assert got == [0, 3, 5]
    # ? is exactly one char: "sc?n" matches scan only
    assert [r["doc_id"] for r in s.search_wildcard("sc?n", k=10).collect()] == [3, 5]
    assert s.search_wildcard("zz*", k=10).count() == 0


def test_term_range_query(spark, idx):
    s = Searcher(spark, idx)
    # ['s', 't'): terms scan, spark -> docs 0, 3, 5
    got = [r["doc_id"] for r in s.search_term_range("s", "t", include_upper=False).collect()]
    assert got == [0, 3, 5]
    # ['join', 'join']: exact single-term range -> docs 0, 1, 2, 4
    got = [r["doc_id"] for r in s.search_term_range("join", "join").collect()]
    assert got == [0, 1, 2, 4]
    # open-ended lower bound
    got = [r["doc_id"] for r in s.search_term_range(None, "join", include_upper=False).collect()]
    assert got == [1]  # only "else" sorts before "join" (doc 1)


def test_fuzzy_query_index_matches_corpus(spark, idx):
    s = Searcher(spark, idx)
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in s.search_fuzzy("joun", k=10).collect()
    ]
    # expansion: "join" (1 edit); every join-bearing doc scores
    assert [d for d, _ in got] and set(d for d, _ in got) == {0, 1, 2, 4}
    # exact same scores from first principles: boost = 1 - 1/4
    from nlp4l_spark.search import idf as _idf
    from nlp4l_spark.search.engine import B, K1

    dls = {0: 5, 1: 4, 2: 3, 3: 3, 4: 4, 5: 3}
    avgdl = sum(dls.values()) / 6.0
    tfs = {0: 1, 1: 1, 2: 1, 4: 2}
    w = _idf(6, 4) * (1 - 1 / 4)
    for d, sc in got:
        tf = tfs[d]
        expect = w * tf * (K1 + 1) / (tf + K1 * (1 - B + B * dls[d] / avgdl))
        assert sc == pytest.approx(round(expect, 6), abs=1e-6)


def test_fuzzy_no_expansion_empty(spark, idx):
    s = Searcher(spark, idx)
    assert s.search_fuzzy("qqqqqqqqqq", k=5).count() == 0


def test_must_not_and_boosts(spark, idx):
    s = Searcher(spark, idx)
    # "join vector^2 -scan": scan-bearing docs (3, 5) excluded; vector
    # contributions doubled
    got = {
        r["doc_id"]: round(r["score"], 6)
        for r in s.query("join vector^2 -scan", k=10).collect()
    }
    assert set(got) == {0, 1, 2, 4}  # 3, 5 excluded by -scan
    plain = {
        r["doc_id"]: round(r["score"], 6)
        for r in s.search_boolean(should=["join", "vector"], k=10).collect()
    }
    # doc 1 has no 'vector' -> boost changes nothing for it
    assert got[1] == plain[1]
    # doc 2 is vector-heavy -> boosted score strictly higher
    assert got[2] > plain[2]


def test_must_with_should_scores_both(spark, idx):
    s = Searcher(spark, idx)
    # +merge vector: candidates must contain merge; vector still scores
    got = {r["doc_id"] for r in s.query("+merge vector", k=10).collect()}
    assert got == {0, 1, 3, 4}
    # and the merge+vector doc outscores the merge-only doc of equal length
    sc = {
        r["doc_id"]: r["score"]
        for r in s.query("+merge vector", k=10).collect()
    }
    assert sc[3] > sc[1]  # doc 3 (merge vector scan) > doc 1 (merge only), same dl


def test_parse_query_forms():
    from nlp4l_spark.search import parse_query

    p = parse_query('+alpha -beta gamma^1.5 delta')
    assert p["must"] == ["alpha"] and p["must_not"] == ["beta"]
    assert p["should"] == ["gamma", "delta"]
    assert p["boosts"] == {"gamma": 1.5} and p["phrase"] is None
    assert parse_query('"london bridge"')["phrase"] == "london bridge"
    with pytest.raises(ValueError):
        parse_query('mixed "phrase here" terms')


def test_conversation_search(spark, tmp_path):
    # multi-turn conversations: conv-level rank aggregates turn scores
    rows = [
        ("c0", 0, "user", "tell me about spark", None, None),
        ("c0", 1, "agent", "spark is a cluster engine", None, None),
        ("c1", 0, "user", "what is a vector", None, None),
        ("c1", 1, "agent", "spark spark spark everywhere", None, None),
        ("c2", 0, "user", "nothing relevant here", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "convidx")
    IndexBuilder().build(df, d)
    s = Searcher(spark, d)
    got = [
        (r["conv_id"], r["n_turns_matched"])
        for r in s.search_conversations("spark", k=5).collect()
    ]
    # c1's turn has tf=3 in a 4-token turn -> best single turn; c0 matched twice
    assert [c for c, _ in got] == ["c1", "c0"]
    assert dict(got) == {"c1": 1, "c0": 2}
    # sum aggregation rewards multi-turn matches
    got_sum = [
        r["conv_id"] for r in s.search_conversations("spark", k=5, agg="sum").collect()
    ]
    assert set(got_sum) == {"c0", "c1"}


def test_facets(spark, tmp_path):
    rows = [
        ("c0", 0, "user", "spark join", None, None),
        ("c0", 1, "agent", "spark is fast", None, None),
        ("c1", 0, "agent", "spark spark", None, None),
        ("c1", 1, "user", "unrelated text", None, None),
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "facetidx")
    IndexBuilder().build(df, d)
    s = Searcher(spark, d)
    got = [(r["role"], r["cnt"]) for r in s.facets("spark", "role").collect()]
    assert got == [("agent", 2), ("user", 1)]
    assert s.facets("zzznothere", "role").count() == 0


def test_highlight(spark, tmp_path):
    rows = [("c0", 0, "user", "London bridge is falling down near london", None, None)]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    d = str(tmp_path / "hlidx")
    IndexBuilder(store_term_vectors=True).build(df, d)
    s = Searcher(spark, d)
    # both 'london' occurrences highlighted with ORIGINAL casing preserved
    assert s.highlight("london", 0) == (
        "<b>London</b> bridge is falling down near <b>london</b>"
    )
    # multi-term query highlights every term's spans in offset order
    assert s.highlight("falling london", 0, pre="[", post="]") == (
        "[London] bridge is [falling] down near [london]"
    )
    with pytest.raises(KeyError):
        s.highlight("london", 99)


def test_more_like_this(spark, idx):
    s = Searcher(spark, idx)
    # doc 2 = "vector vector join": MLT should surface the other
    # vector/join-heavy docs, never doc 2 itself
    got = [r["doc_id"] for r in s.more_like_this(2, k=5).collect()]
    assert 2 not in got
    assert set(got) <= {0, 1, 3, 4} and 4 in got  # join+vector doc matches
    with pytest.raises(KeyError):
        s.more_like_this(999)


def test_search_corrected(spark, idx):
    s = Searcher(spark, idx)
    res, corrections = s.search_corrected("vectr merge", k=10)
    assert corrections == {"vectr": "vector"}
    got = {r["doc_id"] for r in res.collect()}
    # same candidate set as the corrected query
    direct = {r["doc_id"] for r in s.search("vector merge", k=10).collect()}
    assert got == direct
    # in-dictionary queries pass through untouched
    _, none_needed = s.search_corrected("join", k=5)
    assert none_needed == {}


def test_min_should_match(spark, idx):
    s = Searcher(spark, idx)
    should = ["join", "merge", "vector"]
    # msm=3: only docs containing all three distinct terms (0, 4)
    got3 = {r["doc_id"] for r in s.search_boolean(should=should, min_should_match=3).collect()}
    assert got3 == {0, 4}
    # msm=2: docs matching >= 2 distinct should terms
    got2 = {r["doc_id"] for r in s.search_boolean(should=should, min_should_match=2).collect()}
    assert got2 == {0, 1, 2, 3, 4}
    # msm scores = plain SHOULD scores for the surviving docs
    base = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search_boolean(should=should, k=10).collect()
    }
    for r in s.search_boolean(should=should, min_should_match=3).collect():
        assert round(r["score"], 9) == base[r["doc_id"]]
    # msm above the number of index-present should terms -> empty
    assert s.search_boolean(should=["join", "zzznothere"], min_should_match=2).count() == 0


def test_intervals_minimal_semantics(spark, tmp_path):
    """Minimal-interval contract (hand-computed): in
    'merge scan merge join', (0 -> 3) is NOT minimal (the merge at 2
    starts a shorter interval inside it) — exactly one interval, where
    SpanNear slop-counting would report two qualifying starts."""
    docs = [
        (0, "merge scan merge join"),     # minimal: (2,3) only
        (1, "merge join merge join"),     # two disjoint minimal intervals
        (2, "merge a b c d join"),        # gap 4 > maxgaps 3
        (3, "join merge"),                # wrong order
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "ividx")
    IndexBuilder(
        sort_cols=("conv_id", "turn_idx"), store_term_vectors=True
    ).build(df, d)
    s = Searcher(spark, d)
    stored = s.cat.read(spark, "stored").select("doc_id", "conv_id").collect()
    to_orig = {r["doc_id"]: int(r["conv_id"]) for r in stored}
    got = {
        to_orig[r["doc_id"]]: r["n_intervals"]
        for r in s.search_intervals("merge", "join", maxgaps=3).collect()
    }
    assert got == {0: 1, 1: 2}
    # maxgaps=0 keeps only adjacency
    got0 = {
        to_orig[r["doc_id"]]: r["n_intervals"]
        for r in s.search_intervals("merge", "join", maxgaps=0).collect()
    }
    assert got0 == {0: 1, 1: 2}


def test_span_near(spark, tmp_path):
    docs = [
        (0, "merge the big join"),       # gap 2, in order
        (1, "merge join"),               # adjacent
        (2, "join merge"),               # reversed order
        (3, "merge scan scan scan join"),  # gap 3 > slop
        (4, "nothing here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "spanidx")
    IndexBuilder(
        sort_cols=("conv_id", "turn_idx"), store_term_vectors=True
    ).build(df, d)
    s = Searcher(spark, d)
    ordered = {
        r["doc_id"]: r["n_spans"]
        for r in s.search_span_near("merge", "join", slop=2).collect()
    }
    assert ordered == {0: 1, 1: 1}
    unordered = {
        r["doc_id"]: r["n_spans"]
        for r in s.search_span_near(
            "merge", "join", slop=2, in_order=False
        ).collect()
    }
    assert unordered == {0: 1, 1: 1, 2: 1}
    # slop=3 admits the gap-3 doc
    wide = {r["doc_id"] for r in s.search_span_near("merge", "join", slop=3).collect()}
    assert wide == {0, 1, 3}

    # SpanFirstQuery on the same index: 'join' within the first 2
    # positions — doc 1 (pos 1) qualifies, doc 2 (pos 0) qualifies,
    # doc 0 (pos 3) and doc 3 (pos 4) do not
    first = {
        r["doc_id"]: (r["first_pos"], r["n_first"])
        for r in s.search_span_first("join", end=2).collect()
    }
    assert first == {1: (1, 1), 2: (0, 1)}
    # window wide enough for everything
    allw = {
        r["doc_id"]: r["first_pos"]
        for r in s.search_span_first("join", end=100).collect()
    }
    assert allw == {0: 3, 1: 1, 2: 0, 3: 4}
    # positions are FULL-stream ('the' is a stopword hole, still counted)
    assert allw[0] == 3

    # SpanNotQuery: 'merge' positions with no 'join' within slop 0
    # (adjacent kills). doc 0: merge@0, join@3 -> |3-0|=3 > 1, clean.
    # doc 1: merge@0, join@1 adjacent -> excluded. doc 2: join@0 merge@1
    # adjacent -> excluded. doc 3: merge@0, join@4 -> clean.
    notq = {
        r["doc_id"]: r["n_clean"]
        for r in s.search_span_not("merge", "join", slop=0).collect()
    }
    assert notq == {0: 1, 3: 1}
    # slop=2 excludes doc 0 too (|3-0| <= 3) but not doc 3 (|4-0| > 3)
    wide_not = {
        r["doc_id"]: r["n_clean"]
        for r in s.search_span_not("merge", "join", slop=2).collect()
    }
    assert wide_not == {3: 1}
    # docs with no exclude term at all keep every include position
    none = {
        r["doc_id"]: r["n_clean"]
        for r in s.search_span_not("merge", "zzznothere", slop=0).collect()
    }
    assert none == {0: 1, 1: 1, 2: 1, 3: 1}

    # SpanOrQuery under SpanNear: near(or(merge, scan), join, slop=0,
    # unordered). doc 0: merge@0 vs join@3 too far -> out. doc 1:
    # merge@0 join@1 adjacent -> 1 span. doc 2: join@0 merge@1 -> 1.
    # doc 3: scan@1,2,3 join@4 -> scan@3 adjacent (and merge@0 not) -> 1.
    orq = {
        r["doc_id"]: r["n_spans"]
        for r in s.search_span_or_near(
            ["merge", "scan"], "join", slop=0, in_order=False
        ).collect()
    }
    assert orq == {1: 1, 2: 1, 3: 1}
    # ordered: doc 2 (join before merge) drops out
    orq_ord = {
        r["doc_id"]: r["n_spans"]
        for r in s.search_span_or_near(
            ["merge", "scan"], "join", slop=0, in_order=True
        ).collect()
    }
    assert orq_ord == {1: 1, 3: 1}
    # single-member OR == plain span_near
    near = {
        (r["doc_id"], r["n_spans"])
        for r in s.search_span_near(
            "merge", "join", slop=2, in_order=False
        ).collect()
    }
    orq_one = {
        (r["doc_id"], r["n_spans"])
        for r in s.search_span_or_near(
            ["merge"], "join", slop=2, in_order=False, k=10**6
        ).collect()
    }
    assert near == orq_one


def test_fuzzy_index_vs_corpus_identity(spark, tmp_path):
    """search_fuzzy (Damerau expansion over term_stats, this round's
    riskiest change) must agree with the corpus-twin registry query on
    the same corpus: same top-k docs, same 6dp scores."""
    from nlp4l_spark import entry_queries as eq

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    df = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "fuzzy_idx_docs")
    IndexBuilder(sort_cols=("conv_id", "turn_idx")).build(df, d)
    s = Searcher(spark, d)
    stored = s.cat.read(spark, "stored").select("doc_id", "conv_id").collect()
    to_orig = {r["doc_id"]: int(r["conv_id"]) for r in stored}

    want = [
        (r[0], round(r[1], 6))
        for r in eq.REGISTRY["fuzzy_bm25_topk"][0](spark, sf).collect()
    ]
    got = [
        (to_orig[r["doc_id"]], round(r["score"], 6))
        for r in s.search_fuzzy(eq.FUZZY_TERM, k=len(want)).collect()
    ]
    # both rank by score desc; tie order may differ across id spaces, so
    # compare as score-sorted multisets with per-score id sets
    def by_score(rows):
        m = {}
        for i, sc in rows:
            m.setdefault(sc, set()).add(i)
        return m

    assert by_score(got) == by_score(want), (got, want)


def test_span_queries_index_vs_corpus_identity(spark, tmp_path):
    """The three span INDEX paths (term_vectors positions) must agree
    with the corpus-twin expressions (raw full-stream regex positions)
    on the real documents table — the identity the registry oracles
    rely on (entry_queries cites it)."""
    from nlp4l_spark import entry_queries as eq

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    df = docs.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "span_idx_docs")
    IndexBuilder(
        sort_cols=("conv_id", "turn_idx"), store_term_vectors=True
    ).build(df, d)
    s = Searcher(spark, d)
    # doc_id in the index == position in conv_id order == original doc_id
    # (conv_id is the stringified doc_id, zero-padded? no — string sort!)
    # Map index doc_id -> original via stored conv_id instead.
    stored = s.cat.read(spark, "stored").select("doc_id", "conv_id").collect()
    to_orig = {r["doc_id"]: int(r["conv_id"]) for r in stored}

    # span_near
    want = {
        r["doc_id"]: r["n_spans"]
        for r in eq.REGISTRY["span_near_search"][0](spark, sf).collect()
    }
    got_rows = s.search_span_near(
        eq.SPAN_A, eq.SPAN_B, slop=eq.SPAN_SLOP, k=10**6
    ).collect()
    got = {to_orig[r["doc_id"]]: r["n_spans"] for r in got_rows}
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # span_first
    want = {
        r["doc_id"]: (r["n_first"], r["first_pos"])
        for r in eq.REGISTRY["span_first_search"][0](spark, sf).collect()
    }
    got_rows = s.search_span_first(
        eq.SPANF_TERM, end=eq.SPANF_END, k=10**6
    ).collect()
    got = {
        to_orig[r["doc_id"]]: (r["n_first"], r["first_pos"]) for r in got_rows
    }
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # span_not
    want = {
        r["doc_id"]: r["n_clean"]
        for r in eq.REGISTRY["span_not_search"][0](spark, sf).collect()
    }
    got_rows = s.search_span_not(
        eq.SPAN_A, eq.SPAN_B, slop=eq.SPAN_SLOP, k=10**6
    ).collect()
    got = {to_orig[r["doc_id"]]: r["n_clean"] for r in got_rows}
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # span_or (near(or(...), b))
    want = {
        r["doc_id"]: r["n_spans"]
        for r in eq.REGISTRY["span_or_search"][0](spark, sf).collect()
    }
    got_rows = s.search_span_or_near(
        list(eq.SPAN_OR_ALTS),
        eq.SPAN_B,
        slop=eq.SPAN_SLOP,
        in_order=False,
        k=10**6,
    ).collect()
    got = {to_orig[r["doc_id"]]: r["n_spans"] for r in got_rows}
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # span_containing
    want = {
        r["doc_id"]: r["n_spans"]
        for r in eq.REGISTRY["span_containing_search"][0](spark, sf).collect()
    }
    got_rows = s.search_span_containing(
        eq.SPANC_BIG, eq.SPANC_LITTLE, slop=eq.SPANC_SLOP, k=10**6
    ).collect()
    got = {to_orig[r["doc_id"]]: r["n_spans"] for r in got_rows}
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # intervals (minimal ordered, maxgaps)
    want = {
        r["doc_id"]: r["n_intervals"]
        for r in eq.REGISTRY["intervals_ordered"][0](spark, sf).collect()
    }
    got_rows = s.search_intervals(
        eq.SPAN_A, eq.SPAN_B, maxgaps=eq.IV_MAXGAPS, k=10**6
    ).collect()
    got = {to_orig[r["doc_id"]]: r["n_intervals"] for r in got_rows}
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # span_within (the dual)
    want = {
        r["doc_id"]: r["n_within"]
        for r in eq.REGISTRY["span_within_search"][0](spark, sf).collect()
    }
    got_rows = s.search_span_within(
        eq.SPANC_LITTLE, eq.SPANC_BIG, slop=eq.SPANC_SLOP, k=10**6
    ).collect()
    got = {to_orig[r["doc_id"]]: r["n_within"] for r in got_rows}
    got = dict(sorted(got.items())[: len(want)])
    assert got == want
    # boosting: index path vs corpus twin, rank + 6dp score identity
    want_rows = [
        (r["doc_id"], r["score"])
        for r in eq.REGISTRY["boosting_topk"][0](spark, sf).collect()
    ]
    got_rows = [
        (to_orig[r["doc_id"]], round(r["score"], 6))
        for r in s.search_boosting(
            eq.BM25_QUERY, eq.BOOST_NEG, negative_boost=eq.BOOST_FACTOR,
            k=eq.BM25_K,
        ).collect()
    ]
    assert got_rows == want_rows
    # demotion is real on this corpus: boosting reorders vs plain BM25
    plain = [
        r["doc_id"]
        for r in eq.REGISTRY["bm25_topk"][0](spark, sf).collect()
    ]
    assert [d for d, _ in want_rows] != plain
    # significant_text: index path (postings fg docset + term_vectors fg
    # counts + term_stats background) == corpus twin, full-row identity
    want_rows = [
        (r["term"], r["fg_count"], r["bg_count"], r["g2"])
        for r in eq.REGISTRY["significant_text"][0](spark, sf).collect()
    ]
    got_rows = [
        (r["term"], r["fg_count"], r["bg_count"], r["g2"])
        for r in s.significant_text(eq.BM25_QUERY, k=eq.SIGTEXT_K).collect()
    ]
    assert got_rows == want_rows and want_rows

    # term dictionary browse (TermsEnum.seekCeil): index term_stats page
    # == corpus-twin (term, df, cf) page
    want_rows = [
        (r["term"], r["df"], r["cf"])
        for r in eq.REGISTRY["term_browse"][0](spark, sf).collect()
    ]
    got_rows = [
        (r["term"], r["df"], r["cf"])
        for r in s.browse_terms(
            seek=eq.TERM_BROWSE_SEEK, n=eq.TERM_BROWSE_N
        ).collect()
    ]
    assert got_rows == want_rows

    # explain_score corpus twin vs Searcher.explain on the same corpus:
    # identical per-term (tf, df, idf, tf_norm, score) at 6dp
    twin = eq.REGISTRY["explain_score"][0](spark, sf).collect()
    from_orig = {v: k for k, v in to_orig.items()}
    ex = s.explain(eq.BM25_QUERY, from_orig[twin[0]["doc_id"]])
    details = {d["term"]: d for d in ex["details"]}
    assert set(details) == {r["term"] for r in twin}
    for r in twin:
        d = details[r["term"]]
        assert r["tf"] == d["tf"]
        assert r["df"] == d["df"]
        for col in ("idf", "tf_norm", "score"):
            assert abs(r[col] - d[col]) < 5e-7, (r["term"], col)


def test_bm25f_single_field_matches_oracle(spark):
    from nlp4l_spark.oracle import OracleIndex
    from nlp4l_spark.search import bm25f_topk

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["doc_id"], round(r["score"], 6))
        for r in bm25f_topk(df, "join merge vector", fields={"text": 1.0}, k=10).collect()
    ]
    exp = [
        (d, round(s, 6))
        for d, s in OracleIndex.build(DOCS).search("join merge vector", 10)
    ]
    assert got == exp


def test_bm25f_boosts_scale_and_rerank(spark):
    from nlp4l_spark.search import bm25f_topk

    rows = [
        (0, "vector stuff", "join join join merge merge scan scan scan scan"),
        (1, "join merge", "vector vector vector vector scan scan scan scan"),
        (2, "scan scan", "scan scan scan scan scan scan"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, title string, body string")
    base = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk(df, "join merge", fields={"title": 1.0, "body": 1.0}).collect()
    }
    doubled = {
        r["doc_id"]: r["score"]
        for r in bm25f_topk(df, "join merge", fields={"title": 2.0, "body": 2.0}).collect()
    }
    assert set(base) == {0, 1}  # doc 2 matches no query term
    for d in base:
        assert doubled[d] == pytest.approx(2 * base[d], abs=2e-6)
    # a big title boost must outrank body-only matches
    titled = [
        r["doc_id"]
        for r in bm25f_topk(df, "join merge", fields={"title": 10.0, "body": 1.0}).collect()
    ]
    assert titled[0] == 1  # title hit dominates


def test_explain_reconciles_with_search(spark, idx):
    s = Searcher(spark, idx)
    q = "join merge vector"
    top = s.search(q, k=3, method="dataframe").collect()
    for r in top:
        ex = s.explain(q, r["doc_id"])
        assert ex["score"] == pytest.approx(r["score"], abs=1e-9)
        assert sum(d["score"] for d in ex["details"]) == pytest.approx(ex["score"])
        for d in ex["details"]:
            assert d["tf"] >= 1 and d["df"] >= 1 and d["idf"] > 0
    # unknown term explains to zero
    assert s.explain("zzznothere", top[0]["doc_id"])["score"] == 0.0


def test_search_filtered(spark, tmp_path):
    docs = [
        (0, "join merge vector", "user", "grep"),
        (1, "join merge", "assistant", None),
        (2, "vector join", "user", None),
        (3, "merge vector scan", "assistant", "grep"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, role string, tool string"
    ).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        "role",
        "text",
        "tool",
        F.lit(None).cast("timestamp").alias("ts"),
    )
    d = str(tmp_path / "fidx")
    IndexBuilder(sort_cols=("conv_id", "turn_idx")).build(df, d)
    s = Searcher(spark, d)
    full = {
        r["doc_id"]: r["score"]
        for r in s.search("join merge vector", k=10, method="dataframe").collect()
    }
    # role filter restricts candidates; surviving scores are UNCHANGED
    got = {
        r["doc_id"]: r["score"]
        for r in s.search_filtered("join merge vector", {"role": "assistant"}).collect()
    }
    assert set(got) == {1, 3}
    for d_id, sc in got.items():
        assert sc == pytest.approx(full[d_id], abs=1e-12)
    # conjunction of predicates
    both = {r["doc_id"] for r in s.search_filtered(
        "join merge vector", {"role": "user", "tool": "grep"}).collect()}
    assert both == {0}
    # filter matching nothing
    assert s.search_filtered("join", {"role": "nobody"}).count() == 0


def test_fuzzy_transposition_costs_one(spark, idx):
    """Damerau upgrade (VERDICT r2 #5): an adjacent transposition is ONE
    edit (Lucene transpositions=true), so 'jion' reaches 'join' with
    boost 1 - 1/4, not plain-Levenshtein's 1 - 2/4."""
    s = Searcher(spark, idx)
    exp = {r["term"]: r["boost"] for r in s._fuzzy_expansion("jion", 2).collect()}
    assert "join" in exp
    assert exp["join"] == pytest.approx(1 - 1 / 4)
    got = {r["doc_id"] for r in s.search_fuzzy("jion", k=10).collect()}
    assert got == {0, 1, 2, 4}


def test_damerau_levenshtein_matches_duckdb_and_hand_neighbors():
    """The engine's DL function IS the oracle's distance: cross-checked
    against duckdb damerau_levenshtein on random pairs, plus hand-computed
    neighbor sets (including the unrestricted-vs-OSA distinguishing pair)."""
    import duckdb
    import numpy as np

    from nlp4l_spark.search.engine import damerau_levenshtein as dl

    # hand-computed
    assert dl("spark", "sprak") == 1          # transposition
    assert dl("spark", "spark") == 0
    assert dl("ab", "ba") == 1
    assert dl("ca", "abc") == 2               # unrestricted DL (OSA = 3)
    assert dl("kitten", "sitting") == 3       # classic Lev case, no swaps
    assert dl("", "abc") == 3 and dl("abc", "") == 3
    # 1-edit neighborhood of "join" by construction
    for t in ["jon", "joinx", "jorn", "ojin", "jion"]:
        assert dl("join", t) == 1, t
    assert dl("join", "nioj") > 1

    con = duckdb.connect()
    rng = np.random.RandomState(7)
    alpha = list("abcde")
    for _ in range(300):
        a = "".join(rng.choice(alpha, size=rng.randint(0, 7)))
        b = "".join(rng.choice(alpha, size=rng.randint(0, 7)))
        want = con.execute(
            "SELECT damerau_levenshtein(?, ?)", [a, b]
        ).fetchone()[0]
        assert dl(a, b) == want, (a, b, dl(a, b), want)


def test_fuzzy_prefix_length_restricts_expansion(spark, idx):
    """Lucene FuzzyQuery prefixLength: the first N chars must match
    exactly. 'jion'~2 expands to 'join' with prefix_length 0 or 1
    (j matches) but NOT with prefix_length 2 ('ji' != 'jo')."""
    s = Searcher(spark, idx)
    assert {r["term"] for r in s._fuzzy_expansion("jion", 2, 1).collect()} >= {"join"}
    assert "join" not in {
        r["term"] for r in s._fuzzy_expansion("jion", 2, 2).collect()
    }
    # end-to-end: prefix_length=2 kills the only expansion -> no hits
    assert s.search_fuzzy("jion", k=10, prefix_length=2).count() == 0
    same = [
        (r["doc_id"], round(r["score"], 6))
        for r in s.search_fuzzy("jion", k=10, prefix_length=1).collect()
    ]
    base = [
        (r["doc_id"], round(r["score"], 6))
        for r in s.search_fuzzy("jion", k=10).collect()
    ]
    assert same == base  # prefix that all expansions share changes nothing


def test_constant_score_index(spark, idx):
    s = Searcher(spark, idx)
    # MUST join, MUST_NOT scan: docs 0,1,2,4 have join; 3,5 have scan
    got = [
        (r["doc_id"], r["score"])
        for r in s.search_constant_score(["join"], ["scan"], boost=1.5).collect()
    ]
    assert got == [(0, 1.5), (1, 1.5), (2, 1.5), (4, 1.5)]
    # conjunctive MUST set, default boost, docID ascending
    got2 = [r["doc_id"] for r in s.search_constant_score(["join", "merge"]).collect()]
    assert got2 == [0, 1, 4]
    # must_not that excludes everything
    assert s.search_constant_score(["join"], ["join"]).count() == 0


def test_match_bool_prefix_index(spark, idx):
    s = Searcher(spark, idx)
    # rest = ['merge'] scores BM25, prefix 'vec' contributes constant 1.0
    bm = {
        r["doc_id"]: r["score"]
        for r in s.search("merge", k=10, method="dataframe").collect()
    }
    hasvec = {0, 2, 3, 4}
    expect = {
        d: round(bm.get(d, 0.0) + (1.0 if d in hasvec else 0.0), 6)
        for d in set(bm) | hasvec
    }
    got = {
        r["doc_id"]: r["score"]
        for r in s.search_match_bool_prefix("merge vec", k=10).collect()
    }
    assert got == expect
    # single-token query = pure prefix clause, constant 1.0
    got1 = {
        (r["doc_id"], r["score"])
        for r in s.search_match_bool_prefix("vec", k=10).collect()
    }
    assert got1 == {(d, 1.0) for d in hasvec}
    # unknown rest term + unknown prefix -> empty
    assert s.search_match_bool_prefix("zzq yyq", k=10).count() == 0
