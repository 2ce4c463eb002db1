"""Extended similarity / query-type surface over the index: Lucene
SynonymQuery, LM Dirichlet / Jelinek-Mercer, ClassicSimilarity,
MultiPhraseQuery, and the dictionary autocomplete suggester. Index
results must equal first-principles Python computations of the published
formulas on a hand-checked corpus, and reduce to existing query types in
their degenerate cases (singleton synonym group == TermQuery, one
alternative per slot == PhraseQuery)."""

from __future__ import annotations

import math

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
    (5, "scan scan scan hash join"),
]
TOKS = {d: t.split() for d, t in DOCS}
N = len(DOCS)
TOTAL = sum(len(t) for t in TOKS.values())
AVGDL = TOTAL / N


def _df(term):
    return sum(1 for t in TOKS.values() if term in t)


def _cf(term):
    return sum(t.count(term) for t in TOKS.values())


def _idf(df):
    return math.log(1.0 + (N - df + 0.5) / (df + 0.5))


def _bm25_norm(tf, dl):
    return tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / AVGDL))


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("simidx") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    IndexBuilder(
        sort_cols=("conv_id", "turn_idx"), store_term_vectors=True
    ).build(df, d)
    return d


def _got(df):
    return {r["doc_id"]: round(r["score"], 9) for r in df.collect()}


def test_synonym_blend(spark, idx):
    s = Searcher(spark, idx)
    groups = [["join", "merge"], ["vector"]]
    expect = {}
    for d, toks in TOKS.items():
        dl, score = len(toks), 0.0
        for g in groups:
            tf = sum(toks.count(t) for t in g)
            if tf:
                score += _idf(max(_df(t) for t in g)) * _bm25_norm(tf, dl)
        if score:
            expect[d] = round(score, 9)
    assert _got(s.search_synonym(groups, k=10)) == expect


def test_synonym_singleton_equals_term_query(spark, idx):
    s = Searcher(spark, idx)
    syn = _got(s.search_synonym([["vector"]], k=10))
    plain = _got(s.search("vector", k=10, method="dataframe"))
    assert syn == plain


def test_lm_dirichlet(spark, idx):
    s = Searcher(spark, idx)
    mu = 2000.0
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score, match = len(toks), 0.0, False
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            match = True
            p = (_cf(t) + 1.0) / (TOTAL + 1.0)
            score += max(
                0.0, math.log(1 + tf / (mu * p)) + math.log(mu / (dl + mu))
            )
        if match:
            expect[d] = round(score, 9)
    assert _got(s.search_lm("join merge vector", similarity="dirichlet")) == expect
    # the clamp is real on this corpus: some matching docs score exactly 0
    assert 0.0 in expect.values()


def test_lm_jelinek_mercer(spark, idx):
    s = Searcher(spark, idx)
    lam = 0.7
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score = len(toks), 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            p = (_cf(t) + 1.0) / (TOTAL + 1.0)
            score += math.log(1 + ((1 - lam) * tf / dl) / (lam * p))
        if score:
            expect[d] = round(score, 9)
    assert _got(s.search_lm("join merge vector", similarity="jm")) == expect
    # JM scores are strictly positive for every matching doc
    assert all(v > 0 for v in expect.values())


def test_classic_similarity(spark, idx):
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score = len(toks), 0.0
        for t in terms:
            tf = toks.count(t)
            if tf:
                idf_c = 1.0 + math.log(N / (_df(t) + 1.0))
                score += math.sqrt(tf) * idf_c * idf_c / math.sqrt(dl)
        if score:
            expect[d] = round(score, 9)
    assert _got(s.search_classic("join merge vector")) == expect


def test_dfr_inl2(spark, idx):
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score = len(toks), 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            tfn = tf * math.log2(1 + AVGDL / dl)
            score += tfn * math.log2((N + 1) / (_df(t) + 0.5)) / (tfn + 1)
        if score:
            expect[d] = round(score, 9)
    assert _got(s.search_dfr("join merge vector")) == expect


def test_axiomatic_f2exp(spark, idx):
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score = len(toks), 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            score += ((N + 1) / _df(t)) ** 0.35 * tf / (
                tf + 0.5 + 0.5 * dl / AVGDL
            )
        if score:
            expect[d] = round(score, 9)
    assert _got(s.search_axiomatic("join merge vector")) == expect


def test_ib_ll_df_h2(spark, idx):
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score = len(toks), 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            tfn = tf * math.log2(1 + AVGDL / dl)
            lam = (_df(t) + 1.0) / (N + 1.0)
            score += math.log(1 + tfn / lam)
        if score:
            expect[d] = round(score, 9)
    assert _got(s.search_ib("join merge vector")) == expect


def test_dfi_chi_squared(spark, idx):
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    expect = {}
    clamped = 0
    for d, toks in TOKS.items():
        dl, score, match = len(toks), 0.0, False
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            match = True
            exp_tf = (_cf(t) + 1.0) * dl / (TOTAL + 1.0)
            if tf <= exp_tf:
                clamped += 1
                continue
            score += math.log2((tf - exp_tf) ** 2 / exp_tf + 1)
        if match:
            expect[d] = round(score, 9)
    assert _got(s.search_dfi("join merge vector")) == expect
    # the chance-level early-out is real on this corpus
    assert clamped > 0


def test_bm25_plus_and_l(spark, idx):
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    exp_plus, exp_l = {}, {}
    for d, toks in TOKS.items():
        dl = len(toks)
        norm = 1 - 0.75 + 0.75 * dl / AVGDL
        sp = sl = 0.0
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            sp += _idf(_df(t)) * (2.2 * tf / (1.2 * norm + tf) + 1.0)
            cp = tf / norm
            sl += _idf(_df(t)) * 2.2 * (cp + 0.5) / (1.2 + cp + 0.5)
        if sp:
            exp_plus[d] = round(sp, 9)
            exp_l[d] = round(sl, 9)
    assert _got(s.search_bm25_variant("join merge vector", variant="plus")) == exp_plus
    assert _got(s.search_bm25_variant("join merge vector", variant="l")) == exp_l
    # delta=0 BM25+ degenerates to plain BM25
    plain = _got(s.search("join merge vector", k=10, method="dataframe"))
    zero = _got(
        s.search_bm25_variant("join merge vector", variant="plus", delta=0.0)
    )
    assert zero == plain


def test_phrase_prefix(spark, idx):
    s = Searcher(spark, idx)
    # "scan s*" expands against the term dictionary to {scan, spark};
    # doc 5 = "scan scan scan hash join" anchors at positions 0 and 1
    got = _got(s.search_phrase_prefix("scan s", k=10))
    all_terms = ["scan", "spark"]
    idf_total = sum(_idf(_df(t)) for t in all_terms)
    tf, dl = 2.0, 5.0
    expect = {5: round(idf_total * _bm25_norm(tf, dl), 9)}
    assert got == expect
    # single-expansion prefix == MultiPhraseQuery with that term
    pp = _got(s.search_phrase_prefix("join m", k=10))
    mp = _got(s.search_multi_phrase([["join"], ["merge"]], k=10))
    assert pp == mp and pp
    # unknown prefix -> empty
    assert s.search_phrase_prefix("join zz", k=10).count() == 0


def test_regexp_query(spark, idx):
    s = Searcher(spark, idx)
    got = sorted(r["doc_id"] for r in s.search_regexp("(jo|sp).*[nk]").collect())
    expect = sorted(
        d
        for d, toks in TOKS.items()
        if any(t == "join" or t == "spark" for t in toks)
    )
    assert got == expect
    # whole-term anchoring: 'oi' alone matches nothing (substring would)
    assert s.search_regexp("oi").count() == 0
    # equals the equivalent wildcard rewrite
    wc = sorted(r["doc_id"] for r in s.search_wildcard("s?a*").collect())
    rx = sorted(r["doc_id"] for r in s.search_regexp("s.a.*").collect())
    assert rx == wc
    with pytest.raises(ValueError):
        s.search_regexp(".*", max_expansions=2)


def test_function_score(spark, tmp_path):
    """BM25 × exp recency decay: hand-computed on a 3-doc corpus with
    explicit timestamps; origin=None resolves to the corpus max ts, and
    an infinite half-life degenerates to plain BM25 ordering."""
    import datetime as dt

    from nlp4l_spark.index import IndexBuilder

    base = dt.datetime(2026, 1, 1)
    rows = [
        (0, "join merge", base),
        (1, "join merge", base - dt.timedelta(days=180)),
        (2, "join scan", base - dt.timedelta(days=360)),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, ts timestamp").select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        "ts",
    )
    d = str(tmp_path / "fsidx")
    IndexBuilder(sort_cols=("conv_id", "turn_idx")).build(df, d)
    s = Searcher(spark, d)

    toks = {r[0]: r[1].split() for r in rows}
    n, total = len(rows), sum(len(t) for t in toks.values())
    avgdl = total / n

    def bm25(doc, terms):
        out, dl = 0.0, len(toks[doc])
        for t in terms:
            tf = toks[doc].count(t)
            if tf:
                df_ = sum(1 for v in toks.values() if t in v)
                idf = math.log(1 + (n - df_ + 0.5) / (df_ + 0.5))
                out += idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return out

    got = {
        r["doc_id"]: r["score"]
        for r in s.search_function_score("join merge", half_life_days=180.0).collect()
    }
    rate = math.log(2.0) / (180.0 * 86400.0)
    ages = {0: 0.0, 1: 180 * 86400.0, 2: 360 * 86400.0}
    expect = {
        doc: bm25(doc, ["join", "merge"]) * math.exp(-rate * ages[doc])
        for doc in toks
    }
    assert set(got) == set(expect)
    for doc in expect:
        assert got[doc] == pytest.approx(expect[doc], rel=1e-9)
    # docs 0 and 1 tie on BM25; the decay must break the tie toward recent
    order = [
        r["doc_id"]
        for r in s.search_function_score("join merge", half_life_days=180.0).collect()
    ]
    assert order[0] == 0 and 1 in order[1:]
    # huge half-life -> plain BM25 ordering (scores converge to search())
    plain = {
        r["doc_id"]: r["score"]
        for r in s.search("join merge", k=10, method="dataframe").collect()
    }
    loose = {
        r["doc_id"]: r["score"]
        for r in s.search_function_score("join merge", half_life_days=1e12).collect()
    }
    for doc in plain:
        assert loose[doc] == pytest.approx(plain[doc], rel=1e-6)


def test_suggest_complete(spark, idx):
    s = Searcher(spark, idx)
    got = [(r["term"], r["cf"]) for r in s.suggest_complete("s", 10).collect()]
    # cf desc, term asc over the dictionary entries with the prefix
    assert got == [("scan", 4), ("spark", 1)]
    assert s.suggest_complete("zzz", 5).count() == 0


def test_multi_phrase(spark, idx):
    s = Searcher(spark, idx)
    slots = [["hash", "merge"], ["join"]]
    members = ["hash", "join", "merge"]
    idf_total = sum(_idf(_df(t)) for t in members)
    expect = {}
    for d, toks in TOKS.items():
        tf = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] in slots[0] and toks[i + 1] in slots[1]
        )
        if tf:
            expect[d] = round(idf_total * _bm25_norm(tf, len(toks)), 9)
    assert expect  # doc 5 has "hash join"
    assert _got(s.search_multi_phrase(slots, k=10)) == expect


def test_multi_phrase_single_alternative_equals_phrase(spark, idx):
    s = Searcher(spark, idx)
    mp = _got(s.search_multi_phrase([["join"], ["merge"]], k=10))
    ph = _got(s.search_phrase("join merge", k=10))
    assert mp == ph


def test_mmr_rerank(spark):
    """MMR must demote a redundant near-duplicate of an already-selected
    result in favor of a diverse one, and degenerate to pure relevance
    order at lam=1."""
    from nlp4l_spark.ops.similarity import mmr_rerank

    rows = [
        (0, [1.0, 0.0, 0.0]),        # the query
        (1, [0.99, 0.14, 0.0]),      # most relevant
        (2, [0.98, 0.199, 0.0]),     # near-duplicate of 1, 2nd by rel
        (3, [0.7, 0.0, 0.71]),       # diverse, 3rd by rel
        (4, [0.6, 0.0, 0.8]),        # diverse-ish, least relevant
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    qvec = rows[0][1]
    cand = emb.filter("vec_id != 0")
    got = [
        (r["rank"], r["vec_id"])
        for r in mmr_rerank(cand, qvec, k=3, c=4, lam=0.5).collect()
    ]
    # pick 1 first (pure rel), then 3 (2 is too close to 1); 2 returns
    # third because 4 is nearly parallel to the already-picked 3
    assert got == [(1, 1), (2, 3), (3, 2)]
    # lam=1 -> pure relevance order
    got_rel = [
        r["vec_id"] for r in mmr_rerank(cand, qvec, k=4, c=4, lam=1.0).collect()
    ]
    assert got_rel == [1, 2, 3, 4]
    # k larger than candidate pool: returns the whole pool, ranks contiguous
    got_all = [
        (r["rank"], r["vec_id"])
        for r in mmr_rerank(cand, qvec, k=10, c=4, lam=0.5).collect()
    ]
    assert [r for r, _ in got_all] == [1, 2, 3, 4]
    assert sorted(v for _, v in got_all) == [1, 2, 3, 4]


@pytest.fixture(scope="module")
def grouped_idx(spark, tmp_path_factory):
    """Same 6 docs but two turns per conversation (conv = doc_id // 2)."""
    d = str(tmp_path_factory.mktemp("collapseidx") / "idx")
    df = spark.createDataFrame(DOCS, "doc_id long, text string").select(
        (F.col("doc_id") / 2).cast("long").cast("string").alias("conv_id"),
        (F.col("doc_id") % 2).cast("int").alias("turn_idx"),
        F.lit("u").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    IndexBuilder(sort_cols=("conv_id", "turn_idx")).build(df, d)
    return d


def test_search_collapse(spark, grouped_idx):
    s = Searcher(spark, grouped_idx)
    terms = ["join", "merge", "vector"]
    scores = {}
    for d, toks in TOKS.items():
        sc = sum(
            _idf(_df(t)) * _bm25_norm(toks.count(t), len(toks))
            for t in terms
            if t in toks
        )
        if sc:
            scores[d] = sc
    # expected: best doc per conv group, then global order
    best = {}
    for d, sc in scores.items():
        g = d // 2
        if g not in best or (-sc, d) < (-best[g][1], best[g][0]):
            best[g] = (d, sc)
    expect = sorted(
        ((d, g, round(sc, 9)) for g, (d, sc) in best.items()),
        key=lambda x: (-x[2], x[0]),
    )
    got = [
        (r["doc_id"], int(r["conv_id"]), round(r["score"], 9))
        for r in s.search_collapse("join merge vector", k=10).collect()
    ]
    assert got == expect
    # every conversation appears at most once
    assert len({g for _, g, _ in got}) == len(got)
    # collapse never outranks plain search's best doc
    plain_top = s.search("join merge vector", k=1, method="dataframe").collect()
    assert got[0][0] == plain_top[0]["doc_id"]


def test_facet_ranges(spark, grouped_idx):
    s = Searcher(spark, grouped_idx)
    # every doc with "scan" (docs 3, 5); bucket turn_idx by width 1
    got = {
        r["bucket"]: r["cnt"]
        for r in s.facet_ranges("scan", "turn_idx", 1.0).collect()
    }
    # doc 3 -> turn_idx 1, doc 5 -> turn_idx 1
    assert got == {1.0: 2}
    got2 = {
        r["bucket"]: r["cnt"]
        for r in s.facet_ranges("join", "turn_idx", 2.0).collect()
    }
    # all 5 join docs land in the single [0, 2) bucket
    assert got2 == {0.0: 5}
    assert s.facet_ranges("zzznope", "turn_idx", 1.0).count() == 0


def test_sloppy_phrase(spark, idx):
    s = Searcher(spark, idx)
    slop, win = 2, 3
    dfj, dfm = _df("join"), _df("merge")
    idf_total = _idf(dfj) + _idf(dfm)
    expect = {}
    for d, toks in TOKS.items():
        pa = [i for i, t in enumerate(toks) if t == "join"]
        pb = [i for i, t in enumerate(toks) if t == "merge"]
        tf = sum(
            1.0 / (j - i) for i in pa for j in pb if j > i and j - i <= win
        )
        if tf:
            expect[d] = round(idf_total * _bm25_norm(tf, len(toks)), 9)
    assert expect
    got = _got(s.search_sloppy_phrase("join", "merge", slop=slop, k=10))
    assert got == expect
    # slop=0 degenerates to the exact PhraseQuery scores
    sp0 = _got(s.search_sloppy_phrase("join", "merge", slop=0, k=10))
    ph = _got(s.search_phrase("join merge", k=10))
    assert sp0 == ph
    # unknown term -> empty
    assert s.search_sloppy_phrase("join", "zzz", slop=2).count() == 0


def test_search_after_pages_tile_the_ranking(spark, idx):
    s = Searcher(spark, idx)
    q = "join merge vector"
    full = [
        (r["doc_id"], r["score"])
        for r in s.search(q, k=10, method="dataframe").collect()
    ]
    assert len(full) >= 4
    page1 = full[:2]
    after = s.search_after(q, page1[-1][1], page1[-1][0], k=2).collect()
    page2 = [(r["doc_id"], r["score"]) for r in after]
    assert page1 + page2 == full[:4]
    # cursor past the end -> empty
    last = full[-1]
    assert s.search_after(q, last[1], last[0], k=5).count() == 0
    # unknown-terms query -> empty
    assert s.search_after("zzznope", 1.0, 0, k=5).count() == 0


def test_search_sorted_by_field(spark, grouped_idx):
    s = Searcher(spark, grouped_idx)
    # docs matching "join", newest-first by turn_idx desc
    match = sorted(d for d, toks in TOKS.items() if "join" in toks)
    got = [
        (r["doc_id"], r["turn_idx"])
        for r in s.search_sorted("join", "turn_idx", k=10).collect()
    ]
    expect = sorted(
        ((d, d % 2) for d in match), key=lambda x: (-x[1], x[0])
    )
    assert got == expect
    asc = [
        r["doc_id"]
        for r in s.search_sorted("join", "turn_idx", k=10, ascending=True).collect()
    ]
    assert asc == [d for d, _ in sorted(((d, d % 2) for d in match), key=lambda x: (x[1], x[0]))]


def test_count(spark, idx):
    s = Searcher(spark, idx)
    assert s.count("join") == sum(1 for t in TOKS.values() if "join" in t)
    assert s.count("join vector") == sum(
        1 for t in TOKS.values() if "join" in t or "vector" in t
    )
    assert s.count("zzznope") == 0
    # single-term count equals the dictionary df
    assert s.count("scan") == _df("scan")


def test_new_query_guards(spark, idx):
    s = Searcher(spark, idx)
    with pytest.raises(ValueError):
        s.facet_ranges("join", "turn_idx", 0)
    with pytest.raises(ValueError):
        s.search_function_score("join", half_life_days=0)
    with pytest.raises(ValueError):
        s.search_sloppy_phrase("join", "merge", slop=-1)
    # the idx fixture stores NULL ts everywhere: origin inference must
    # fail loudly instead of silently nulling every score
    with pytest.raises(ValueError, match="all-NULL"):
        s.search_function_score("join")


def test_search_rescore(spark, idx):
    s = Searcher(spark, idx)
    q, phrase, w = "join merge vector", "join merge", 2.0
    terms = ["join", "merge", "vector"]
    first = {}
    for d, toks in TOKS.items():
        sc = sum(
            _idf(_df(t)) * _bm25_norm(toks.count(t), len(toks))
            for t in terms
            if t in toks
        )
        if sc:
            first[d] = round(sc, 6)
    idf_ph = _idf(_df("join")) + _idf(_df("merge"))
    expect = {}
    for d, s1 in first.items():
        toks = TOKS[d]
        tf = sum(
            1
            for i in range(len(toks) - 1)
            if toks[i] == "join" and toks[i + 1] == "merge"
        )
        s2 = idf_ph * _bm25_norm(tf, len(toks)) if tf else 0.0
        expect[d] = round(s1 + w * s2, 9)
    got = _got(s.search_rescore(q, phrase, k=10, window=50, weight=w))
    assert got == expect
    # the phrase boost actually reorders: docs with adjacent "join merge"
    # must outrank an otherwise-higher BM25 doc without the phrase
    order = [
        r["doc_id"]
        for r in s.search_rescore(q, phrase, k=10, window=50, weight=100.0).collect()
    ]
    phrase_docs = {
        d
        for d, toks in TOKS.items()
        if any(
            toks[i] == "join" and toks[i + 1] == "merge"
            for i in range(len(toks) - 1)
        )
    }
    assert set(order[: len(phrase_docs)]) == phrase_docs
    # weight 0 == plain first pass (rounded)
    w0 = _got(s.search_rescore(q, phrase, k=10, window=50, weight=0.0))
    assert w0 == {d: round(v, 9) for d, v in first.items()}
    with pytest.raises(ValueError):
        s.search_rescore(q, "three word phrase")


def test_search_tree(spark, idx):
    s = Searcher(spark, idx)
    tree = {
        "not": {
            "base": {
                "and": [
                    {"term": "join"},
                    {"or": [{"term": "merge"}, {"term": "vector"}]},
                ]
            },
            "exclude": {"term": "scan"},
        }
    }
    expect = {}
    for d, toks in TOKS.items():
        if "join" not in toks or not ({"merge", "vector"} & set(toks)):
            continue
        if "scan" in toks:
            continue
        sc = sum(
            _idf(_df(t)) * _bm25_norm(toks.count(t), len(toks))
            for t in ("join", "merge", "vector")
            if t in toks
        )
        expect[d] = round(sc, 9)
    assert expect
    assert _got(s.search_tree(tree, k=10)) == expect
    # degenerate identities vs the flat boolean surface
    flat_and = _got(
        s.search_tree({"and": [{"term": "join"}, {"term": "merge"}]})
    )
    # AND restricts candidates; compare against search_boolean must
    ref_must = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search_boolean(must=["join", "merge"], k=10).collect()
    }
    assert flat_and == ref_must
    flat_or = _got(
        s.search_tree({"or": [{"term": "join"}, {"term": "merge"}]})
    )
    ref_or = {
        r["doc_id"]: round(r["score"], 9)
        for r in s.search_boolean(should=["join", "merge"], k=10).collect()
    }
    assert flat_or == ref_or
    # boost on a leaf
    b = _got(s.search_tree({"or": [{"term": "vector", "boost": 3.0}]}))
    plain = _got(s.search_tree({"or": [{"term": "vector"}]}))
    assert all(b[d] == pytest.approx(3 * plain[d], abs=5e-9) for d in plain)
    # unknown term in AND -> empty; in OR -> ignored
    assert s.search_tree({"and": [{"term": "join"}, {"term": "zzz"}]}).count() == 0
    assert _got(s.search_tree({"or": [{"term": "join"}, {"term": "zzz"}]}))


def test_pl2(spark, idx):
    """Terrier PL2 (DFR BasicModelP + AfterEffectL + NormalizationH2):
    index path equals the published formula computed first-principles,
    with lambda = cf/N and H2 tfn."""
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    log2e = 1.0 / math.log(2.0)
    expect = {}
    for d, toks in TOKS.items():
        dl, score, match = len(toks), 0.0, False
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            match = True
            lam = _cf(t) / N
            tfn = tf * math.log2(1 + AVGDL / dl)
            score += (
                tfn * math.log2(tfn / lam)
                + (lam - tfn) * log2e
                + 0.5 * math.log2(2 * math.pi * tfn)
            ) / (tfn + 1)
        if match:
            expect[d] = round(score, 9)
    got = _got(s.search_pl2("join merge vector", k=10))
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=5e-9)


def test_dph(spark, idx):
    """Terrier DPH (parameter-free hypergeometric DFR): index path
    equals the published formula; a term filling its whole document
    (tf = dl) contributes 0 by the documented deviation."""
    s = Searcher(spark, idx)
    terms = ["join", "merge", "vector"]
    expect = {}
    for d, toks in TOKS.items():
        dl, score, match = len(toks), 0.0, False
        for t in terms:
            tf = toks.count(t)
            if not tf:
                continue
            match = True
            if tf >= dl:
                continue
            f = tf / dl
            score += (
                (1 - f) ** 2
                / (tf + 1)
                * (
                    tf * math.log2((tf * AVGDL / dl) * (N / _cf(t)))
                    + 0.5 * math.log2(2 * math.pi * tf * (1 - f))
                )
            )
        if match:
            expect[d] = round(score, 9)
    got = _got(s.search_dph("join merge vector", k=10))
    assert set(got) == set(expect)
    for d in expect:
        assert got[d] == pytest.approx(expect[d], abs=5e-9)


def test_dph_degenerate_doc_scores_zero(spark, tmp_path):
    """A document that is one term repeated (tf = dl) must take score 0
    under DPH's guarded log, not NaN/-inf."""
    from pyspark.sql import functions as FF

    d = str(tmp_path / "dphidx")
    rows = [(0, "zz zz zz"), (1, "zz join scan")]
    df = spark.createDataFrame(rows, "doc_id long, text string").select(
        FF.col("doc_id").cast("string").alias("conv_id"),
        FF.lit(0).alias("turn_idx"),
        FF.lit("u").alias("role"),
        "text",
        FF.lit(None).cast("string").alias("tool"),
        FF.lit(None).cast("timestamp").alias("ts"),
    )
    IndexBuilder(sort_cols=("conv_id", "turn_idx")).build(df, d)
    got = _got(Searcher(spark, d).search_dph("zz", k=10))
    assert got[0] == 0.0
    assert got[1] != 0.0 and not math.isnan(got[1])
