"""Degenerate-input robustness for the core build/search path: null /
empty / stopword-only / whitespace-only texts, an all-degenerate corpus,
and duplicate (conv_id, turn_idx) keys. The reference inherits this from
Lucene (empty docs index fine and match nothing); our engine must not
diverge or crash on them."""

from __future__ import annotations

import pytest

from nlp4l_spark.index import build_index
from nlp4l_spark.search import Searcher

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _build(spark, tmp_path, rows, name):
    df = spark.createDataFrame(rows, SCHEMA)
    return build_index(df, str(tmp_path / name))


def test_degenerate_texts_index_and_search(spark, tmp_path):
    rows = [
        ("c0", 0, "user", None, None, None),            # null text
        ("c0", 1, "user", "", None, None),              # empty
        ("c0", 2, "user", "   \t  ", None, None),       # whitespace only
        ("c0", 3, "user", "the and of", None, None),    # stopwords only
        ("c1", 0, "user", "needle in haystack", None, None),
        ("c1", 1, "user", "another needle", None, None),
    ]
    cat = _build(spark, tmp_path, rows, "degen")
    # every turn got a docID and round-trips its text (incl. NULL/empty)
    stored = cat.read(spark, "stored").orderBy("doc_id").collect()
    assert [r["doc_id"] for r in stored] == [0, 1, 2, 3, 4, 5]
    assert stored[0]["text"] is None and stored[1]["text"] == ""
    # dl = 0 for all degenerate docs; field stats count ALL docs
    lens = {r["doc_id"]: r["dl"] for r in cat.read(spark, "doc_lens").collect()}
    assert lens[0] == lens[1] == lens[2] == lens[3] == 0
    fs = cat.read(spark, "field_stats").collect()[0]
    # 'in' is a stopword: both needle docs analyze to dl=2
    assert fs["num_docs"] == 6 and fs["sum_dl"] == 4
    s = Searcher(spark, str(tmp_path / "degen"))
    hits = s.search("needle", k=10).collect()
    # equal tf and dl -> equal score -> Lucene tie-break by docID asc
    assert [h["doc_id"] for h in hits] == [4, 5]
    assert hits[0]["score"] == pytest.approx(hits[1]["score"])
    assert s.search("the and", k=10).count() == 0


def test_all_degenerate_corpus(spark, tmp_path):
    rows = [("c0", i, "user", t, None, None) for i, t in enumerate([None, "", "the"])]
    cat = _build(spark, tmp_path, rows, "allnull")
    fs = cat.read(spark, "field_stats").collect()[0]
    assert fs["num_docs"] == 3 and fs["sum_dl"] == 0
    assert cat.read(spark, "postings").count() == 0
    s = Searcher(spark, str(tmp_path / "allnull"))
    assert s.search("anything", k=5).count() == 0


def test_duplicate_sort_keys_still_dense_and_deterministic(spark, tmp_path):
    # two turns share (conv_id, turn_idx): docIDs must stay dense 0..N-1
    # and the assignment deterministic across parallelism levels
    rows = [
        ("c0", 0, "user", "alpha", None, None),
        ("c0", 0, "agent", "beta", None, None),  # duplicate key
        ("c1", 0, "user", "gamma", None, None),
    ]
    ids = []
    for p, name in [(2, "dup2"), (8, "dup8")]:
        df = spark.createDataFrame(rows, SCHEMA).repartition(p)
        cat = build_index(df, str(tmp_path / name))
        got = sorted(
            (r["doc_id"], r["text"])
            for r in cat.read(spark, "stored").collect()
        )
        ids.append(got)
        assert [d for d, _ in got] == [0, 1, 2]
    assert ids[0] == ids[1]  # identical assignment at both parallelism levels


def test_unicode_text_survives_roundtrip(spark, tmp_path):
    # non-ASCII is outside the token contract ([a-z0-9]+) but must
    # round-trip byte-identically through the stored table
    txt = "café 東京 \U0001f600 mixed ascii words"
    rows = [("c0", 0, "user", txt, None, None),
            ("c0", 1, "user", "plain ascii", None, None)]
    cat = _build(spark, tmp_path, rows, "uni")
    stored = {r["doc_id"]: r["text"] for r in cat.read(spark, "stored").collect()}
    assert stored[0] == txt
    # ASCII subtokens of the unicode doc are still indexed
    s = Searcher(spark, str(tmp_path / "uni"))
    assert {h["doc_id"] for h in s.search("mixed", k=5).collect()} == {0}


def test_new_ops_degenerate_inputs(spark):
    """Empty / whitespace / null text and empty sides must not crash any
    of the session's new ops (ANSI mode turns silent /0 into task
    failures — gopher_filter had exactly that bug)."""
    from nlp4l_spark.ops import textqc
    from nlp4l_spark.ops.asof import asof_join

    deg = spark.createDataFrame(
        [(0, ""), (1, "   "), (2, None), (3, "one real doc here")],
        "doc_id long, text string",
    )
    g = {r["doc_id"]: r for r in textqc.gopher_filter(deg).collect()}
    assert g[0]["n_words"] == 0 and g[0]["keep"] is False
    assert g[1]["n_words"] == 0 and g[1]["keep"] is False
    assert g[3]["n_words"] == 4
    s = {r["doc_id"]: r["script"] for r in textqc.script_profile(deg).collect()}
    assert s[0] == "other" and s[2] == "other"
    n = {r["doc_id"]: r["norm_text"] for r in textqc.normalize_text(deg).collect()}
    assert n[0] == "" and n[1] == "" and n[2] is None
    ld = {r["doc_id"]: r for r in textqc.dedup_lines(deg.fillna({"text": ""})).collect()}
    assert ld[3]["n_kept"] == 1  # '' line deduped after doc 0 claims it
    assert ld[1]["clean_text"] == "   "  # whitespace line is a distinct line
    # asof with an empty right side: all left rows survive unmatched
    left = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    right = spark.createDataFrame([], "k long, ts long, v double")
    out = asof_join(left, right, on="ts", by=("k",), right_cols=("v",)).collect()
    assert len(out) == 1 and out[0]["v_r"] is None


def test_session3_ops_degenerate_inputs(spark, tmp_path):
    """Null/empty/short text must not crash the session-3 ops, and the
    error contracts (missing term_vectors, malformed queries) raise the
    documented ValueErrors instead of producing wrong answers."""
    import pytest as _pytest

    from nlp4l_spark.data.transcripts import synth_transcripts
    from nlp4l_spark.index import build_index
    from nlp4l_spark.ops.chatqc import flagged_turn_triage
    from nlp4l_spark.ops.textqc import ngram_novelty
    from nlp4l_spark.search import Searcher

    deg = spark.createDataFrame(
        [(0, ""), (1, None), (2, "two words"), (3, "a b c a b c")],
        "doc_id long, text string",
    )
    nov = {r["doc_id"]: r for r in ngram_novelty(deg).collect()}
    # only doc 3 has >= 3 tokens; its grams are all first occurrences
    assert list(nov) == [3] and nov[3]["novelty"] == 1.0

    turns = spark.createDataFrame(
        [(0, 0, "user", None, None), (0, 1, "assistant", "", None),
         (0, 2, "user", "x", None), (0, 3, "assistant", "flagme now", None)],
        "conv_id long, turn_idx int, role string, text string, tool string",
    )
    row = flagged_turn_triage(turns, ["flagme"]).collect()[0]
    assert (row["n_role_turns"], row["n_flagged"], row["first_flag_turn"]) == (
        2, 1, 3,
    )

    # error contracts on a term-vector-less index
    idx = str(tmp_path / "deg_idx")
    build_index(synth_transcripts(spark, 300, num_partitions=2), idx)
    s = Searcher(spark, idx)
    with _pytest.raises(ValueError, match="term_vectors"):
        s.search_span_containing(("w00001", "w00002"), "w00003")
    with _pytest.raises(ValueError, match="term_vectors"):
        s.significant_text("w00001")
    with _pytest.raises(ValueError, match="phrase_prefix"):
        s.search_phrase_prefix("single")
    with _pytest.raises(ValueError, match="variant"):
        s.search_bm25_variant("w00001", variant="nope")
    # boosting with an absent negative == plain scoring, not a crash
    base = s.search("w00001", k=3, method="dataframe").collect()
    boosted = s.search_boosting("w00001", "zzznotaterm", k=3).collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in base] == [
        (r["doc_id"], round(r["score"], 9)) for r in boosted
    ]
