"""Classic QueryParser: string -> AST -> Searcher.search_lucene, checked
against the dedicated primitives it compiles onto."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data.transcripts import synth_transcripts
from nlp4l_spark.index import IndexBuilder
from nlp4l_spark.search import Searcher
from nlp4l_spark.search.queryparser import parse


# ---------------- parser (pure, no Spark) ---------------- #
def test_parse_occurs_and_groups():
    ast = parse("+join +(merge vector) -scan")
    occs = [occ for occ, _ in ast["clauses"]]
    assert occs == ["must", "must", "must_not"]
    inner = ast["clauses"][1][1]
    assert inner["kind"] == "bool"
    assert [c[1]["text"] for c in inner["clauses"]] == ["merge", "vector"]


def test_parse_leaf_kinds():
    assert parse("te?m")["kind"] == "wild"
    assert parse("term~1") == {
        "kind": "fuzzy", "text": "term", "max_edits": 1, "boost": 1.0
    }
    assert parse("term~")["max_edits"] == 2
    r = parse("{a TO *}")
    assert (r["lower"], r["upper"], r["incl_lower"]) == ("a", None, False)
    assert parse('"a b"~ fallthrough') is not None  # no crash on extras
    assert parse("x^2.5")["boost"] == 2.5
    assert parse("(a b)^3")["boost"] == 3.0


def test_parse_and_promotes_both_sides():
    ast = parse("a AND b OR c")
    assert [occ for occ, _ in ast["clauses"]] == ["must", "must", "should"]


def test_parse_not_keyword():
    ast = parse("NOT scan join")
    assert [occ for occ, _ in ast["clauses"]] == ["must_not", "should"]


def test_parse_unbalanced_paren_raises():
    with pytest.raises(ValueError):
        parse("(a b")
    with pytest.raises(ValueError):
        parse("a) b")


# ---------------- compiled search ---------------- #
@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("qp_idx") / "idx")
    IndexBuilder(store_term_vectors=True).build(
        synth_transcripts(spark, 1500, num_partitions=4), d
    )
    return d


def _rows(df):
    return [(r["doc_id"], round(r["score"], 6)) for r in df.collect()]


def test_plain_or_matches_search(spark, idx):
    s = Searcher(spark, idx)
    got = _rows(s.search_lucene("w00001 w00454", k=10))
    want = _rows(s.search("w00001 w00454", k=10, method="dataframe"))
    assert got == want


def test_conjunction_matches_operator_and(spark, idx):
    s = Searcher(spark, idx)
    got = _rows(s.search_lucene("w00001 AND w00454", k=10))
    want = _rows(
        s.search("w00001 w00454", k=10, operator="and").select(
            "doc_id", "score"
        )
    )
    assert got == want


def test_nested_group_matches_search_tree(spark, idx):
    s = Searcher(spark, idx)
    got = _rows(s.search_lucene("+w00001 +(w00454 w00711) -w00900", k=10))
    tree = {
        "not": {
            "base": {
                "and": [
                    {"term": "w00001"},
                    {"or": [{"term": "w00454"}, {"term": "w00711"}]},
                ]
            },
            "exclude": {"term": "w00900"},
        }
    }
    want = _rows(s.search_tree(tree, k=10))
    assert got == want


def test_should_bonus_alongside_must(spark, idx):
    """SHOULD next to a MUST never gates the match set but adds score
    where it hits (Lucene BooleanQuery)."""
    s = Searcher(spark, idx)
    must_only = dict(_rows(s.search_lucene("+w00001", k=10**6)))
    mixed = dict(_rows(s.search_lucene("+w00001 w00454", k=10**6)))
    assert set(mixed) == set(must_only)  # match set unchanged
    assert any(mixed[d] > must_only[d] for d in mixed)  # some got the bonus
    assert all(mixed[d] >= must_only[d] for d in mixed)


def test_wildcard_and_range_leaves(spark, idx):
    s = Searcher(spark, idx)
    got = {r["doc_id"] for r in s.search_lucene("w0045?", k=10**6).collect()}
    want = {
        r["doc_id"] for r in s.search_wildcard("w0045?", k=10**6).collect()
    }
    assert got == want and got
    got_r = {
        r["doc_id"]
        for r in s.search_lucene("[w00454 TO w00456]", k=10**6).collect()
    }
    want_r = {
        r["doc_id"]
        for r in s.search_term_range("w00454", "w00456", k=10**6).collect()
    }
    assert got_r == want_r and got_r


def test_fuzzy_leaf_matches_search_fuzzy(spark, idx):
    s = Searcher(spark, idx)
    got = _rows(s.search_lucene("w00454~1", k=10))
    want = _rows(s.search_fuzzy("w00454", k=10, max_edits=1))
    assert got == want


def test_phrase_clause_and_boost(spark, idx):
    s = Searcher(spark, idx)
    got = _rows(s.search_lucene('"w00001 w00454"', k=10))
    want = _rows(s.search_phrase("w00001 w00454", k=10, method="term_vectors"))
    assert got == want
    single = dict(_rows(s.search_lucene("w00001", k=10**6)))
    doubled = dict(_rows(s.search_lucene("w00001^2", k=10**6)))
    assert set(single) == set(doubled)
    for d, v in single.items():
        assert abs(doubled[d] - 2 * v) < 2.1e-6  # scores 6dp-rounded


def test_parse_never_crashes_unexpectedly():
    """Property: arbitrary input either parses or raises ValueError —
    no hangs, no other exception types."""
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        import pytest as _pytest

        _pytest.skip("hypothesis not installed")

    @given(st.text(alphabet='ab ()"+-^~*?[]{}TO0123.', max_size=60))
    @settings(max_examples=300, deadline=None)
    def run(q):
        try:
            parse(q)
        except ValueError:
            pass

    run()


# ---------------- simple_query_string (lenient) ---------------- #
from nlp4l_spark.search.queryparser import parse_simple


def test_simple_parse_operators():
    ast = parse_simple("join + merge | vect* -scan")
    occs = [(occ, c["kind"]) for occ, c in ast["clauses"]]
    assert occs == [
        ("must", "term"), ("must", "term"),
        ("should", "wild"), ("must_not", "term"),
    ]
    assert ast["clauses"][2][1]["pattern"] == "vect*"


def test_simple_parse_phrase_fuzzy_neg_group():
    ast = parse_simple('"a b" word~1 -(c d)')
    occs = [(occ, c["kind"]) for occ, c in ast["clauses"]]
    assert occs == [("should", "phrase"), ("should", "fuzzy"), ("must_not", "bool")]
    assert ast["clauses"][1][1]["max_edits"] == 1


def test_simple_parser_is_lenient_where_classic_raises():
    """The defining property: inputs the classic parser rejects parse
    to SOMETHING (or None) here — never an exception."""
    for q in ["(a b", "a) b", "a ^2", "+", "|", "-", '"unclosed', "~", ""]:
        parse_simple(q)  # must not raise
    assert parse_simple("(a b")["kind"] == "bool" or parse_simple("(a b") is not None
    assert parse_simple("") is None
    assert parse_simple("+ | -") is None


def test_simple_parse_never_crashes():
    try:
        from hypothesis import given, settings
        from hypothesis import strategies as st
    except ImportError:
        import pytest as _pytest

        _pytest.skip("hypothesis not installed")

    @given(st.text(alphabet='ab ()"+-|~*?.', max_size=60))
    @settings(max_examples=300, deadline=None)
    def run(q):
        parse_simple(q)  # NEVER raises, by contract

    run()


def test_search_simple_matches_search_lucene_equivalent(spark, idx):
    """'w00001 + w00002 | w0001* -w00003' under the simple grammar is
    the classic '+w00001 +w00002 w0001* -w00003' (AND both neighbors,
    OR keeps SHOULD) — identical frames end-to-end."""
    s = Searcher(spark, idx)
    simple = s.search_simple("w00001 + w00002 | w0001* -w00003", k=8)
    classic = s.search_lucene("+w00001 +w00002 w0001* -w00003", k=8)
    assert _rows(simple) == _rows(classic)


def test_search_simple_lenient_end_to_end(spark, idx):
    """Malformed query strings still search (using what parsed) —
    no exception anywhere in the pipeline."""
    s = Searcher(spark, idx)
    assert s.search_simple("(w00001 w00002", k=5).count() > 0
    assert s.search_simple('w00001 ")" |', k=5).count() > 0
    assert s.search_simple("+ | -", k=5).count() == 0


def test_phrase_slop_parses_in_both_grammars():
    assert parse('"a b"~2')["slop"] == 2
    assert parse('"a b"')["slop"] == 0
    assert parse('"a b"~')["slop"] == 0  # lenient bare ~
    assert parse_simple('"a b"~3')["slop"] == 3
    assert parse_simple('"a b"')["slop"] == 0


def test_phrase_slop_compiles_to_sloppy_frame(spark, idx):
    """'"w00001 w00002"~2' in BOTH grammars must equal the dedicated
    search_sloppy_phrase top-k (same fractional-tf frame)."""
    s = Searcher(spark, idx)
    want = _rows(s.search_sloppy_phrase("w00001", "w00002", slop=2, k=8))
    assert want, "fixture should produce sloppy matches"
    assert _rows(s.search_lucene('"w00001 w00002"~2', k=8)) == want
    assert _rows(s.search_simple('"w00001 w00002"~2', k=8)) == want
    # and slop=0 still takes the exact-phrase path
    exact = _rows(s.search_lucene('"w00001 w00002"', k=8))
    assert exact == _rows(s.search_simple('"w00001 w00002"', k=8))
