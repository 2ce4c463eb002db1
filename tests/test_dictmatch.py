"""Dictionary phrase matching parity with SimpleFSTSuite semantics
(/root/reference/test/org/nlp4l/lucene/SimpleFSTSuite.scala:26-60:
leftMostSubstring / exactMatch round-trips): golden fixtures for the greedy
left-most-longest scan, all-occurrences join, and exact match; plus a
seeded random round-trip (every inserted phrase is found; non-inserted
probes are not)."""

from __future__ import annotations

import numpy as np
import pytest

from nlp4l_spark.ops import dictmatch

DICT = ["tokyo", "tokyo tower", "station", "tokyo station hotel"]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (0, "Tokyo Tower is near tokyo station"),
            (1, "the tokyo station hotel by tokyo station"),
            (2, "no matches here"),
        ],
        "doc_id long, text string",
    )


def test_phrase_occurrences_finds_all_overlapping(docs, spark):
    out = sorted(
        (r["doc_id"], r["start_tok"], r["phrase"])
        for r in dictmatch.phrase_occurrences(docs, DICT).collect()
    )
    assert out == [
        (0, 0, "tokyo"),          # "Tokyo" lowercased
        (0, 0, "tokyo tower"),    # overlapping longer match kept too
        (0, 4, "tokyo"),
        (0, 5, "station"),
        (1, 1, "tokyo"),
        (1, 1, "tokyo station hotel"),
        (1, 2, "station"),
        (1, 5, "tokyo"),
        (1, 6, "station"),
    ]


def test_left_most_longest_greedy(docs):
    out = sorted(
        (r["doc_id"], r["start_tok"], r["n_toks"], r["phrase"])
        for r in dictmatch.annotate_left_most_longest(docs, DICT).collect()
    )
    # doc 0: "tokyo tower" consumes toks 0-1; then "tokyo"@4, "station"@5
    # doc 1: 3-gram wins over "tokyo"@1; scan resumes AFTER it
    assert out == [
        (0, 0, 2, "tokyo tower"),
        (0, 4, 1, "tokyo"),
        (0, 5, 1, "station"),
        (1, 1, 3, "tokyo station hotel"),
        (1, 5, 1, "tokyo"),
        (1, 6, 1, "station"),
    ]


def test_exact_match(spark):
    vals = spark.createDataFrame(
        [("Tokyo Tower",), ("tokyo",), ("tower",), ("tokyo station",)],
        "value string",
    )
    out = {r["value"]: r["matched"] for r in dictmatch.exact_match(vals, "value", DICT).collect()}
    assert out == {
        "Tokyo Tower": True,   # analyzed form equals dictionary entry
        "tokyo": True,
        "tower": False,
        "tokyo station": False,  # only a PREFIX of an entry, not an entry
    }


def test_random_round_trip(spark):
    # SimpleFSTSuite-style: insert random phrases, every one must be found
    rng = np.random.RandomState(11)
    vocab = [f"w{i:03d}" for i in range(40)]
    phrases = sorted(
        {
            " ".join(rng.choice(vocab, size=rng.randint(1, 4)))
            for _ in range(25)
        }
    )
    texts = [
        (i, f"x{i} {p} y{i}") for i, p in enumerate(phrases)
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    occ = dictmatch.phrase_occurrences(df, phrases).collect()
    found_per_doc = {}
    for r in occ:
        found_per_doc.setdefault(r["doc_id"], set()).add(r["phrase"])
    for i, p in enumerate(phrases):
        assert p in found_per_doc.get(i, set()), f"phrase {p!r} not found"
    # probes absent from the dictionary never match exactly
    probe = spark.createDataFrame(
        [("zz absent phrase",), (phrases[0],)], "value string"
    )
    out = {r["value"]: r["matched"] for r in dictmatch.exact_match(probe, "value", phrases).collect()}
    assert out["zz absent phrase"] is False and out[phrases[0]] is True
