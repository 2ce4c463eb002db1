"""Ops-layer tests: processors parity semantics, dedup, similarity, text QC,
multimodal plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from nlp4l_spark.ops import dedup, multimodal, processors, similarity, textqc


# ---------------- processors ------------------------------------------- #
def test_unique(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b")], "id int, k string"
    )
    out = processors.unique(df, "k").orderBy("id").collect()
    assert [(r["id"], r["k"]) for r in out] == [(1, "a"), (3, "b")]


def test_merge_records(spark):
    df = spark.createDataFrame(
        [("x", "hello"), ("x", "world"), ("y", "solo")], "k string, v string"
    )
    out = {
        r["k"]: r["v"]
        for r in processors.merge_records(df, "k", glue="_").collect()
    }
    assert out["y"] == "solo"
    assert set(out["x"].split("_")) == {"hello", "world"}


def test_replay(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "record_hash long, v string"
    )
    mods = spark.createDataFrame([(2, "B")], "record_hash long, v string")
    adds = spark.createDataFrame([(9, "z")], "record_hash long, v string")
    out = {
        r["record_hash"]: r["v"]
        for r in processors.replay(
            base, modified=mods, deleted_hashes=[3], added=adds
        ).collect()
    }
    assert out == {1: "a", 2: "B", 9: "z"}


def test_validators(spark):
    df = spark.createDataFrame([("abc",), ("a1c",)], "v string")
    ok, bad = processors.regex_validator(df, "v", "^[a-z]+$")
    assert (ok, bad) == (False, 1)
    ok, dup = processors.unique_record_validator(df, "v")
    assert (ok, dup) == (True, 0)


def test_dcm_truncate(spark):
    df = spark.createDataFrame(
        [(1, [10, 11, 12, 13], [0, 1, 1, 0]), (2, [20, 21], [0, 0])],
        "u int, imps array<int>, clicks array<int>",
    )
    out = {r["u"]: r["imps"] for r in processors.dcm_truncate(df, "imps", "clicks").collect()}
    assert out[1] == [10, 11, 12]  # truncated at last click (pos 3)
    assert out[2] == []  # no clicks -> everything truncated


def test_parse_solr_log(spark):
    from nlp4l_spark.entry_queries import SOLR_LOG_LINES

    df = spark.createDataFrame([(l,) for l in SOLR_LOG_LINES], "line string")
    rows = processors.parse_solr_log(df).collect()
    assert rows[0]["q"] == "apple"
    assert rows[0]["fq"] == "type:fruit"
    assert rows[0]["facet_field"] == "category"
    assert rows[0]["hits"] == 42 and rows[0]["qtime"] == 3
    assert rows[1]["facet_query"] == "price:[0+TO+100]"
    assert rows[2]["q"] == "*:*" and rows[2]["hits"] == 1000


# ---------------- dedup ------------------------------------------------- #
DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "The  quick brown fox jumps over the lazy dog"),  # ws/case variant
    (2, "the quick brown fox jumps over the lazy cat"),   # near-dup
    (3, "completely different content about spark engines"),
    (4, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(docs_df):
    kept = sorted(r["doc_id"] for r in dedup.exact_dedup(docs_df).collect())
    assert kept == [0, 2, 3]  # 1 and 4 normalize to doc 0's text


def test_ngram_jaccard_pairs(docs_df):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs_df, threshold=0.5).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] == 1.0
    assert (0, 4) in pairs and pairs[(0, 4)] == 1.0
    assert (0, 2) in pairs and 0.5 <= pairs[(0, 2)] < 1.0
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dups(docs_df):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.minhash_lsh_pairs(
            docs_df, jaccard_threshold=0.5
        ).collect()
    }
    assert (0, 1) in pairs and (0, 4) in pairs
    assert all(j >= 0.5 for j in pairs.values())


def test_simhash_pairs(docs_df):
    # d<=3 is the complete regime (4-piece pigeonhole): output must be
    # EXACTLY the brute-force hamming-<=3 pair set — here the three
    # identical-token-multiset pairs.
    out = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(docs_df, max_hamming=3).collect()
    }
    assert out == {(0, 1): 0, (0, 4): 0, (1, 4): 0}


def test_simhash_fingerprint_metric(docs_df):
    # fingerprints: near-dup text -> small hamming, unrelated -> large
    fp = {
        r["id"]: (r["fp_hi"], r["fp_lo"])
        for r in dedup.simhash_fingerprints(docs_df).collect()
    }

    def ham(a, b):
        return bin(fp[a][0] ^ fp[b][0]).count("1") + bin(
            fp[a][1] ^ fp[b][1]
        ).count("1")

    assert ham(0, 1) == 0 and ham(0, 4) == 0
    assert 0 < ham(0, 2) < ham(0, 3)  # one-token diff << unrelated doc


# ---------------- similarity -------------------------------------------- #
@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(0)
    vecs = rng.standard_normal((50, 16)).astype(np.float32)
    vecs[7] = vecs[0] * 1.5  # same direction as vec 0
    return spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(50)],
        "vec_id long, embedding array<float>",
    )


def test_brute_force_cosine(emb_df):
    q = emb_df.filter("vec_id = 0").collect()[0]["embedding"]
    top = similarity.brute_force_cosine_topk(emb_df, q, k=3).collect()
    assert [r["vec_id"] for r in top[:2]] == [0, 7]
    assert top[0]["cosine"] == pytest.approx(1.0)
    assert top[1]["cosine"] == pytest.approx(1.0)


def test_lsh_recall_vs_brute(emb_df):
    q = emb_df.filter("vec_id = 0").collect()[0]["embedding"]
    brute = [r["vec_id"] for r in similarity.brute_force_cosine_topk(emb_df, q, k=5).collect()]
    lsh = [r["vec_id"] for r in similarity.lsh_cosine_topk(emb_df, q, k=5, bits=4, tables=8).collect()]
    # recall@5 of the identical-direction vectors must be perfect
    assert 0 in lsh and 7 in lsh
    assert len(set(brute) & set(lsh)) >= 3


def test_ivf_probe_all_equals_brute(emb_df):
    q = emb_df.filter("vec_id = 0").collect()[0]["embedding"]
    cents = [
        r["embedding"]
        for r in emb_df.filter("vec_id < 4").orderBy("vec_id").collect()
    ]
    brute = [
        (r["vec_id"], r["cosine"])
        for r in similarity.brute_force_cosine_topk(emb_df, q, k=5).collect()
    ]
    # probing ALL cells makes IVF exact
    ivf_all = [
        (r["vec_id"], r["cosine"])
        for r in similarity.ivf_cosine_topk(emb_df, q, cents, k=5, nprobe=4).collect()
    ]
    assert ivf_all == brute
    # probing 1 cell: results are a subset of the corpus scored exactly —
    # the query's own cell (centroid 0 = vec 0) must surface vec 0 and its
    # scaled clone vec 7 at cosine 1.0
    ivf_1 = {
        r["vec_id"]: r["cosine"]
        for r in similarity.ivf_cosine_topk(emb_df, q, cents, k=5, nprobe=1).collect()
    }
    assert ivf_1[0] == pytest.approx(1.0) and ivf_1[7] == pytest.approx(1.0)


def test_embedding_neardup(emb_df):
    pairs = similarity.embedding_neardup_pairs(emb_df, threshold=0.99).collect()
    assert any((r["id_a"], r["id_b"]) == (0, 7) for r in pairs)


def test_exact_neardup_matches_lsh_on_planted(emb_df):
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in similarity.exact_neardup_pairs(emb_df, threshold=0.99).collect()
    }
    assert (0, 7) in exact and exact[(0, 7)] == pytest.approx(1.0)
    # LSH blocking must recover every exact pair at this threshold
    lsh = {
        (r["id_a"], r["id_b"])
        for r in similarity.embedding_neardup_pairs(emb_df, threshold=0.99).collect()
    }
    assert set(exact) <= lsh


def test_semantic_dedup(emb_df):
    cents = [
        r["embedding"]
        for r in emb_df.filter("vec_id < 4").orderBy("vec_id").collect()
    ]
    out = {
        r["vec_id"]: (r["cell"], r["keep"])
        for r in similarity.semantic_dedup(emb_df, cents, threshold=0.99).collect()
    }
    # every input vector gets a row
    assert set(out) == {r["vec_id"] for r in emb_df.collect()}
    # vec 7 is the scaled clone of vec 0: same cell, and the higher id is
    # the one dropped (keep-lowest-id rule)
    assert out[7][0] == out[0][0]
    assert out[0][1] is True and out[7][1] is False
    # at an unreachable threshold nothing is dropped
    all_keep = similarity.semantic_dedup(emb_df, cents, threshold=1.01)
    assert all(r["keep"] for r in all_keep.collect())


# ---------------- textqc ------------------------------------------------- #
def test_dedup_lines(spark):
    from nlp4l_spark.ops import textqc

    df = spark.createDataFrame(
        [
            (0, "alpha beta\nshared line\ngamma"),
            (1, "shared line\ndelta\nshared line"),  # cross-doc + in-doc dup
            (2, "shared line"),  # fully deduplicated away
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textqc.dedup_lines(df).collect()}
    assert out[0]["clean_text"] == "alpha beta\nshared line\ngamma"
    assert (out[0]["n_lines"], out[0]["n_kept"]) == (3, 3)
    # doc 1 keeps only its first-seen-anywhere lines, original order
    assert out[1]["clean_text"] == "delta"
    assert (out[1]["n_lines"], out[1]["n_kept"]) == (3, 1)
    # every line of doc 2 was seen earlier -> empty, but the row survives
    assert out[2]["clean_text"] == ""
    assert (out[2]["n_lines"], out[2]["n_kept"]) == (1, 0)
    # sep is LITERAL: '.' must not behave as regex-any
    df2 = spark.createDataFrame(
        [(0, "a.b"), (1, "b.c")], "doc_id long, text string"
    )
    out2 = {
        r["doc_id"]: r["clean_text"]
        for r in textqc.dedup_lines(df2, sep=".").collect()
    }
    assert out2 == {0: "a.b", 1: "c"}
    # null text behaves as empty string, row survives
    df3 = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r3 = textqc.dedup_lines(df3).collect()[0]
    assert (r3["n_lines"], r3["clean_text"]) == (1, "")


def test_top_k_per_group(spark):
    from nlp4l_spark.ops import textqc

    rows = [(i, "g" + str(i % 2), float(i % 7)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, score double")
    out = textqc.top_k_per_group(df, "lang", "score", 3, id_col="doc_id")
    got = {(r["lang"], r["rank"]): (r["doc_id"], r["score"]) for r in out.collect()}
    assert len(got) == 6
    # g0 scores: max 6.0 at doc 6 and 20... ties by lowest doc_id first
    assert got[("g0", 1)] == (6, 6.0)
    assert got[("g0", 2)] == (20, 6.0)
    # the rank filter compiles to a group-limit before the full sort
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    asc = textqc.top_k_per_group(df, "lang", "score", 1, ascending=True)
    assert {r["score"] for r in asc.collect()} == {0.0}


def test_script_profile(spark):
    from nlp4l_spark.ops import textqc

    cjk = "".join(chr(c) for c in (0x6F22, 0x5B57, 0x304B))
    cyr = "".join(chr(c) for c in (0x043F, 0x0440, 0x0438))
    df = spark.createDataFrame(
        [
            (0, "hello world"),
            (1, cjk + " ab"),
            (2, cyr * 2 + " xy"),
            (3, "!!! ???"),  # nothing matches -> other
            (4, "123 abc"),  # tie at 3 chars each -> latin (class order)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textqc.script_profile(df).collect()}
    assert out[0]["script"] == "latin" and out[0]["latin_frac"] == 1.0
    assert out[1]["script"] == "cjk" and out[1]["cjk_frac"] == 0.6
    assert out[2]["script"] == "cyrillic"
    assert out[3]["script"] == "other" and out[3]["latin_frac"] == 0.0
    assert out[4]["script"] == "latin" and out[4]["digit_frac"] == 0.5


def test_funnel_steps(spark):
    import datetime as dt

    from nlp4l_spark.ops import processors

    t = lambda s: dt.datetime(2026, 1, 1) + dt.timedelta(seconds=s)
    rows = [
        # u1: full funnel in order
        ("u1", t(1), "view"), ("u1", t(2), "click"), ("u1", t(3), "buy"),
        # u2: click BEFORE view -> funnel stalls at view
        ("u2", t(1), "click"), ("u2", t(2), "view"),
        # u3: view then buy, no click -> reached 1
        ("u3", t(1), "view"), ("u3", t(5), "buy"),
        # u4: never views -> absent from output
        ("u4", t(1), "click"), ("u4", t(2), "buy"),
        # u5: view & click SIMULTANEOUS -> strict > excludes the click
        ("u5", t(1), "view"), ("u5", t(1), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_type string")
    out = {
        r["user_id"]: r
        for r in processors.funnel_steps(
            df, "user_id", "ts", "event_type", ["view", "click", "buy"]
        ).collect()
    }
    assert set(out) == {"u1", "u2", "u3", "u5"}
    assert out["u1"]["reached"] == 3 and out["u1"]["t_3"] is not None
    assert out["u2"]["reached"] == 1 and out["u2"]["t_2"] is None
    assert out["u3"]["reached"] == 1
    assert out["u5"]["reached"] == 1  # strict ordering, ties don't count


def test_rolling_stats(spark):
    import datetime as dt

    from nlp4l_spark.ops import processors

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, "u", t0, 10.0),
        (2, "u", t0 + dt.timedelta(seconds=100), 20.0),
        (3, "u", t0 + dt.timedelta(seconds=1900), 30.0),  # 1 falls out
        (4, "v", t0 + dt.timedelta(seconds=50), 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, value double"
    )
    out = {
        r["event_id"]: (r["n_win"], r["sum_win"], r["avg_win"])
        for r in processors.rolling_stats(df, "user_id", "ts", "value", 1800).collect()
    }
    assert out[1] == (1, 10.0, 10.0)
    assert out[2] == (2, 30.0, 15.0)  # both within 1800s
    assert out[3] == (2, 50.0, 25.0)  # event 1 aged out (1900s), 2 in (1800s, inclusive)
    assert out[4] == (1, 5.0, 5.0)  # keys independent


def test_asof_join(spark):
    from nlp4l_spark.ops.asof import asof_join

    left = spark.createDataFrame(
        [("a", 10, 1), ("a", 20, 2), ("a", 5, 3), ("b", 10, 4), ("c", 10, 5)],
        "k string, ts long, lid long",
    )
    right = spark.createDataFrame(
        [("a", 10, 1.0), ("a", 15, 2.0), ("b", 11, 3.0)],
        "k string, ts long, v double",
    )
    out = {
        r["lid"]: (r["ts_r"], r["v_r"])
        for r in asof_join(left, right, on="ts", by=("k",), right_cols=("v",)).collect()
    }
    assert out[1] == (10, 1.0)  # tie matches (inclusive backward)
    assert out[2] == (15, 2.0)  # latest at-or-before 20
    assert out[3] == (None, None)  # no prior right row
    assert out[4] == (None, None)  # right exists but only later (11 > 10)
    assert out[5] == (None, None)  # key absent from right
    # the whole point: NO join operator — union + one keyed window
    plan = (
        asof_join(left, right, on="ts", by=("k",), right_cols=("v",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "CartesianProduct" not in plan
    # reserved / output-name collisions are rejected up front
    bad = left.withColumn("_side", F.lit(1))
    with pytest.raises(ValueError):
        asof_join(bad, right, on="ts", by=("k",), right_cols=("v",))
    bad2 = left.withColumn("v_r", F.lit(1.0))
    with pytest.raises(ValueError):
        asof_join(bad2, right, on="ts", by=("k",), right_cols=("v",))


def test_asof_join_matches_pandas_merge_asof(spark):
    """Randomized cross-check: asof_join == pandas.merge_asof (backward,
    inclusive) on seeded random event sets with unique (key, ts) pairs;
    plus determinism under repartition with duplicate right timestamps."""
    import numpy as np
    import pandas as pd

    from nlp4l_spark.ops.asof import asof_join

    rng = np.random.RandomState(7)
    for trial in range(4):
        keys = rng.randint(0, 4, size=60)
        ts = rng.choice(10_000, size=60, replace=False)  # unique ts
        side = rng.rand(60) < 0.5
        lpd = pd.DataFrame(
            {"k": keys[side], "ts": ts[side], "lid": np.arange(side.sum())}
        ).sort_values("ts")
        rpd = pd.DataFrame(
            {"k": keys[~side], "ts": ts[~side], "v": rng.rand((~side).sum()).round(3)}
        ).sort_values("ts")
        want = pd.merge_asof(lpd, rpd, on="ts", by="k", direction="backward")
        ldf = spark.createDataFrame(lpd, "k long, ts long, lid long")
        rdf = spark.createDataFrame(rpd, "k long, ts long, v double")
        got = {
            r["lid"]: r["v_r"]
            for r in asof_join(ldf, rdf, on="ts", by=("k",), right_cols=("v",)).collect()
        }
        for _, row in want.iterrows():
            g = got[row["lid"]]
            if pd.isna(row["v"]):
                assert g is None, (trial, row["lid"])
            else:
                assert g == row["v"], (trial, row["lid"])
    # duplicate right (k, ts): largest payload struct wins, at any layout
    ldf = spark.createDataFrame([(1, 10, 0)], "k long, ts long, lid long")
    rdf = spark.createDataFrame(
        [(1, 5, 1.0), (1, 5, 9.0), (1, 5, 4.0)], "k long, ts long, v double"
    )
    outs = set()
    for nparts in (1, 3, 7):
        r = asof_join(
            ldf, rdf.repartition(nparts), on="ts", by=("k",), right_cols=("v",)
        ).collect()[0]
        outs.add((r["ts_r"], r["v_r"]))
    assert outs == {(5, 9.0)}


def test_normalize_text(spark):
    from nlp4l_spark.ops import textqc

    df = spark.createDataFrame(
        [
            (0, "café «x» “y” – z\x07\t end"),
            (1, None),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["norm_text"] for r in textqc.normalize_text(df).collect()}
    # NFC recomposes, punctuation unified, BEL stripped, whitespace collapsed
    assert out[0] == 'café "x" "y" - z end'
    assert out[1] is None
    # nfc=False path is fully JVM (no Python eval nodes)
    plan = (
        textqc.normalize_text(df, nfc=False)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # and still applies the JVM steps
    got = textqc.normalize_text(df, nfc=False).collect()[0]["norm_text"]
    assert '"x" "y" - z end' in got


def test_dedup_lines_random_vs_reference(spark):
    """Randomized cross-check against a sequential pure-Python reference:
    line-level first-occurrence dedup is order-deterministic, so the
    distributed result must equal the single-threaded one exactly —
    including under repartition."""
    import numpy as np

    from nlp4l_spark.ops import textqc

    rng = np.random.RandomState(11)
    vocab = [f"l{j}" for j in range(12)]  # small pool -> many collisions
    docs = []
    for d in range(40):
        n = rng.randint(1, 6)
        docs.append((d, "\n".join(rng.choice(vocab, size=n))))
    seen: set[str] = set()
    want = {}
    for d, text in docs:  # reference: global first-occurrence by (doc, pos)
        kept = []
        for line in text.split("\n"):
            if line not in seen:
                seen.add(line)
                kept.append(line)
        want[d] = "\n".join(kept)
    df = spark.createDataFrame(docs, "doc_id long, text string").repartition(5)
    got = {r["doc_id"]: r["clean_text"] for r in textqc.dedup_lines(df).collect()}
    assert got == want


def test_gopher_filter(spark):
    from nlp4l_spark.ops import textqc

    good = "the cat sat and then " * 12  # 60 words, stopwords present
    docs = [
        (0, good),
        (1, "too short to pass the word count rule honestly"),
        (2, ("the word " + "#### " * 20) * 6),  # symbol ratio blown
        (3, "\n".join("• bullet item here for sure" for _ in range(10))),
        (4, good.replace("cat", "12345")),  # still >=80% alphabetic -> keep
        (5, " ".join("9876" for _ in range(60))),  # no alpha, no stopwords
    ]
    out = {
        r["doc_id"]: r
        for r in textqc.gopher_filter(
            spark.createDataFrame(docs, "doc_id long, text string"),
            min_stop_words=2,
        ).collect()
    }
    assert out[0]["keep"] is True
    assert out[1]["keep"] is False and out[1]["n_words"] < 50
    assert out[2]["keep"] is False and out[2]["symbol_ratio"] > 0.1
    assert out[3]["keep"] is False and out[3]["bullet_frac"] == 1.0
    assert out[4]["keep"] is True and out[4]["alpha_frac"] == pytest.approx(0.8)
    assert out[5]["keep"] is False and out[5]["alpha_frac"] == 0.0
    assert out[5]["n_stop"] == 0 and out[0]["n_stop"] >= 2


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog went to the market"),
            (1, "el perro y la casa de la madre por favor"),
            (2, "le chat est dans la maison pour les amis"),
            (3, "zzz qqq 123"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lang_pred"] for r in textqc.lang_id(df).collect()}
    assert out[0] == "en" and out[1] == "es" and out[2] == "fr" and out[3] == "und"


def test_quality_and_fingerprint(spark):
    df = spark.createDataFrame(
        [(0, "A decent length sentence with the usual words in it."),
         (1, "!!! ??? ***"),],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r["quality"] for r in textqc.quality_score(df).collect()}
    assert q[0] > q[1]
    fp = textqc.fingerprint(df).collect()
    assert all(len(r["fp_md5"]) == 32 for r in fp)


# ---------------- multimodal --------------------------------------------- #
def test_media_plumbing(spark):
    media = multimodal.synth_media(spark, n=12)
    feats = multimodal.extract_features(media).collect()
    assert len(feats) == 12
    assert all(len(r["features"]) == multimodal.FEATURE_DIM for r in feats)
    # deterministic: same payload -> same features
    by_id = {r["media_id"]: r["features"] for r in feats}
    again = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(media).collect()
    }
    assert by_id == again
    # strict decoder now REALLY parses the payload containers: feature[0/1]
    # of an image row must equal the PNG's actual IHDR width/height
    strict = {
        r["media_id"]: r["features"]
        for r in multimodal.extract_features(
            media, decoder=multimodal.strict_decoder
        ).collect()
    }
    for i in range(0, 12, 3):  # image rows
        assert strict[i][0] == 8 + (i % 9)
        assert strict[i][1] == 8 + ((i * 7) % 9)


def test_jpeg_sof_roundtrip_and_media_stats(spark):
    # encode -> marker-walk decode round-trip across the fixture space
    for i in [0, 1, 7, 16, 47]:
        p = multimodal.synth_jpeg_payload(i)
        sof = multimodal.decode_jpeg_sof(p)
        assert sof == {
            "width": 16 + (i * 3) % 240,
            "height": 16 + (i * 5) % 200,
            "n_components": 3 if i % 2 == 0 else 1,
            "precision": 8,
        }
    # malformed inputs fail loudly, not wrongly
    import pytest

    with pytest.raises(ValueError, match="not a JPEG"):
        multimodal.decode_jpeg_sof(b"\x89PNG")
    with pytest.raises(ValueError, match="no SOF"):
        multimodal.decode_jpeg_sof(b"\xff\xd8\xff\xd9")
    # truncated payloads keep the ValueError contract (never struct.error
    # / IndexError): mid-length-field and overrunning-segment cases
    with pytest.raises(ValueError, match="truncated JPEG"):
        multimodal.decode_jpeg_sof(b"\xff\xd8\xff\xff\xff\xe0")
    good = multimodal.synth_jpeg_payload(0)
    for cut in (5, 9, len(good) // 2):
        try:
            multimodal.decode_jpeg_sof(good[:cut])
        except ValueError:
            pass  # any ValueError is contract-conform
    # decode_media sniffs JPEG vs PNG on the same kind='image'
    d = multimodal.decode_media(multimodal.synth_jpeg_payload(4), "image")
    assert (d["width"], d["height"], d["mean_val"]) == (28, 36, None)
    assert d["n_units"] == 28 * 36
    # and through the Spark media_stats pass (corrupt row -> null stats)
    media = multimodal.synth_jpeg_media(spark, n=6).union(
        spark.createDataFrame(
            [(99, "image", "image/jpeg", b"\xff\xd8junk")],
            "media_id long, kind string, mime string, payload binary",
        )
    )
    rows = {r["media_id"]: r for r in multimodal.media_stats(media).collect()}
    assert rows[3]["width"] == 16 + 9 and rows[3]["height"] == 16 + 15
    assert rows[99]["width"] is None


def test_media_codecs_roundtrip():
    import numpy as np

    # PNG: encode a known pattern, decode, compare pixel-exact
    px = (np.arange(7 * 5, dtype=np.uint8).reshape(5, 7) * 11) % 256
    w, h, out = multimodal.decode_png(multimodal.encode_png(7, 5, px))
    assert (w, h) == (7, 5) and np.array_equal(out, px)
    # WAV: int16 round-trip incl. negative samples
    s = np.array([-1024, -1, 0, 1, 777, 32767, -32768], dtype=np.int16)
    rate, back = multimodal.decode_wav(multimodal.encode_wav(s, 8000))
    assert rate == 8000 and np.array_equal(back, s)
    # MP4: duration survives the box walk (incl. a non-ms timescale)
    assert (
        multimodal.decode_mp4_duration(
            multimodal.encode_mp4_skeleton(12_345, timescale=600)
        )
        == 12_345
    )
    assert (
        multimodal.decode_mp4_duration(multimodal.encode_mp4_skeleton(12_000))
        == 12_000
    )
    # all five scanline filters, with byte-wrapping values (recon sums >
    # 255) — regression for the unmasked-left predictor bug
    import struct
    import zlib

    def chunk(tag, data):
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    w = h = 5
    px = ((np.arange(w * h, dtype=np.int64) * 37 + 200) % 256).reshape(
        h, w
    ).astype(np.uint8)
    raws, prev = [], np.zeros(w, np.int64)
    for y, f in enumerate([0, 1, 2, 3, 4]):
        line = px[y].astype(np.int64)
        enc = line.copy()
        for x in range(w):
            left = int(line[x - 1]) if x else 0
            up = int(prev[x])
            ul = int(prev[x - 1]) if x else 0
            pred = {
                0: 0,
                1: left,
                2: up,
                3: (left + up) // 2,
            }.get(f)
            if pred is None:  # paeth
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if pa <= pb and pa <= pc else up if pb <= pc else ul
            enc[x] = (line[x] - pred) & 0xFF
        raws.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = line
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(b"".join(raws)))
        + chunk(b"IEND", b"")
    )
    w2, h2, out = multimodal.decode_png(png)
    assert (w2, h2) == (w, h) and np.array_equal(out, px)
    # corrupt payloads are rejected, not misparsed
    with pytest.raises(ValueError):
        multimodal.decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        multimodal.decode_wav(b"RIFFxxxxNOPE")
    with pytest.raises(ValueError):
        multimodal.decode_mp4_duration(b"\x00\x00\x00\x08free")


def test_winnowing_guarantee(spark):
    """Schleimer et al. guarantee: two docs sharing a substring of length
    >= k + w - 1 (= 11 here) share >= 1 fingerprint; docs with no common
    8-gram share none."""
    docs = spark.createDataFrame(
        [
            (0, "unique preamble THE SHARED RUN OF TEXT trailing junk"),
            (1, "other intro THE SHARED RUN OF TEXT different ending"),
            (2, "zzzz qqqq completely disjoint content wwww"),
        ],
        "doc_id long, text string",
    )
    fp = textqc.winnow_fingerprints(docs, k=8, w=4)
    by_doc = {}
    for r in fp.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared 24-char run must share a fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])
    # short docs (< k chars) produce no fingerprints, not errors
    tiny = spark.createDataFrame([(9, "short")], "doc_id long, text string")
    assert textqc.winnow_fingerprints(tiny).count() == 0


def test_media_stats_corrupt_payload_degrades_to_nulls(spark):
    from pyspark.sql import Row

    media = spark.createDataFrame(
        [
            Row(media_id=0, kind="image", mime="image/png", width=None,
                height=None, duration_ms=None, payload=b"garbage bytes"),
            Row(media_id=1, kind="audio", mime="audio/wav", width=None,
                height=None, duration_ms=None,
                payload=multimodal.synth_payload(1)[2]),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    rows = {r["media_id"]: r for r in multimodal.media_stats(media).collect()}
    assert rows[0]["width"] is None and rows[0]["mean_val"] is None
    assert rows[1]["sample_rate"] == 8000  # good rows unaffected


def test_frame_sample_plan(spark):
    media = multimodal.synth_media(spark, n=12)
    plan = multimodal.frame_sample_plan(media, every_ms=1000)
    rows = plan.groupBy("media_id").count().collect()
    assert all(r["count"] >= 1 for r in rows)


def test_dsir_weights(spark):
    # target (tgt=True) docs are all about "spark sql", source docs about
    # "cooking pasta"; a held-out doc matching the target vocabulary must
    # out-weigh one matching the source vocabulary
    rows = [
        (0, "spark sql engine", True),
        (1, "spark sql plans", True),
        (2, "cooking pasta sauce", False),
        (3, "cooking pasta dough", False),
        (4, "spark sql wins", False),   # target-like, in the raw pool
        (5, "cooking pasta again", False),
        (6, "", False),                 # gram-less
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, _tgt boolean")
    out = {r["doc_id"]: r for r in textqc.dsir_weights(df, "_tgt").collect()}
    assert len(out) == 7
    # n_grams = n_tokens + (n_tokens - 1) bigrams
    assert out[0]["n_grams"] == 5
    assert out[6]["n_grams"] == 0 and out[6]["logw"] is None
    assert out[4]["logw"] > out[5]["logw"]
    # pure-target docs score higher than pure-source docs
    assert min(out[0]["logw"], out[1]["logw"]) > max(
        out[2]["logw"], out[3]["logw"]
    )
    # first-principles check of one doc's weight: recompute in Python
    # with the same md5 buckets and add-1 smoothing
    import hashlib
    import math
    from collections import Counter

    def grams(text):
        toks = [t for t in text.lower().split() if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:3], 16)

    ct, cs = Counter(), Counter()
    for _, text, tgt in [(r[0], r[1], r[2]) for r in rows]:
        for g in grams(text):
            (ct if tgt else cs)[bucket(g)] += 1
    t_tot, s_tot = sum(ct.values()), sum(cs.values())
    expect = sum(
        math.log((ct[b] + 1.0) / (t_tot + 4096.0))
        - math.log((cs[b] + 1.0) / (s_tot + 4096.0))
        for b in map(bucket, grams("spark sql wins"))
    )
    assert abs(out[4]["logw"] - round(expect, 6)) < 1e-9


def test_bigram_lm_score(spark):
    rows = [
        (0, "spark sql engine runs spark sql", True),
        (1, "spark sql plans", True),
        (2, "cooking pasta sauce", False),  # all-backoff, unseen unigrams
        (3, "spark sql engine", False),     # all seen bigrams
        (4, "spark", False),                # < 2 tokens
        (5, "", False),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, _tr boolean")
    out = {
        r["doc_id"]: r for r in textqc.bigram_lm_score(df, "_tr").collect()
    }
    assert len(out) == 6
    assert out[4]["n_bigrams"] == 0 and out[4]["nll"] is None
    assert out[5]["n_bigrams"] == 0 and out[5]["nll"] is None
    # unseen-everything doc must score worse than an in-distribution doc
    assert out[2]["nll"] > out[3]["nll"]

    # first-principles recompute with the same analyzer
    import math
    from collections import Counter

    from nlp4l_spark.analysis import STANDARD_ANALYZER as az

    c12, cf = Counter(), Counter()
    for _, text, tr in rows:
        toks = az.tokenize(text)
        if tr:
            cf.update(toks)
            c12.update(zip(toks, toks[1:]))
    c1 = Counter()
    for (w1, _), c in c12.items():
        c1[w1] += c
    n_tot, v = sum(cf.values()), len(cf)
    denom = n_tot + 0.5 * v

    def score(text):
        toks = az.tokenize(text)
        lps = [
            math.log(c12[(a, b)] / c1[a])
            if c12[(a, b)] > 0
            else math.log(0.4 * ((cf[b] + 0.5) / denom))
            for a, b in zip(toks, toks[1:])
        ]
        return round(-sum(lps) / len(lps), 6)

    for d in (0, 1, 2, 3):
        assert abs(out[d]["nll"] - score(rows[d][1])) < 1e-9, d
    # training split empty -> explicit error
    df_none = df.withColumn("_tr", F.lit(False))
    with pytest.raises(ValueError):
        textqc.bigram_lm_score(df_none, "_tr")


def test_significant_terms(spark):
    from nlp4l_spark.stats import keyness

    rows = [
        (0, "en", "spark spark spark join the"),
        (1, "en", "spark join window the"),
        (2, "de", "fenster fenster join the"),
        (3, "de", "fenster join scan the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = keyness.significant_terms(df, "lang", k=3)
    got = {(r["lang"], r["term"]): r for r in out.collect()}
    # per-group cap respected, only overrepresented terms surface
    assert all(
        sum(1 for (g, _) in got if g == lang) <= 3 for lang in ("en", "de")
    )
    assert ("en", "spark") in got and ("de", "fenster") in got
    assert ("en", "fenster") not in got and ("de", "spark") not in got
    # stopwords never reach the table; near-neutral 'join' scores far
    # below the group's keyword
    assert all(t != "the" for (_, t) in got)
    if ("de", "join") in got:
        assert got[("de", "join")]["g2"] < got[("de", "fenster")]["g2"]

    # first-principles G2 recompute for (en, spark)
    import math
    from collections import Counter

    from nlp4l_spark.analysis import STANDARD_ANALYZER as az

    cnt = Counter()
    for _, lang, text in rows:
        for t in az.tokenize(text):
            cnt[(lang, t)] += 1
    n = sum(cnt.values())
    a = cnt[("en", "spark")]
    rowt = sum(v for (g, t), v in cnt.items() if t == "spark")
    colt = sum(v for (g, t), v in cnt.items() if g == "en")
    b, c, d = rowt - a, colt - a, n - rowt - colt + a

    def ll(k, e):
        return k * math.log(k / e) if k > 0 else 0.0

    g2 = round(
        2
        * (
            ll(a, rowt * colt / n)
            + ll(b, rowt * (n - colt) / n)
            + ll(c, (n - rowt) * colt / n)
            + ll(d, (n - rowt) * (n - colt) / n)
        ),
        6,
    )
    assert abs(got[("en", "spark")]["g2"] - g2) < 1e-9
    assert got[("en", "spark")]["fg_count"] == a
    assert got[("en", "spark")]["bg_count"] == b
    # empty corpus -> explicit error
    empty = spark.createDataFrame([], "doc_id long, lang string, text string")
    with pytest.raises(ValueError):
        keyness.significant_terms(empty, "lang")


def test_duplicate_spans(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j k l"),
            (2, "x y a b c d e f g h i j z"),      # 10-token shared run
            (3, "p q r a b c d e q q q q q q q"),  # 5-token run: below min_len
            (4, "a b c d e f m m a b c d e f"),    # doc1 span twice -> 2 diagonals
        ],
        "doc_id long, text string",
    )
    out = dedup.duplicate_spans(df, seed_n=4, min_len=6)
    rows = sorted(
        (r.id_a, r.id_b, r.start_a, r.start_b, r.span_len) for r in out.collect()
    )
    assert (1, 2, 0, 2, 10) in rows
    # repeated passage: one row per alignment diagonal
    assert (1, 4, 0, 0, 6) in rows and (1, 4, 0, 8, 6) in rows
    # doc 3's overlaps are all 5 tokens long, below min_len=6
    assert not any(3 in (a, b) for a, b, *_ in rows)
    # docs 2 and 4 share "a b c d e f"? doc2 has ...a b c d e f g...
    assert (2, 4, 2, 0, 6) in rows and (2, 4, 2, 8, 6) in rows
    assert len(rows) == 5

    # min_len == seed_n keeps the short overlap, exact boundaries
    rows2 = sorted(
        (r.id_a, r.id_b, r.start_a, r.start_b, r.span_len)
        for r in dedup.duplicate_spans(df, seed_n=4, min_len=4).collect()
    )
    assert (1, 3, 0, 3, 5) in rows2

    # boilerplate cap: a gram occurring > max_gram_df times anchors nothing
    boiler = spark.createDataFrame(
        [(i, "t1 t2 t3 t4 t5 t6") for i in range(5)],
        "doc_id long, text string",
    )
    assert (
        dedup.duplicate_spans(boiler, seed_n=4, min_len=4, max_gram_df=2).count()
        == 0
    )
    assert (
        dedup.duplicate_spans(boiler, seed_n=4, min_len=4, max_gram_df=None).count()
        == 10  # all C(5,2) pairs share the full 6-token doc
    )


def test_excise_spans(spark):
    df = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),
            (2, "x a b c d e f y"),        # contains doc1's run -> cut
            (3, "a b c d e f g h q r"),    # id_b of doc1 AND id_a of later
            (4, "z z a b c d e f g h z"),  # cut from here too
            (5, "untouched words only here"),
        ],
        "doc_id long, text string",
    )
    spans = dedup.duplicate_spans(df, seed_n=3, min_len=4)
    out = {r["doc_id"]: r for r in dedup.excise_spans(df, spans).collect()}
    assert len(out) == 5
    # doc 1 is always id_a (lowest id): never cut
    assert out[1]["n_removed"] == 0 and out[1]["text"] == "a b c d e f g h"
    # doc 2 loses the 6-token shared run, keeps the flanks
    assert out[2]["n_removed"] == 6 and out[2]["text"] == "x y"
    # doc 3 loses its copy of doc 1's run even though it is id_a vs doc 4
    assert out[3]["n_removed"] == 8 and out[3]["text"] == "q r"
    assert out[4]["n_removed"] == 8 and out[4]["text"] == "z z z"
    assert out[5]["n_removed"] == 0
    # n_tokens is the pre-cut token count
    assert out[4]["n_tokens"] == 11

    # overlapping spans union: feed handcrafted overlapping intervals
    spans2 = spark.createDataFrame(
        [(0, 1, 0, 1, 3), (0, 1, 0, 3, 3)],
        "id_a long, id_b long, start_a int, start_b int, span_len long",
    )
    one = spark.createDataFrame([(1, "t0 t1 t2 t3 t4 t5 t6")], "doc_id long, text string")
    got = dedup.excise_spans(one, spans2).collect()[0]
    # intervals [1,3] and [3,5] union to [1,5] -> 5 tokens removed
    assert got["n_removed"] == 5 and got["text"] == "t0 t6"


def test_collocations(spark):
    from nlp4l_spark.stats import keyness

    # "data lake" always adjacent; filler words frequent but independent
    rows = [(i, "data lake " + ("filler words mixed up " * 3)) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = keyness.collocations(df, k=5, min_count=5)
    got = {(r["w1"], r["w2"]): r for r in out.collect()}
    assert ("data", "lake") in got
    assert got[("data", "lake")]["pair_count"] == 5
    # perfectly-bound pair outranks the independent fillers
    top = out.collect()[0]
    assert (top["w1"], top["w2"]) == ("data", "lake")

    # first-principles PMI recompute
    import math
    from collections import Counter

    from nlp4l_spark.analysis import STANDARD_ANALYZER as az

    uni, bi, n1, n2 = Counter(), Counter(), 0, 0
    for _, text in rows:
        toks = az.tokenize(text)
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
        n1 += len(toks)
        n2 += max(len(toks) - 1, 0)
    p = ("data", "lake")
    expect = round(
        math.log((bi[p] / n2) / ((uni["data"] / n1) * (uni["lake"] / n1))), 6
    )
    assert abs(got[p]["pmi"] - expect) < 1e-9
    # min_count prunes singletons
    assert all(r["pair_count"] >= 5 for r in got.values())
    with pytest.raises(ValueError):
        keyness.collocations(
            spark.createDataFrame([(0, "one")], "doc_id long, text string")
        )


def test_zipf_fit(spark, tmp_path):
    from nlp4l_spark.stats import wordcounts as wc
    from nlp4l_spark.stats import Corpus

    # exact power law cf = 12/rank -> slope -1, r2 1
    text = " ".join(["alpha"] * 12 + ["beta"] * 6 + ["gamma"] * 4 + ["delta"] * 3)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    row = wc.zipf_fit(Corpus(df)).collect()[0]
    assert row["n_terms"] == 4
    assert abs(row["slope"] - (-1.0)) < 1e-6
    assert abs(row["r2"] - 1.0) < 1e-6
    # intercept = ln(12)
    import math

    assert abs(row["intercept"] - round(math.log(12.0), 6)) < 1e-6
    # top_n caps the fit set
    row2 = wc.zipf_fit(Corpus(df), top_n=2).collect()[0]
    assert row2["n_terms"] == 2


def test_kwic(spark):
    from nlp4l_spark.stats import concordance

    df = spark.createDataFrame(
        [
            (1, "merge a b merge c"),
            (2, "x y z merge"),
            (3, "no hits here"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    rows = [
        (r["doc_id"], r["pos"], r["left_ctx"], r["right_ctx"])
        for r in concordance.kwic(df, "merge", width=2).collect()
    ]
    assert rows == [
        (1, 0, "", "a b"),          # doc edge -> empty left
        (1, 3, "a b", "c"),         # short right
        (2, 3, "y z", ""),          # doc edge -> empty right
    ]
    # k caps output in (doc_id, pos) order
    one = concordance.kwic(df, "merge", width=2, k=1).collect()
    assert (one[0]["doc_id"], one[0]["pos"]) == (1, 0)


def test_term_dispersion(spark):
    from nlp4l_spark.stats import Corpus, concordance

    # 'even' spreads with doc sizes (dp ~ 0); 'burst' sits in one doc
    df = spark.createDataFrame(
        [
            (1, "even even burst burst burst burst"),
            (2, "even even filler filler filler filler"),
        ],
        "doc_id long, text string",
    )
    out = {r["term"]: r for r in concordance.term_dispersion(Corpus(df)).collect()}
    assert out["even"]["cf"] == 4 and out["burst"]["cf"] == 4
    # both docs have 6 tokens -> s_i = 0.5 each; 'even' has v_i = 0.5
    assert out["even"]["dp"] == 0.0
    # 'burst': v = (1, 0), s = (.5, .5) -> dp = .5*(|1-.5| + (1-.5)) = 0.5
    assert out["burst"]["dp"] == 0.5


def test_keep_best(spark):
    scored = spark.createDataFrame(
        [(1, 0.2), (2, 0.9), (3, 0.9), (4, 0.5), (9, 0.1)],
        "doc_id long, quality double",
    )
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (4, 4)],  # {1,2,3} together, {4} trivial
        "doc_id long, cluster_id long",
    )
    out = {
        r["doc_id"]: r
        for r in dedup.keep_best(scored, clusters, "quality").collect()
    }
    assert len(out) == 5
    # best quality wins; 0.9 tie between 2 and 3 -> lowest id (2)
    assert out[2]["keep"] and not out[3]["keep"] and not out[1]["keep"]
    # single-member cluster and unclustered doc always kept
    assert out[4]["keep"] and out[9]["keep"]
    # unclustered doc is its own cluster
    assert out[9]["cluster_id"] == 9
    assert sum(1 for r in out.values() if r["keep"]) == 3


def test_textrank(spark):
    from nlp4l_spark.stats import keyness

    rows = [
        (0, "hub alpha hub beta hub gamma"),
        (1, "alpha beta gamma hub"),
        (2, "solo pair solo pair"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["term"]: r["score"] for r in keyness.textrank_terms(df, k=20).collect()}
    # the hub term dominates its component
    assert out["hub"] == max(out[t] for t in ("hub", "alpha", "beta", "gamma"))

    # first-principles power iteration with the same graph + constants
    from collections import Counter, defaultdict

    from nlp4l_spark.analysis import STANDARD_ANALYZER as az

    cnt = Counter()
    for _, text in rows:
        toks = az.tokenize(text)
        for x, y in zip(toks, toks[1:]):
            if x != y:
                cnt[(x, y)] += 1.0
    edges = defaultdict(float)
    for (x, y), c in cnt.items():
        edges[(x, y)] += c
        edges[(y, x)] += c
    wdeg = defaultdict(float)
    for (s, d), w in edges.items():
        wdeg[s] += w
    score = {t: 1.0 for t in wdeg}
    for _ in range(10):
        nxt = defaultdict(float)
        for (s, d), w in edges.items():
            nxt[d] += (w / wdeg[s]) * score[s]
        score = {t: (1.0 - 0.85) + 0.85 * v for t, v in nxt.items()}
    for t, v in score.items():
        assert abs(out[t] - round(v, 6)) < 1e-9, t


def test_image_ahash_brightness_invariance(spark):
    """aHash contract: a constant brightness offset (no wrap) never
    changes the hash; a different gradient direction always does; and
    the four synth_phash_media classes form exactly four clusters."""
    import numpy as np

    from nlp4l_spark.ops import multimodal as mm

    base = ((6 * np.arange(16)[None, :] + 2 * np.arange(16)[:, None])).astype(
        np.uint8
    )
    rows = [
        (0, "image", "image/png", 16, 16, None, mm.encode_png(16, 16, base)),
        (1, "image", "image/png", 16, 16, None,
         mm.encode_png(16, 16, base + 40)),          # offset: same hash
        (2, "image", "image/png", 16, 16, None,
         mm.encode_png(16, 16, base.T.copy())),      # direction: differs
    ]
    rows.append(
        (3, "image", "image/png", 16, 16, None, b"not a png at all")
    )  # corrupt payload: emitted with NULL phash, never dropped
    df = spark.createDataFrame(rows, mm.MEDIA_SCHEMA)
    h = {r["media_id"]: r["phash"] for r in mm.image_ahash(df).collect()}
    assert h[0] == h[1]
    assert h[0] != h[2]
    assert 3 in h and h[3] is None

    clusters = (
        mm.image_ahash(mm.synth_phash_media(spark, 64))
        .groupBy("phash")
        .count()
        .collect()
    )
    assert sorted(r["count"] for r in clusters) == [16, 16, 16, 16]


def test_compression_ratio_matches_direct_zlib(spark):
    """Every (n_bytes, z_bytes) equals direct zlib.compress on the same
    UTF-8 bytes, and repetitive text compresses below prose."""
    import zlib

    rows = [
        (0, "the quick brown fox jumps over the lazy dog near the bank"),
        (1, "spam spam spam spam spam spam spam spam spam spam spam"),
        (2, "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in textqc.compression_ratio(df).collect()}
    for i, t in rows:
        b = t.encode("utf-8")
        assert got[i]["n_bytes"] == len(b)
        assert got[i]["z_bytes"] == len(zlib.compress(b, 6))
    assert got[1]["ratio"] < got[0]["ratio"]
