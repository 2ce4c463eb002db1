"""Tests for sources/writers, the pipeline registry, ML bridge, LTR, and
acronym extraction."""

from __future__ import annotations

import os

import numpy as np
import pytest

from pyspark.sql import functions as F

from nlp4l_spark.data import LONDON_BRIDGE_VERSES
from nlp4l_spark.ops import acronyms, ltr, ml
from nlp4l_spark.plans import Pipeline
from nlp4l_spark.sources import (
    inline_csv_records,
    read_csv_records,
    read_text_records,
    write_csv,
    write_json,
)
from nlp4l_spark.stats import Corpus


# ---------------- sources / writers -------------------------------------- #
def test_text_and_csv_sources(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text("  hello \nworld\n")
    rows = read_text_records(spark, str(p)).collect()
    assert sorted(r["text"] for r in rows) == ["hello", "world"]

    c = tmp_path / "data.csv"
    c.write_text("1, apple ,fruit\n2,beet,veg\n")
    out = read_csv_records(spark, str(c), ["id", "name", "kind"])
    got = {r["id"]: (r["name"], r["kind"]) for r in out.collect()}
    assert got == {"1": ("apple", "fruit"), "2": ("beet", "veg")}

    inline = inline_csv_records(
        spark, ["a", "b"], ["x, y", "p,q"]
    ).collect()
    assert sorted((r["a"], r["b"]) for r in inline) == [("p", "q"), ("x", "y")]

    from nlp4l_spark.sources.readers import read_jsonl_records

    j = tmp_path / "docs.jsonl"
    j.write_text(
        '{"doc_id": 1, "text": "  alpha "}\n'
        '{"doc_id": 2, "text": "beta"}\n'
        "THIS IS NOT JSON\n"
    )
    out = read_jsonl_records(
        spark, str(j), schema="doc_id long, text string"
    ).collect()
    good = {r["doc_id"]: r["text"] for r in out if r["_corrupt"] is None}
    bad = [r for r in out if r["_corrupt"] is not None]
    assert good == {1: "alpha", 2: "beta"}  # trimmed
    assert len(bad) == 1 and "NOT JSON" in bad[0]["_corrupt"]


def test_http_deployer(tmp_path):
    """HttpFileTransferDeployer parity against an embedded server (the
    reference tests use a TinyHttpServer the same way)."""
    import http.server
    import threading

    from nlp4l_spark.sources.deployers import http_deploy

    received = {}

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received["body"] = self.rfile.read(n)
            received["name"] = self.headers.get("X-Filename")
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        p = tmp_path / "artifact.json"
        p.write_bytes(b'{"model": 1}')
        status = http_deploy(str(p), f"http://127.0.0.1:{srv.server_port}/up")
        assert status == 200
        assert received["body"] == b'{"model": 1}'
        assert received["name"] == "artifact.json"
    finally:
        srv.shutdown()


def test_writers_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    csv_dir = str(tmp_path / "out_csv")
    write_csv(df, csv_dir, single_file=True)
    back = spark.read.csv(csv_dir, header=True).collect()
    assert sorted((r["id"], r["v"]) for r in back) == [("1", "a"), ("2", "b")]
    json_dir = str(tmp_path / "out_json")
    write_json(df, json_dir)
    assert spark.read.json(json_dir).count() == 2


# ---------------- pipeline ----------------------------------------------- #
def test_pipeline_config_run(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LONDON_BRIDGE_VERSES)],
        "doc_id long, text string",
    )
    config = {
        "checkpoint_root": str(tmp_path / "ckpt"),
        "stages": [
            {"name": "fingerprint", "settings": {}},
            {"name": "filter", "settings": {"condition": "doc_id < 8"},
             "checkpoint": True},
            {"name": "sort", "settings": {"column": "doc_id", "order": "desc"}},
            {"name": "select", "settings": {"columns": ["doc_id", "fp_md5"]}},
        ],
    }
    out = Pipeline.from_config(config).run(df)
    rows = out.collect()
    assert [r["doc_id"] for r in rows] == list(range(7, -1, -1))
    assert os.path.exists(str(tmp_path / "ckpt" / "stage_01_filter"))
    # resume: re-run reads the checkpoint (same result)
    out2 = Pipeline.from_config(config).run(df)
    assert out2.collect() == rows


# ---------------- ML bridge ----------------------------------------------- #
def test_classification_roundtrip(spark):
    """Toy labeled corpus: two separable topics; mirrors
    DocumentClassificationAlgoSpec's train-then-predict shape."""
    train_docs = [
        (i, f"spark shuffle partition executor job stage task {i%3}", "infra")
        for i in range(12)
    ] + [
        (100 + i, f"tokenizer stopword stemming lucene analyzer query {i%3}", "nlp")
        for i in range(12)
    ]
    df = spark.createDataFrame(train_docs, "doc_id long, text string, label string")
    corpus = Corpus(df)
    featurizer = ml.fit_featurizer(corpus, min_df=2)
    labels = ml.label_map(df, "label")
    labeled = df.join(labels, "label")
    feat = featurizer.transform(labeled)
    model, precision = ml.train_classifier(feat, "naive_bayes")
    assert precision >= 0.9
    new = spark.createDataFrame(
        [(0, "executor task shuffle"), (1, "lucene analyzer stopword")],
        "doc_id long, text string",
    )
    pred = {r["doc_id"]: r["prediction"] for r in ml.classify(model, featurizer, new).collect()}
    id2label = {r["label_id"]: r["label"] for r in labels.collect()}
    assert id2label[int(pred[0])] == "infra"
    assert id2label[int(pred[1])] == "nlp"


# ---------------- LTR ------------------------------------------------------ #
def test_ltr_feature_extraction(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(LONDON_BRIDGE_VERSES)],
        "doc_id long, text string",
    )
    feats = ltr.extract_features(Corpus(df), [(1, "build up"), (2, "silver gold")])
    rows = feats.collect()
    assert all(r["bm25"] > 0 for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], set()).add(r["doc_id"])
    # "build up": docs 2,3,5,7,9 contain build and/or up
    assert by_q[1] == {1, 2, 3, 5, 7, 9}
    assert 3 in by_q[2] and 4 in by_q[2]


def test_prank_learns_ordering():
    rng = np.random.RandomState(1)
    x = rng.standard_normal((200, 3))
    # rank determined by first feature
    score = x[:, 0]
    y = np.digitize(score, [-0.5, 0.5]) + 1  # labels 1..3
    p = ltr.PRank(feature_num=3, max_label=3, seed=0)
    p.train(x, y, num_iterations=5000)
    pred = np.array([p.predict(v) for v in x])
    assert (pred == y).mean() > 0.8


def test_ranking_svm_pairwise(spark):
    f = spark.createDataFrame(
        [(1, 2, 1.0, 0.0), (1, 1, 0.5, 0.5), (1, 0, 0.0, 1.0),
         (2, 1, 0.9, 0.1), (2, 0, 0.2, 0.8)],
        "qid int, label int, f1 double, f2 double",
    )
    pairs = ltr.ranking_svm_pairwise(f).collect()
    # qid 1: 3 label-ordered pairs; qid 2: 1
    assert len(pairs) == 4
    assert all(r["label"] == 1 for r in pairs)
    assert all(r["d_f1"] > 0 for r in pairs)  # higher label has higher f1


# ---------------- acronyms -------------------------------------------------- #
@pytest.mark.parametrize(
    "text,expected",
    [
        ("He is the Chief Executive Officer (CEO) of the firm.",
         ["CEO, Chief Executive Officer"]),
        ("He is the Chief Executive Officer, or CEO.",
         ["CEO, Chief Executive Officer"]),
        ("CEO (Chief Executive Officer) resigned.",
         ["CEO, Chief Executive Officer"]),
        ("The United Nations (UN) met.", ["UN, United Nations"]),
        ("No acronyms here.", []),
        ("Random CAPS with no expansion nearby.", []),
    ],
)
def test_acronym_extraction_text(text, expected):
    assert acronyms.extract_acronyms_text(text) == expected


def test_acronym_extraction_df(spark):
    df = spark.createDataFrame(
        [("The World Health Organization (WHO) said so.",), ("nothing",)],
        "text string",
    )
    rows = acronyms.extract_acronyms(df).collect()
    assert [r["acronyms"] for r in rows] == ["WHO, World Health Organization"]
