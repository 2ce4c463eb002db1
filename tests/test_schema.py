"""Schema loader parity with SchemaLoaderSuite
(/root/reference/test/org/nlp4l/lucene/SchemaLoaderSuite.scala and
testschema1.conf / testschema_invalid1-5.conf): one valid config exercising
default + per-field analyzers and index-option flags, plus the negative
validation matrix. Pure Python — no Spark session needed."""

from __future__ import annotations

import json

import pytest

from nlp4l_spark.analysis import (
    LUCENE_ENGLISH_STOPWORDS,
    SchemaError,
    load_schema,
)

VALID = {
    "schema": {
        "defAnalyzer": {"tokenizer": "standard", "filters": ["lowercase", "stop"]},
        "fields": [
            {
                "name": "body",
                "termVectors": True,
                "termPositions": True,
                "termOffsets": True,
            },
            {
                "name": "tag",
                "analyzer": {"tokenizer": "keyword", "filters": ["lowercase"]},
                "indexed": True,
                "stored": False,
            },
            {
                "name": "code",
                "analyzer": {
                    "tokenizer": "pattern",
                    "pattern": "[A-Za-z0-9_]+",
                    "filters": [],
                },
            },
        ],
    }
}


def test_valid_schema_parses():
    s = load_schema(VALID)
    assert s.field_names == ["body", "tag", "code"]
    # default analyzer: lowercase + Lucene stop set
    body = s.analyzer("body")
    assert body.lowercase and body.stopwords == LUCENE_ENGLISH_STOPWORDS
    assert body.tokenize("The Quick code_X") == ["quick", "code", "x"]
    # per-field overrides
    assert s.analyzer("tag").tokenize("Red Apple") == ["red apple"]  # keyword
    code = s.analyzer("code")
    assert not code.lowercase
    assert code.tokenize("Foo_bar Baz") == ["Foo_bar", "Baz"]
    # flags (reference FieldType booleans)
    bt = s.field_type("body")
    assert bt.term_vectors and bt.term_positions and bt.term_offsets
    assert not s.field_type("tag").stored
    # unknown field falls back to default analyzer; field_type raises
    assert s.analyzer("nope") is s.default_analyzer
    with pytest.raises(SchemaError):
        s.field_type("nope")


def test_json_file_round_trip(tmp_path):
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(VALID))
    s = load_schema(str(p))
    assert s.field_names == ["body", "tag", "code"]


@pytest.mark.parametrize(
    "config,msg",
    [
        ({}, "no 'schema' root"),  # invalid1: missing root
        ({"schema": {"fields": [{"name": "a"}]}}, "defAnalyzer"),  # invalid2
        (
            {"schema": {"defAnalyzer": {"tokenizer": "standard"}}},
            "fields",
        ),  # invalid3: missing fields
        (
            {
                "schema": {
                    "defAnalyzer": {"tokenizer": "standard"},
                    "fields": [{"stored": True}],
                }
            },
            "no 'name'",
        ),  # invalid4: field without name
        (
            {
                "schema": {
                    "defAnalyzer": {"tokenizer": "wavelet"},
                    "fields": [{"name": "a"}],
                }
            },
            "unknown tokenizer",
        ),  # invalid5: unknown analyzer component
        (
            {
                "schema": {
                    "defAnalyzer": {"tokenizer": "standard"},
                    "fields": [{"name": "a"}, {"name": "a"}],
                }
            },
            "duplicate field",
        ),
        (
            {
                "schema": {
                    "defAnalyzer": {
                        "tokenizer": "standard",
                        "filters": ["phonemic"],
                    },
                    "fields": [{"name": "a"}],
                }
            },
            "unknown filter",
        ),
        (
            {
                "schema": {
                    "defAnalyzer": {"tokenizer": "pattern"},
                    "fields": [{"name": "a"}],
                }
            },
            "requires a 'pattern'",
        ),
        (
            {
                "schema": {
                    "defAnalyzer": {"tokenizer": "ngram"},
                    "fields": [{"name": "a"}],
                }
            },
            "spellcheck",
        ),
    ],
)
def test_invalid_schemas_raise(config, msg):
    with pytest.raises(SchemaError, match=msg):
        load_schema(config)


def test_stopwords_from_file(tmp_path):
    p = tmp_path / "stop.txt"
    p.write_text("# comment\nfoo\nbar\n\n")
    s = load_schema(
        {
            "schema": {
                "defAnalyzer": {
                    "tokenizer": "standard",
                    "filters": ["lowercase", "stop"],
                    "stopwords_path": str(p),
                },
                "fields": [{"name": "a"}],
            }
        }
    )
    assert s.default_analyzer.tokenize("Foo sees bar run") == ["sees", "run"]


def test_schema_driven_index_build(spark, tmp_path):
    """build_index_from_schema: the field's analyzer + term-vector flags
    drive the build (LuceneIndexingProcessor + perFieldAnalyzer shape)."""
    from nlp4l_spark.index import build_index_from_schema
    from nlp4l_spark.search import Searcher

    schema = load_schema(
        {
            "schema": {
                "defAnalyzer": {
                    "tokenizer": "standard",
                    "filters": ["lowercase", "stop"],
                },
                "fields": [{"name": "text", "termPositions": True}],
            }
        }
    )
    df = spark.createDataFrame(
        [
            ("c0", 0, "user", "london bridge is falling down", None, None),
            ("c0", 1, "agent", "build it up with iron bars", None, None),
            ("c1", 0, "user", "iron bars will bend and break", None, None),
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp",
    )
    cat = build_index_from_schema(df, str(tmp_path / "idx"), schema)
    # termPositions flag materialized the term_vectors table
    tv = cat.read(spark, "term_vectors")
    pos = tv.filter("doc_id = 0 AND term = 'falling'").collect()[0]
    assert pos["positions"] == [3]  # stopword 'is' leaves a position hole
    s = Searcher(spark, str(tmp_path / "idx"), analyzer=schema.analyzer("text"))
    hits = s.search("iron bars", k=3).collect()
    assert [h["doc_id"] for h in hits][:2] == [1, 2] or len(hits) == 2


def test_ja_analyzer_from_schema(tmp_path):
    """tokenizer 'ja' + user_dictionary (Kuromoji CSV lines) builds a
    JaUserDictAnalyzer — the SchemaLoader/JaUserDictionaryProcessorFactory
    path (FeaturedProcessors.scala:286-300); 'cjk' stays dictionary-free."""
    from nlp4l_spark.analysis.jadict import JaUserDictAnalyzer
    from nlp4l_spark.analysis.unicode import UnicodeCJKAnalyzer

    s = load_schema(
        {
            "schema": {
                "defAnalyzer": {"tokenizer": "standard", "filters": ["lowercase"]},
                "fields": [
                    {
                        "name": "ja_text",
                        "analyzer": {
                            "tokenizer": "ja",
                            "filters": ["lowercase"],
                            "user_dictionary": [
                                "関西国際空港,関西 国際 空港,カンサイ コクサイ クウコウ,カスタム名詞"
                            ],
                        },
                        "termPositions": True,
                    }
                ],
            }
        }
    )
    a = s.analyzer("ja_text")
    assert isinstance(a, JaUserDictAnalyzer)
    assert a.tokenize("関西国際空港") == ["関西", "国際", "空港"]

    # file-based dictionary with comments/blank lines
    p = tmp_path / "userdict.txt"
    p.write_text(
        "# custom entries\n\n東京大学,東京 大学,トウキョウ ダイガク,カスタム名詞\n",
        encoding="utf-8",
    )
    s2 = load_schema(
        {
            "schema": {
                "defAnalyzer": {
                    "tokenizer": "ja",
                    "filters": [],
                    "user_dictionary_path": str(p),
                },
                "fields": [{"name": "t"}],
            }
        }
    )
    assert s2.analyzer("t").tokenize("東京大学院") == ["東京", "大学", "院"]

    # dictionary-free cjk mode
    s3 = load_schema(
        {
            "schema": {
                "defAnalyzer": {"tokenizer": "cjk", "filters": []},
                "fields": [{"name": "t"}],
            }
        }
    )
    assert isinstance(s3.analyzer("t"), UnicodeCJKAnalyzer)
    assert s3.analyzer("t").tokenize("東京大学") == ["東京", "京大", "大学"]


@pytest.mark.parametrize(
    "spec, msg",
    [
        (
            {"tokenizer": "cjk", "user_dictionary": ["東京,東京,トウキョウ,名詞"]},
            "dictionary-free",
        ),
        ({"tokenizer": "ja", "user_dictionary": ["abc,abc"]}, "bad user dictionary"),
        (
            {"tokenizer": "ja", "user_dictionary": ["東京大学,東京 大"]},
            "bad user dictionary",
        ),
        ({"tokenizer": "ja", "filters": ["nope"]}, "unknown filter"),
    ],
)
def test_ja_schema_invalid(spec, msg):
    cfg = {"schema": {"defAnalyzer": spec, "fields": [{"name": "t"}]}}
    with pytest.raises(SchemaError, match=msg):
        load_schema(cfg)
