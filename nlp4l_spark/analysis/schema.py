"""Schema / FieldType / schema loader — the index-schema surface.

Reference semantics: ``Schema(defaultAnalyzer, fieldTypes)`` with per-field
``FieldType(analyzer, indexed, stored, termVectors, termPositions,
termOffsets)`` (/root/reference/app/org/nlp4l/lucene/Schema.scala:45-90),
built from HOCON config by ``SchemaLoader.read`` which also composes the
per-field analyzer pipeline (char filters -> tokenizer -> token filters,
/root/reference/app/org/nlp4l/lucene/SchemaLoader.scala:54-149) and raises
on malformed configs (test/org/nlp4l/lucene/SchemaLoaderSuite.scala with
testschema_invalid1-5.conf: missing root / defAnalyzer / fields / field
name / analyzer class).

HOCON isn't available in this environment, so the config is a plain dict
with the same shape (or a JSON file of it):

    {"schema": {
        "defAnalyzer": {"tokenizer": "standard",
                        "filters": ["lowercase", "stop"]},
        "fields": [
            {"name": "body",                    # required
             "analyzer": {...},                 # optional, else defAnalyzer
             "indexed": true, "stored": true,   # optional flags
             "termVectors": true, "termPositions": true,
             "termOffsets": true},
        ],
    }}

Analyzer specs map onto the engine's ``Analyzer`` dataclass:

    tokenizer: "standard"  -> the engine token contract ([a-z0-9]+ runs)
               "keyword"   -> whole value as one token (line-wise ``.+``)
               "pattern"   -> custom regex via "pattern": "..."
    filters:   "lowercase" -> lowercase=True (omit for case-sensitive)
               "stop"      -> stopword removal; words from "stopwords":
                              [...] or "stopwords_path": file (one word per
                              line, '#' comments), default = Lucene's
                              English 33-word set

The reference's ngram tokenizer (testschema1.conf field "ngram") is served
by the char-gram surface in ops/spellcheck.py, not by Analyzer — requesting
it here raises, pointing there.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from nlp4l_spark.analysis.analyzer import (
    LUCENE_ENGLISH_STOPWORDS,
    TOKEN_PATTERN,
    Analyzer,
    load_stopwords,
)


class SchemaError(ValueError):
    """Raised on malformed schema configs (reference: the require()/throw
    paths in SchemaLoader.read, SchemaLoader.scala:54-92)."""


_KNOWN_TOKENIZERS = {"standard", "keyword", "pattern", "ja", "cjk"}
_KNOWN_FILTERS = {"lowercase", "stop"}


@dataclass(frozen=True)
class FieldType:
    """Per-field index options (Schema.scala:88-90). Fields are string-only
    in the reference (the `// TODO: IntField` comment at Schema.scala:87);
    here any column can feed an Analyzer, so the restriction vanishes."""

    analyzer: Analyzer
    indexed: bool = True
    stored: bool = True
    term_vectors: bool = False
    term_positions: bool = False
    term_offsets: bool = False


@dataclass(frozen=True)
class Schema:
    default_analyzer: Analyzer
    field_types: dict[str, FieldType] = field(default_factory=dict)

    def analyzer(self, field_name: str) -> Analyzer:
        """Per-field analyzer dispatch (Schema.perFieldAnalyzer,
        Schema.scala:50-52)."""
        ft = self.field_types.get(field_name)
        return ft.analyzer if ft is not None else self.default_analyzer

    def field_type(self, field_name: str) -> FieldType:
        try:
            return self.field_types[field_name]
        except KeyError:
            raise SchemaError(f"unknown field '{field_name}'") from None

    @property
    def field_names(self) -> list[str]:
        return list(self.field_types)


def _build_analyzer(spec, where: str) -> Analyzer:
    if not isinstance(spec, dict):
        raise SchemaError(f"{where}: analyzer spec must be a mapping")
    tokenizer = spec.get("tokenizer", "standard")
    if tokenizer == "ngram":
        raise SchemaError(
            f"{where}: ngram tokenization is served by ops/spellcheck.py "
            "char-gram columns, not by Analyzer"
        )
    if tokenizer not in _KNOWN_TOKENIZERS:
        raise SchemaError(f"{where}: unknown tokenizer '{tokenizer}'")
    if tokenizer in ("ja", "cjk"):
        # The reference's SchemaLoader builds JapaneseAnalyzer chains
        # from config, with an optional userDictionary file
        # (JaUserDictionaryProcessorFactory reads `userDictionary`,
        # FeaturedProcessors.scala:286-300). Mirror that: tokenizer
        # "ja" + optional "user_dictionary" (list of Kuromoji userdict
        # CSV lines) or "user_dictionary_path" (file, one line each);
        # "cjk" is the dictionary-free bigram mode.
        return _build_ja_analyzer(spec, where, tokenizer)
    if tokenizer == "standard":
        pattern = TOKEN_PATTERN
    elif tokenizer == "keyword":
        pattern = r".+"
    else:  # pattern
        pattern = spec.get("pattern")
        if not pattern:
            raise SchemaError(
                f"{where}: tokenizer 'pattern' requires a 'pattern' key"
            )

    filters = spec.get("filters", [])
    if not isinstance(filters, (list, tuple)):
        raise SchemaError(f"{where}: 'filters' must be a list")
    unknown = [f for f in filters if f not in _KNOWN_FILTERS]
    if unknown:
        raise SchemaError(f"{where}: unknown filter(s) {unknown}")

    lowercase = "lowercase" in filters
    stopwords: frozenset[str] = frozenset()
    if "stop" in filters:
        if "stopwords" in spec:
            stopwords = frozenset(spec["stopwords"])
        elif "stopwords_path" in spec:
            stopwords = load_stopwords(spec["stopwords_path"])
        else:
            stopwords = LUCENE_ENGLISH_STOPWORDS
    return Analyzer(
        lowercase=lowercase, token_pattern=pattern, stopwords=stopwords
    )


def _build_ja_analyzer(spec, where: str, tokenizer: str) -> Analyzer:
    """tokenizer "ja"/"cjk": UnicodeCJKAnalyzer or, with a user
    dictionary, JaUserDictAnalyzer. Filters work as for "standard"
    (lowercase / stop with inline words or a path). The userdict lines
    use the Kuromoji CSV shape ``surface,seg1 seg2,read1 read2,pos`` and
    get the same construction validation as JaUserDictAnalyzer."""
    from nlp4l_spark.analysis.jadict import JaUserDictAnalyzer, JaUserDictEntry
    from nlp4l_spark.analysis.unicode import UnicodeCJKAnalyzer

    filters = spec.get("filters", [])
    if not isinstance(filters, (list, tuple)):
        raise SchemaError(f"{where}: 'filters' must be a list")
    unknown = [f for f in filters if f not in _KNOWN_FILTERS]
    if unknown:
        raise SchemaError(f"{where}: unknown filter(s) {unknown}")
    lowercase = "lowercase" in filters
    stopwords: frozenset[str] = frozenset()
    if "stop" in filters:
        if "stopwords" in spec:
            stopwords = frozenset(spec["stopwords"])
        elif "stopwords_path" in spec:
            stopwords = load_stopwords(spec["stopwords_path"])
        else:
            stopwords = LUCENE_ENGLISH_STOPWORDS

    lines: list[str] = []
    if "user_dictionary" in spec:
        lines = list(spec["user_dictionary"])
    elif "user_dictionary_path" in spec:
        with open(spec["user_dictionary_path"], encoding="utf-8") as fh:
            lines = [
                ln.strip()
                for ln in fh
                if ln.strip() and not ln.lstrip().startswith("#")
            ]
    if tokenizer == "cjk" and lines:
        raise SchemaError(
            f"{where}: tokenizer 'cjk' is dictionary-free; use 'ja' for "
            "a user dictionary"
        )
    if not lines:
        return UnicodeCJKAnalyzer(lowercase=lowercase, stopwords=stopwords)
    try:
        entries = tuple(JaUserDictEntry.parse(ln) for ln in lines)
        return JaUserDictAnalyzer(
            lowercase=lowercase, stopwords=stopwords, entries=entries
        )
    except ValueError as e:
        raise SchemaError(f"{where}: bad user dictionary: {e}") from e


def load_schema(config: dict | str) -> Schema:
    """dict (or path to a JSON file) -> validated Schema.

    Mirrors SchemaLoader.read's failure cases (SchemaLoaderSuite):
    missing 'schema' root, missing 'defAnalyzer', missing/empty 'fields',
    a field without 'name', duplicate field names, unknown
    tokenizer/filter names.
    """
    if isinstance(config, str):
        with open(config, encoding="utf-8") as fh:
            config = json.load(fh)
    if not isinstance(config, dict) or "schema" not in config:
        raise SchemaError("config has no 'schema' root object")
    root = config["schema"]
    if not isinstance(root, dict):
        raise SchemaError("'schema' must be a mapping")
    if "defAnalyzer" not in root:
        raise SchemaError("schema has no 'defAnalyzer'")
    default = _build_analyzer(root["defAnalyzer"], "defAnalyzer")

    fields_cfg = root.get("fields")
    if not isinstance(fields_cfg, list) or not fields_cfg:
        raise SchemaError("schema has no non-empty 'fields' list")

    field_types: dict[str, FieldType] = {}
    for i, fcfg in enumerate(fields_cfg):
        if not isinstance(fcfg, dict) or not fcfg.get("name"):
            raise SchemaError(f"fields[{i}] has no 'name'")
        name = fcfg["name"]
        if name in field_types:
            raise SchemaError(f"duplicate field '{name}'")
        analyzer = (
            _build_analyzer(fcfg["analyzer"], f"field '{name}'")
            if "analyzer" in fcfg
            else default
        )
        field_types[name] = FieldType(
            analyzer=analyzer,
            indexed=bool(fcfg.get("indexed", True)),
            stored=bool(fcfg.get("stored", True)),
            term_vectors=bool(fcfg.get("termVectors", False)),
            term_positions=bool(fcfg.get("termPositions", False)),
            term_offsets=bool(fcfg.get("termOffsets", False)),
        )
    return Schema(default_analyzer=default, field_types=field_types)
