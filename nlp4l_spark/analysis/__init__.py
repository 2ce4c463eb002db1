from nlp4l_spark.analysis.analyzer import (
    Analyzer,
    FOLDING_ANALYZER,
    STANDARD_ANALYZER,
    UAX29_ANALYZER,
    WHITESPACE_ANALYZER,
    LUCENE_ENGLISH_STOPWORDS,
    load_stopwords,
)
from nlp4l_spark.analysis.schema import (
    FieldType,
    Schema,
    SchemaError,
    load_schema,
)

__all__ = [
    "Analyzer",
    "FOLDING_ANALYZER",
    "STANDARD_ANALYZER",
    "UAX29_ANALYZER",
    "WHITESPACE_ANALYZER",
    "LUCENE_ENGLISH_STOPWORDS",
    "load_stopwords",
    "FieldType",
    "Schema",
    "SchemaError",
    "load_schema",
]
