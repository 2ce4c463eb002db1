from nlp4l_spark.analysis.analyzer import (
    Analyzer,
    STANDARD_ANALYZER,
    WHITESPACE_ANALYZER,
    LUCENE_ENGLISH_STOPWORDS,
    load_stopwords,
)

__all__ = [
    "Analyzer",
    "STANDARD_ANALYZER",
    "WHITESPACE_ANALYZER",
    "LUCENE_ENGLISH_STOPWORDS",
    "load_stopwords",
]
