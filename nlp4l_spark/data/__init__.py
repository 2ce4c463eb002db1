from nlp4l_spark.data.fixtures import (
    LONDON_BRIDGE_VERSES,
    TFIDF_SUITE_DOC_INDICES,
    transcripts_df,
    transcripts_rows,
)

__all__ = [
    "LONDON_BRIDGE_VERSES",
    "TFIDF_SUITE_DOC_INDICES",
    "transcripts_df",
    "transcripts_rows",
]
