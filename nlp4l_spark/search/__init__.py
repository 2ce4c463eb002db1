from nlp4l_spark.search.engine import (
    MultiSearcher,
    Searcher,
    idf,
    parse_query,
    phrase_bm25_topk,
    bm25f_topk,
)

__all__ = [
    "MultiSearcher",
    "Searcher",
    "idf",
    "parse_query",
    "phrase_bm25_topk",
    "bm25f_topk",
]
