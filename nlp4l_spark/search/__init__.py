from nlp4l_spark.search.engine import (
    Searcher,
    idf,
    parse_query,
    phrase_bm25_topk,
    bm25f_topk,
)

__all__ = ["Searcher", "idf", "parse_query", "phrase_bm25_topk", "bm25f_topk"]
