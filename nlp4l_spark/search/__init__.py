from nlp4l_spark.search.engine import Searcher, idf, phrase_bm25_topk

__all__ = ["Searcher", "idf", "phrase_bm25_topk"]
