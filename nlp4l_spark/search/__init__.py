from nlp4l_spark.search.engine import Searcher, idf

__all__ = ["Searcher", "idf"]
