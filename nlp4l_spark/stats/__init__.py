from nlp4l_spark.stats.corpus import Corpus
from nlp4l_spark.stats import wordcounts, tfidf, moments

__all__ = ["Corpus", "wordcounts", "tfidf", "moments"]
