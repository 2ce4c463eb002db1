from nlp4l_spark.stats.corpus import Corpus
from nlp4l_spark.stats import keyness, wordcounts, tfidf, moments

__all__ = ["Corpus", "keyness", "wordcounts", "tfidf", "moments"]
