from nlp4l_spark.stats.corpus import Corpus
from nlp4l_spark.stats import concordance, keyness, wordcounts, tfidf, moments

__all__ = ["Corpus", "concordance", "keyness", "wordcounts", "tfidf", "moments"]
