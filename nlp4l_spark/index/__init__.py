from nlp4l_spark.index.builder import IndexBuilder, build_index
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.index.docids import assign_doc_ids

__all__ = ["IndexBuilder", "build_index", "IndexCatalog", "assign_doc_ids"]
