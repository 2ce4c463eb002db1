from nlp4l_spark.index.builder import (
    IndexBuilder,
    build_index,
    build_index_from_schema,
)
from nlp4l_spark.index.catalog import IndexCatalog
from nlp4l_spark.index.docids import assign_doc_ids

__all__ = [
    "IndexBuilder",
    "build_index",
    "build_index_from_schema",
    "IndexCatalog",
    "assign_doc_ids",
]
