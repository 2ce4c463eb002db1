from nlp4l_spark.ops import (
    acronyms,
    dedup,
    ltr,
    ml,
    multimodal,
    processors,
    similarity,
    textqc,
)

__all__ = [
    "processors", "dedup", "similarity", "textqc", "multimodal",
    "ml", "ltr", "acronyms",
]
