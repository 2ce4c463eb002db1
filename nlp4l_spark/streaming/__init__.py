from nlp4l_spark.streaming.incremental import append_to_index, stream_into_index

__all__ = ["append_to_index", "stream_into_index"]
