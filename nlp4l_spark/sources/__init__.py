from nlp4l_spark.sources.readers import (
    read_text_records,
    read_csv_records,
    inline_csv_records,
    read_run_table,
)
from nlp4l_spark.sources.writers import write_csv, write_json

__all__ = [
    "read_text_records",
    "read_csv_records",
    "inline_csv_records",
    "read_run_table",
    "write_csv",
    "write_json",
]
