"""Sources (SURVEY.md §2.1): the reference's scan operators as Spark reads.

Each maps a builtin processor to the idiomatic `spark.read` — Catalyst gets
pushdown/pruning for free on every one of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_text_records(spark: SparkSession, path: str, col: str = "text") -> DataFrame:
    """TextRecordsProcessor (FeaturedProcessors.scala:42-53): one record per
    line, trimmed."""
    return spark.read.text(path).select(F.trim(F.col("value")).alias(col))


def read_csv_records(
    spark: SparkSession, path: str, fields: list[str], encoding: str = "UTF-8"
) -> DataFrame:
    """SampleCsvImportProcessor (sample/SampleCsvImportProcessor.scala:41-59):
    headerless CSV with declared field names, values trimmed."""
    df = spark.read.csv(path, header=False, encoding=encoding).toDF(*fields)
    return df.select(*[F.trim(F.col(c)).alias(c) for c in fields])


def read_jsonl_records(
    spark: SparkSession,
    path: str,
    schema: str | None = None,
    text_field: str = "text",
) -> DataFrame:
    """JSONL corpus reader (beyond the reference — the de-facto LLM
    training-corpus interchange format): one JSON object per line.
    An explicit ``schema`` string skips the schema-inference scan (which
    reads the whole input once before the real job — never do that at
    100 TB); malformed lines land in ``_corrupt`` instead of failing the
    read (PERMISSIVE mode), so a crawl with broken records still loads."""
    reader = spark.read.option("mode", "PERMISSIVE").option(
        "columnNameOfCorruptRecord", "_corrupt"
    )
    if schema is not None:
        reader = reader.schema(schema + ", _corrupt string")
    df = reader.json(path)
    if text_field in df.columns:
        df = df.withColumn(text_field, F.trim(F.col(text_field)))
    return df


def inline_csv_records(
    spark: SparkSession, fields: list[str], data: list[str]
) -> DataFrame:
    """SampleCsvDataProcessor (:71-94): inline CSV literals -> records."""
    rows = [tuple(v.strip() for v in line.split(",")) for line in data]
    return spark.createDataFrame(rows, ", ".join(f"{f} string" for f in fields))


def read_run_table(
    spark: SparkSession,
    catalog_root: str,
    table: str,
    *,
    filters: str | None = None,
    sort: str | None = None,
    order: str = "asc",
    offset: int = 0,
    size: int | None = None,
) -> DataFrame:
    """RunDAO.fetch (dao/RunDao.scala:362-461): re-read a prior run's output
    with filter/sort/paging — a catalog read plus Catalyst predicates."""
    from nlp4l_spark.index.catalog import IndexCatalog

    df = IndexCatalog(catalog_root).read(spark, table)
    if filters:
        df = df.filter(filters)
    if sort:
        df = df.orderBy(F.col(sort).asc() if order == "asc" else F.col(sort).desc())
    if offset:
        df = df.offset(offset)
    if size is not None:
        df = df.limit(size)
    return df
