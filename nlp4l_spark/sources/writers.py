"""Sinks (SURVEY.md §2.2): CSVFileWriter / JsonFileWriter parity.

(FeaturedWriters.scala:38-90). The reference writes a single local file on
the driver; here `df.write` emits per-partition parts — at scale that's the
only sane shape. A `single_file=True` coalesce(1) matches the reference's
exact layout for small exports."""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_csv(
    df: DataFrame,
    path: str,
    *,
    header: bool = True,
    exclude: list[str] | None = None,
    single_file: bool = False,
    mode: str = "overwrite",
) -> None:
    if exclude:
        df = df.drop(*exclude)
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_json(
    df: DataFrame, path: str, *, single_file: bool = False, mode: str = "overwrite"
) -> None:
    if single_file:
        df = df.coalesce(1)
    df.write.mode(mode).json(path)
