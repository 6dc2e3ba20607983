"""Iceberg-or-Parquet catalog shim (SURVEY.md §1.3).

Production target is an Iceberg table of pages partitioned by ``source``
(north rule: per-partition checkpoint/resume, snapshot-atomic writes). The
sandbox has no Iceberg runtime jar, so this shim exposes one reader/writer
API that uses ``format("iceberg")`` when an Iceberg catalog is configured on
the session, else partitioned Parquet plus a ``_checkpoints/`` manifest
directory that emulates per-partition snapshot/resume (see plans/checkpoint.py).

The 3-stage atomic mutation of the reference's link sink
(/root/reference/src/deal_with_duplicates.cpp:196-251) maps to
write-to-staging-then-atomic-rename here, and to a snapshot commit on Iceberg.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def _iceberg_available(spark: SparkSession) -> bool:
    for k in spark.sparkContext.getConf().getAll():
        if k[0].startswith("spark.sql.catalog.") and "iceberg" in k[1].lower():
            return True
    return False


class Catalog:
    """Uniform read/write over Iceberg (when configured) or Parquet dirs."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        self.use_iceberg = _iceberg_available(spark)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def read(self, table: str) -> DataFrame:
        if self.use_iceberg:
            return self.spark.read.format("iceberg").load(table)
        return self.spark.read.parquet(self._path(table))

    def write(
        self,
        df: DataFrame,
        table: str,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        """Atomic write: staging dir + rename for Parquet; snapshot commit on
        Iceberg (which gives atomicity for free)."""
        if self.use_iceberg:
            w = df.writeTo(table)
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        final = self._path(table)
        staging = final + f"._staging_{uuid.uuid4().hex[:8]}"
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        if mode == "overwrite" and os.path.exists(final):
            shutil.rmtree(final)
        os.replace(staging, final)

    def exists(self, table: str) -> bool:
        if self.use_iceberg:
            return self.spark.catalog.tableExists(table)
        return os.path.exists(self._path(table))
