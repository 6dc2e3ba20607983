"""Catalog shim (dedup_spark/catalog.py): Parquet path always; Iceberg branch
runs when a runtime jar is present (skipped in this sandbox, runnable in CI)."""

from __future__ import annotations

import glob
import os

import pytest

from dedup_spark.catalog import Catalog, _iceberg_available

_ICEBERG_JARS = glob.glob(
    os.path.join(os.environ.get("SPARK_HOME", "/nonexistent"), "jars",
                 "iceberg-spark-runtime*")
) + glob.glob(
    os.path.expanduser("~/.ivy2/jars/*iceberg-spark-runtime*")
)


def test_parquet_write_read_exists_roundtrip(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    assert not cat.exists("t1")
    cat.write(df, "t1")
    assert cat.exists("t1")
    got = {(r.id, r.v) for r in cat.read("t1").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_parquet_overwrite_is_atomic_rename(spark, tmp_path):
    """No partially-written final dir is ever observable: the write lands in
    a staging dir and replaces the target in one rename."""
    cat = Catalog(spark, str(tmp_path))
    df1 = spark.createDataFrame([(1,)], "id long")
    df2 = spark.createDataFrame([(2,)], "id long")
    cat.write(df1, "t")
    cat.write(df2, "t")
    assert [r.id for r in cat.read("t").collect()] == [2]
    # no staging leftovers
    leftovers = [p for p in os.listdir(tmp_path) if "._staging_" in p]
    assert leftovers == []


def test_parquet_partition_by_layout(spark, tmp_path):
    cat = Catalog(spark, str(tmp_path))
    df = spark.createDataFrame(
        [(1, "s1"), (2, "s2")], "id long, source string"
    )
    cat.write(df, "t", partition_by=["source"])
    dirs = sorted(os.listdir(os.path.join(tmp_path, "t")))
    assert any(d.startswith("source=s1") for d in dirs), dirs
    assert any(d.startswith("source=s2") for d in dirs), dirs


def test_iceberg_not_detected_without_catalog_conf(spark):
    """In the sandbox session no Iceberg catalog is configured; the shim must
    take the Parquet path, not emit format('iceberg') reads that would fail."""
    assert _iceberg_available(spark) is False


@pytest.mark.skipif(
    not _ICEBERG_JARS, reason="no Iceberg runtime jar in this sandbox"
)
def test_iceberg_roundtrip_with_local_hadoop_catalog(tmp_path):
    """Deploy-path smoke (CI with the jar): a hadoop catalog on a temp
    warehouse round-trips through the Iceberg branch of the shim."""
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[2]")
        .appName("iceberg-smoke")
        .config("spark.jars", ",".join(_ICEBERG_JARS))
        .config(
            "spark.sql.catalog.local", "org.apache.iceberg.spark.SparkCatalog"
        )
        .config("spark.sql.catalog.local.type", "hadoop")
        .config("spark.sql.catalog.local.warehouse", str(tmp_path / "wh"))
        .getOrCreate()
    )
    try:
        cat = Catalog(spark, str(tmp_path))
        assert cat.use_iceberg is True
        df = spark.createDataFrame([(1, "a")], "id long, v string")
        cat.write(df, "local.db.t", mode="overwrite")
        assert cat.exists("local.db.t")
        got = [(r.id, r.v) for r in cat.read("local.db.t").collect()]
        assert got == [(1, "a")]
    finally:
        spark.stop()
