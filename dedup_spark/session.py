"""SparkSession builder with the engine's standard configuration.

Arrow batching on (all our UDFs are pandas/Arrow-vectorized), AQE on with
skew-join splitting (SURVEY.md §4.2), shuffle partitions sized to the session
parallelism so `local[8]` vs `local[32]` scaling runs are honest.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG


def build_session(
    app_name: str = "dedup_spark",
    master: str | None = None,
    config: DedupConfig = DEFAULT_CONFIG,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession tuned for the dedup pipeline.

    ``master`` defaults to $SPARK_GRAFT_MASTER or local[$SPARK_GRAFT_CPUS].
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    sp = shuffle_partitions or config.shuffle_partitions

    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(config.arrow_max_records_per_batch),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # JVM (not ICU) case mapping for UTF8_BINARY lower()/upper().
        # CollationAwareUTF8String.<clinit> builds ICU title-case tables the
        # first time an interpreted lower() runs (our token-hash stage uses a
        # higher-order lambda, which is always interpreted): measured 45-100 s
        # single-threaded on this host with all other task threads blocked on
        # the class-init monitor. JVM simple case mapping is identical on
        # ASCII webtext and matches the DuckDB oracle's lower().
        .config("spark.sql.icu.caseMappings.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # CPU-heavy stages (signature UDF, shingle-array verify join) read
        # their input back from parquet spill-checkpoints; the default 128 MB
        # split target gives ~1 split/file and stages of 5-6 tasks whose last
        # wave idles most cores (measured: feats stage 85 s with 5 tasks on 4
        # cores). 32 MB splits + 1 MB open cost keep waves balanced; on a
        # cluster this is standard split sizing for compute-bound (not
        # scan-bound) pipelines.
        .config("spark.sql.files.maxPartitionBytes", str(32 * 1024 * 1024))
        .config("spark.sql.files.openCostInBytes", str(1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
