"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  : flagship near-dup query on /root/testdata/sf0.001.
queries()     : one entry per implemented operator (SURVEY.md §2 inventory).
oracle_sql()  : DuckDB-equivalent SQL per SQL-expressible query.

Implementations live in dedup_spark/queries.py; this module stays thin.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full dedup engine (exact + MinHash-LSH + SimHash ->
    Jaccard verify -> connected components -> representatives) on sf0.001
    documents — the reference's core question (who duplicates whom, which
    copy do we keep), oracle-checked end to end as `pipeline_end_to_end`."""
    from dedup_spark.queries import QUERIES

    return QUERIES["pipeline_end_to_end"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from dedup_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from dedup_spark.queries import ORACLE

    return dict(ORACLE)
