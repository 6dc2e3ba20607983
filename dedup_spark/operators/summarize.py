"""Summarize sink (S5 in SURVEY.md §2.1).

The reference prints: number of duplicate files = sum(n-1), number of
duplicate sets, reclaimable bytes = sum((n-1) * size)
(/root/reference/src/deal_with_duplicates.cpp:273-306). Same aggregates as a
one-row DataFrame over the cluster member table. `format_bytes` reproduces
the reference's binary-prefix pretty printer for the report layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PREFIXES = ["", "kibi", "mebi", "gibi", "tebi", "pebi"]


def format_bytes(n: int) -> str:
    """Binary-prefix pretty printer — semantics-identical to the reference's
    `format_bytes` (/root/reference/src/utilities.cpp:203-222): divide by
    1024 while strictly > 1024, kibi..pebi prefixes, fixed 2 decimals."""
    v = float(n)
    i = 0
    while v > 1024 and i < len(_PREFIXES) - 1:
        v /= 1024.0
        i += 1
    return f"{v:.2f} {_PREFIXES[i]}bytes"


def summarize_clusters(
    members: DataFrame,
    cluster_col: str = "cluster_id",
    bytes_col: str | None = "doc_bytes",
) -> DataFrame:
    """members(id, cluster_id[, doc_bytes]) -> one row of totals."""
    per_cluster = members.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n"),
        *(
            [F.max(bytes_col).alias("_sz")]
            if bytes_col and bytes_col in members.columns
            else []
        ),
    )
    aggs = [
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).alias("n_duplicate_docs"),
        F.count(F.lit(1)).alias("n_duplicate_sets"),
    ]
    if bytes_col and bytes_col in members.columns:
        aggs.append(
            F.coalesce(F.sum((F.col("n") - 1) * F.col("_sz")), F.lit(0)).alias(
                "bytes_reclaimable"
            )
        )
    return per_cluster.agg(*aggs)
