"""Keep-policy / representative selection (O2 in SURVEY.md §2.4).

The reference sorts each cluster by (source path rank asc, mtime asc) and
keeps element [0] (/root/reference/src/deal_with_duplicates.cpp:282-299).
Target: row_number over (cluster_id) ordered by (source_rank, warc_ts, url) —
`url` added as the final tiebreak so the order is total and deterministic
(the reference's std::sort is not stable across equal keys; we must be *more*
deterministic, not less — SURVEY.md §2.4 O2).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def select_representatives(
    members: DataFrame,
    cluster_col: str = "cluster_id",
    order_cols: list[str | Column] | None = None,
    id_col: str = "id",
) -> DataFrame:
    """Add `is_representative` (exactly one true per cluster)."""
    order = list(order_cols or [])
    order.append(F.col(id_col).asc())
    w = Window.partitionBy(cluster_col).orderBy(*order)
    return members.withColumn(
        "is_representative", F.row_number().over(w) == 1
    )
