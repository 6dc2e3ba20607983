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


def validate_keep_plan(plan: DataFrame) -> DataFrame:
    """Validate an (edited) keeper plan; return offending clusters (empty = ok).

    Batch analogue of the reference's per-cluster prompt validation loop
    (/root/reference/src/deal_with_duplicates.cpp:104-162 +
    src/utilities.cpp get_valid_number: re-prompt until the keeper choice is
    a valid index): a plan row is (cluster_id, url, keep); every cluster must
    keep EXACTLY one member. Instead of re-prompting, invalid clusters are
    returned (cluster_id, n_kept) so the caller can reject the plan with a
    reviewable error table.
    """
    return (
        plan.groupBy("cluster_id")
        .agg(F.sum(F.col("keep").cast("int")).alias("n_kept"))
        .filter(F.col("n_kept") != 1)
    )


def apply_keep_plan(plan: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(validated) plan -> (kept(url), redirects(url, canonical_url)).

    The plan's `keep` column — machine-proposed by select_representatives,
    then optionally human-edited between the `plan` and `apply` job steps —
    is the decision of record; nothing is recomputed. Broadcast-joins the
    (one-per-cluster) keeper side when small; otherwise a plain equi-join on
    cluster_id.
    """
    kept = plan.filter(F.col("keep")).select("url")
    keepers = plan.filter(F.col("keep")).select(
        "cluster_id", F.col("url").alias("canonical_url")
    )
    redirects = (
        plan.filter(~F.col("keep"))
        .join(keepers, "cluster_id")
        .select("url", "canonical_url")
    )
    return kept, redirects


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
