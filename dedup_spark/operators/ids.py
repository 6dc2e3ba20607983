"""Compact long ids for shuffle-heavy stages (scale optimization).

Every downstream shuffle — 32-band explode, candidate pairs, CC label
iterations — keys on the document id. Urls are ~30-80 byte strings; carrying
them multiplies shuffle volume 4-10x versus an 8-byte long. This operator
assigns a unique, ORDER-PRESERVING long id per url in one shuffle:

    repartitionByRange(url) -> sortWithinPartitions(url)
      -> monotonically_increasing_id()

monotonically_increasing_id is (partition_id << 33) + row-in-partition;
range partitions are ordered by url and rows are sorted within each, so
nid order == url order — min(nid) over any set selects the row with min(url)
(the property hub selection and CC labels rely on). Ids are unique but NOT
dense (gaps between partitions); nothing downstream needs density, and
dropping it removes the driver-side offset collect, the per-partition
row_number window (a second, hash shuffle of the full table), the broadcast
offsets join, and the persist the previous dense implementation required.

No global single-partition window (`Window.orderBy(url)` without partitioning
would funnel the whole table through one task — the classic scalability trap
this module exists to avoid).

xxhash64(url) is NOT used as the id: at the north rule's 10^12-doc scale,
64-bit birthday collisions are certain (~n^2/2^65 -> >>1), and a collision
silently merges two unrelated documents. monotonically_increasing_id is
collision-free by construction (bounded by 2^33 rows per partition —
enforceable via the partition count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame,
    id_col: str = "url",
    out_col: str = "nid",
    partitions: int | None = None,
    max_rows_per_partition: int = 1 << 33,
) -> DataFrame:
    """Add a unique long `out_col` whose order follows id_col sort order.

    One range shuffle, no driver action, nothing persisted. Ids are stable
    within a run (range bounds are fixed at stage submit; task retries
    recompute identical values) but are partitioning-dependent across runs —
    every externally visible output keys on the url, so results are
    partition-count invariant (SURVEY.md §2.8 #2) regardless.

    The 2^33-rows-per-partition capacity bound of
    monotonically_increasing_id is ENFORCED, not just documented: a per-row
    guard (pipelined JVM expression, no extra scan or job) raises if a
    range partition overflows its id space — overflow would silently bleed
    ids into the next partition's range and break both uniqueness and
    order. `max_rows_per_partition` exists so tests can force a tiny bound.
    """
    n_parts = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    rid = F.monotonically_increasing_id()
    # upper 31 bits = partition id, lower 33 = row-in-partition; overflow
    # manifests as high bits != spark_partition_id()
    ok = (
        F.shiftrightunsigned(rid, 33) == F.spark_partition_id().cast("long")
    ) & (rid.bitwiseAND(F.lit((1 << 33) - 1)) < F.lit(max_rows_per_partition))
    guarded = F.when(ok, rid).otherwise(
        F.raise_error(
            F.lit(
                "assign_dense_ids: a range partition exceeded "
                f"{max_rows_per_partition} rows (monotonically_increasing_id "
                "id-space overflow); raise `partitions`"
            )
        )
    )
    return (
        df.repartitionByRange(int(n_parts), F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn(out_col, guarded)
    )
