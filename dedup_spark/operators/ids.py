"""Dense long ids for shuffle-heavy stages (scale optimization).

Every downstream shuffle — 32-band explode, candidate pairs, CC label
iterations — keys on the document id. Urls are ~30-80 byte strings; carrying
them multiplies shuffle volume 4-10x versus an 8-byte long. This operator
assigns a deterministic dense long id per url with the range-partitioned
zipWithIndex pattern:

    repartitionByRange(url) -> per-partition row_number -> + broadcast offsets

No global single-partition window (`Window.orderBy(url)` without partitioning
would funnel the whole table through one task — the classic scalability trap
this module exists to avoid). The id assignment is deterministic for a given
input set: ids follow url sort order.

xxhash64(url) is NOT used as the id: at the north rule's 10^12-doc scale,
64-bit birthday collisions are certain (~n^2/2^65 -> >>1), and a collision
silently merges two unrelated documents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_dense_ids(
    df: DataFrame, id_col: str = "url", out_col: str = "nid", partitions: int | None = None
) -> tuple[DataFrame, Callable[[], None]]:
    """Add a deterministic dense long `out_col` (0..n-1 in id_col sort order).

    One range shuffle + one tiny driver-side offset computation (#partitions
    rows). Rows keep all original columns.

    Returns (out, release): the range-partitioned intermediate is persisted so
    the offset pass and the caller's consumption share one shuffle; the caller
    MUST call release() once the output is materialized (e.g. spilled) or the
    cached partitions leak for the session lifetime.
    """
    n_parts = partitions or df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    ranged = df.repartitionByRange(int(n_parts), F.col(id_col)).withColumn(
        "_pid", F.spark_partition_id()
    )
    ranged = ranged.persist()
    counts = (
        ranged.groupBy("_pid").count().orderBy("_pid").collect()
    )  # <= n_parts rows on the driver: safe at any data scale
    offsets = {}
    acc = 0
    for row in counts:
        offsets[row["_pid"]] = acc
        acc += row["count"]
    offset_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(int(p), int(o)) for p, o in offsets.items()], "_pid int, _offset long"
        )
    )
    w = Window.partitionBy("_pid").orderBy(id_col)
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .join(offset_df, "_pid")
        .withColumn(out_col, (F.col("_offset") + F.col("_rn") - 1).cast("long"))
        .drop("_pid", "_rn", "_offset")
    )
    return out, lambda: ranged.unpersist()
