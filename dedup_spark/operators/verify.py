"""Exact Jaccard verification of candidate pairs (N7 / V1 in SURVEY.md §2).

The reference verifies hash-bucket candidates by exact byte comparison
(/root/reference/src/utilities.cpp:40-98) so clusters are content-equality
classes; the near-dup generalization verifies LSH candidates by *exact*
shingle-set Jaccard at the configured threshold. LSH only proposes; Jaccard
decides — the cheap-signature-then-expensive-verify shape of the reference's
two-stage table (/root/reference/src/find_duplicates_map_two.cpp:27-36).

JVM-side: `array_intersect` on sorted distinct shingle-hash arrays; no Python.
Two broadcast-ineligible joins (pairs x shingles) shuffle on id — at scale the
shingle table is pre-partitioned on id so both joins reuse one exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG


def verify_pairs_jaccard(
    pairs: DataFrame,
    shingle_sets: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    threshold: float | None = None,
) -> DataFrame:
    """pairs(id_a, id_b[, channel]) x shingle_sets(id, shingle_hashes)
    -> verified pairs with exact `jaccard` column, filtered to >= threshold.
    """
    th = config.jaccard_threshold if threshold is None else threshold
    a = shingle_sets.select(
        F.col("id").alias("id_a"), F.col("shingle_hashes").alias("_sh_a")
    )
    b = shingle_sets.select(
        F.col("id").alias("id_b"), F.col("shingle_hashes").alias("_sh_b")
    )
    joined = pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    out_cols = [c for c in pairs.columns] + ["jaccard"]
    return (
        joined.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= F.lit(th))
        .select(*out_cols)
    )
