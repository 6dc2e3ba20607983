"""Exact-duplicate detection (G2-G7 + V1 in SURVEY.md §2).

Reproduces the reference's lazy two-stage semantics
(/root/reference/src/find_duplicates_map_two.cpp:93-157): a cheap signature
(xxhash64 of the text — the analogue of the 4 KiB prefix XXH3) prunes rows
that cannot have a duplicate, and only survivors are grouped by the *full
content*, which both verifies and splits hash collisions exactly
(/root/reference/src/find_duplicates_map.cpp:43-66: clusters are content-
equality classes, never hash classes).

Scale shape: ONE full-table shuffle, keyed on (content hash, verification
key). Equal verification key implies equal text implies equal hash, so
grouping by the pair never splits a content class, and the hash-prune +
content-verify steps both run inside that single exchange (the previous
two-step plan shuffled every row on the hash and then re-shuffled survivors
on the verification key). Row width is what the verify mode chooses: the
full text by default (the literal content-equality contract; two texts with
equal xxhash64 land in the same bucket but different groups) or (length,
sha256) under config.exact_verify="sha256" — 48 bytes/row for the 100 TB
shuffle budget, identical grouping absent a SHA-256 collision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG


def prune_non_candidates(
    df: DataFrame, key_col, min_count: int = 2
) -> DataFrame:
    """G2: keep only rows whose `key_col` value occurs >= min_count times.

    The reference's `skip_files_with_unique_size`
    (/root/reference/src/find_duplicates_base.cpp:142-166) generalized to any
    cheap invariant. Window-count avoids a second scan of the input; Catalyst
    plans it as one shuffle on the key.
    """
    w = Window.partitionBy(key_col)
    return (
        df.withColumn("_grp_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_grp_n") >= min_count)
        .drop("_grp_n")
    )


def exact_dup_members(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    config: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Two-stage exact dedup -> member table (id, text_hash, exact_cluster_id).

    exact_cluster_id is min(id) over the content-equality class (deterministic,
    independent of partitioning — invariant §2.8 #2). Singleton classes are
    dropped (§2.8 #3). Hash collisions are split because the final grouping key
    is the full text, not the hash.
    """
    if config.exact_verify == "sha256":
        # 100 TB path: (length, sha256) is the verification key — 40 bytes
        # shuffled per survivor instead of the whole document; collision
        # probability ~n^2/2^257 (see config.exact_verify)
        verify_key = F.struct(
            F.length(text_col).alias("n"), F.sha2(text_col, 256).alias("h")
        )
    else:
        verify_key = F.col(text_col)
    hashed = df.select(
        F.col(id_col).alias("id"),
        verify_key.alias("_vkey"),
        F.xxhash64(text_col).alias("text_hash"),
    )
    # ONE shuffle: equal _vkey implies equal text implies equal text_hash,
    # so partitioning on the pair never splits a content class, and the
    # hash-prune (G2) + exact verify/split (V1) both resolve inside this
    # exchange — the count filter runs on the exact key, preserving the lazy
    # two-stage semantics without the second survivor shuffle
    w = Window.partitionBy("text_hash", "_vkey")
    members = (
        hashed.withColumn("_n", F.count(F.lit(1)).over(w))
        .filter(F.col("_n") >= 2)
        .withColumn("exact_cluster_id", F.min("id").over(w))
        .select("id", "text_hash", "exact_cluster_id")
    )
    return members


def exact_dup_pairs(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    config: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Star-topology pairs (id_a < id_b) within each content-equality class.

    O(n) pairs per class (hub = cluster id), enough for connected components
    to recover the full class without the quadratic pair explosion a 10^6-copy
    boilerplate page would otherwise cause.
    """
    m = exact_dup_members(df, id_col, text_col, config)
    return (
        m.filter(F.col("id") != F.col("exact_cluster_id"))
        .select(
            F.least("exact_cluster_id", "id").alias("id_a"),
            F.greatest("exact_cluster_id", "id").alias("id_b"),
        )
        .withColumn("channel", F.lit("exact"))
    )
