"""LSH bucket pair generation (N4 + V2 + N10 in SURVEY.md §2).

The reference's join-shaped work is within-bucket pair enumeration
(/root/reference/src/find_duplicates_vector.cpp:191-206); here buckets come
from MinHash band keys. Pair generation is the classic scale hazard: a bucket
of n rows implies n(n-1)/2 pairs, and boilerplate pages create huge buckets.

Skew strategy (explicit — Catalyst/AQE can split skewed *joins* but cannot fix
within-group pair explosion):
  - small buckets (n <= pair_cap_all): all pairs, generated JVM-side from a
    sorted collect_list with higher-order functions (no self-join shuffle);
  - hot buckets (n > pair_cap_all): star topology around the min-id hub —
    O(n) pairs whose transitive closure still connects the bucket, which is
    what connected components needs; near-identical boilerplate docs all
    verify against the hub so recall is preserved;
  - SALTED two-level aggregation (`salted_pairs_from_buckets`, the default
    scale path): the bucket key is salted with pmod(xxhash64(id), nsalt)
    before the collect_list, so no single task ever materializes a
    10^6-member boilerplate bucket; per-salt stars are then connected by an
    all-pairs pass over the <= nsalt per-bucket hubs (second, tiny shuffle).
    Transitive closure is identical to the unsalted star.
  - every hot bucket is reported via `hot_buckets` so no capping is silent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG

PAIR_CAP_ALL = 64  # all-pairs only below this bucket size: <= 2016 pairs/bucket


def explode_bands(with_bands: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, band_keys: array<long>) -> (band_idx, band_key, id)."""
    return with_bands.select(
        F.col(id_col).alias("id"),
        F.posexplode("band_keys").alias("band_idx", "band_key"),
    )


def pairs_from_buckets(
    exploded: DataFrame, channel: str, pair_cap_all: int | None = PAIR_CAP_ALL
) -> DataFrame:
    """(band_idx, band_key, id) -> distinct candidate pairs (id_a < id_b).

    One shuffle: groupBy(band_idx, band_key) with sorted member lists; pairs
    are generated inline with `transform`/`flatten` (whole-stage codegen), then
    a distinct over (id_a, id_b) dedups across buckets.

    ``pair_cap_all=None`` forces exhaustive all-pairs generation regardless of
    bucket size (exact-enumeration mode for oracle-matched queries); the
    default caps quadratic blowup via the star topology.
    """
    buckets = exploded.groupBy("band_idx", "band_key").agg(
        F.sort_array(F.collect_list("id")).alias("members")
    )
    n = F.size("members")
    buckets = buckets.filter(n >= 2)

    members = F.col("members")
    # all pairs: flatten(transform(members, (x, i) -> transform(tail after i, y -> (x, y))))
    all_pairs = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    # star pairs: hub = members[0] (min id after sort_array)
    star_pairs = F.transform(
        F.slice(members, 2, F.size(members)),
        lambda y: F.struct(F.element_at(members, 1).alias("id_a"), y.alias("id_b")),
    )
    cap = F.lit(2**31 - 1) if pair_cap_all is None else F.lit(pair_cap_all)
    pairs = buckets.select(
        F.explode(F.when(n <= cap, all_pairs).otherwise(star_pairs)).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.distinct().withColumn("channel", F.lit(channel))


def salted_pairs_from_buckets(
    exploded: DataFrame,
    channel: str,
    nsalt: int,
    pair_cap_all: int = PAIR_CAP_ALL,
) -> DataFrame:
    """Skew-proof pair generation: bucket keys salted by pmod(xxhash64(id), s).

    Level 1 groups by (band_idx, band_key, salt) — every task's member list is
    ~1/s of the bucket, so a boilerplate mega-bucket can no longer OOM or
    straggle one reducer. Level 2 connects the per-salt components: all pairs
    among the s per-bucket hubs (sub-bucket minima; <= s(s-1)/2 tiny pairs per
    bucket). The union's transitive closure equals the unsalted bucket star's.
    """
    salted = exploded.withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(nsalt))
    )
    buckets = salted.groupBy("band_idx", "band_key", "salt").agg(
        F.sort_array(F.collect_list("id")).alias("members")
    )
    members = F.col("members")
    n = F.size(members)
    all_pairs = F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    star_pairs = F.transform(
        F.slice(members, 2, F.size(members)),
        lambda y: F.struct(F.element_at(members, 1).alias("id_a"), y.alias("id_b")),
    )
    buckets = buckets.withColumn("hub", F.element_at(members, 1))
    level1 = (
        buckets.filter(n >= 2)
        .select(
            F.explode(
                F.when(n <= F.lit(pair_cap_all), all_pairs).otherwise(star_pairs)
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )
    # level 2: connect sub-buckets — all pairs among the <= nsalt hubs
    hubs = buckets.groupBy("band_idx", "band_key").agg(
        F.sort_array(F.collect_set("hub")).alias("members")
    )
    hm = F.col("members")
    hub_pairs = F.flatten(
        F.transform(
            hm,
            lambda x, i: F.transform(
                F.slice(hm, i + 2, F.size(hm)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    level2 = (
        hubs.filter(F.size(hm) >= 2)
        .select(F.explode(hub_pairs).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    return (
        level1.unionByName(level2).distinct().withColumn("channel", F.lit(channel))
    )


def lsh_candidate_pairs(
    with_bands: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    channel: str = "minhash",
) -> DataFrame:
    """Distinct candidate pairs from MinHash band-bucket co-membership
    (salted two-level aggregation — the scale path)."""
    return salted_pairs_from_buckets(
        explode_bands(with_bands, id_col), channel, nsalt=config.bucket_salts
    )


def hot_buckets(
    with_bands: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "id",
) -> DataFrame:
    """Report buckets above the all-pairs cap (N10: no silent caps)."""
    exploded = explode_bands(with_bands, id_col)
    return (
        exploded.groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > PAIR_CAP_ALL)
        .orderBy(F.col("n_members").desc())
    )
