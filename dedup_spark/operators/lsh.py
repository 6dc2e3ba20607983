"""LSH bucket pair generation (N4 + V2 + N10 in SURVEY.md §2).

The reference's join-shaped work is within-bucket pair enumeration
(/root/reference/src/find_duplicates_vector.cpp:191-206); here buckets come
from MinHash band keys. Pair generation is the classic scale hazard: a bucket
of n rows implies n(n-1)/2 pairs, and boilerplate pages create huge buckets.

Skew strategy (explicit — Catalyst/AQE can split skewed *joins* but cannot fix
within-group pair explosion). `salted_pairs_from_buckets`, the default scale
path, is size-aware:

  - bucket sizes are counted first (one partial-aggregated shuffle; the count
    is map-side combinable so hot keys cannot straggle a reducer);
  - buckets with n <= pair_cap_all — the overwhelming majority — generate ALL
    pairs from a sorted collect_list (bounded: <= cap members per task,
    <= cap*(cap-1)/2 pairs per bucket). No salting, so co-bucketed docs are
    NEVER separated by their salt: enumeration below the cap is exhaustive.
  - mid buckets (pair_cap_all < n <= pair_cap_cross) are STILL exhaustive,
    via triangulated block all-pairs: each member gets salt s in [0, nsalt)
    and is replicated to the nsalt task keys {(min(s,t), max(s,t))}; task
    (i, i) emits all pairs inside salt group i, task (i, j), i < j emits the
    full cross product group_i x group_j. Every pair of the bucket is emitted
    exactly once, no task ever holds more than ~2n/nsalt members, and no
    pair is mediated by a hub — this closes the cross-salt recall hole where
    two true near-dups in different salt groups were connected only through
    hub docs that had to survive downstream Hamming/Jaccard verification.
  - ultra-hot buckets (n > pair_cap_cross) switch to the salted two-level
    star: per-salt sub-buckets emit all pairs if small else a star around
    their min-id hub, and the <= nsalt per-bucket hubs are then fully paired
    (second, tiny shuffle). The transitive closure equals the unsalted
    bucket's, which is what connected components needs.

  RECALL TRADEOFF inside ultra-hot buckets (explicit, not silent): star/hub
  edges still have to pass downstream verification (Jaccard), so two true
  near-dups whose only shared buckets are ultra-hot are connected through hub
  docs that may fail the verify cut. At the default pair_cap_cross=1024 this
  tier is reached only by degenerate boilerplate clusters (>1024 docs sharing
  a band key), which are near-identical in practice — that is what makes them
  hot — so hubs verify against members; every hot bucket is nonetheless
  surfaced via `hot_buckets` so the cap is auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG

PAIR_CAP_ALL = 64  # all-pairs only below this bucket size: <= 2016 pairs/bucket
# exhaustive (triangulated) enumeration up to this bucket size: <= ~524k
# pairs/bucket, spread over nsalt*(nsalt+1)/2 bounded tasks; beyond it the
# salted star caps quadratic blowup for degenerate boilerplate clusters.
PAIR_CAP_CROSS = 1024

# Bucket key is the single long `band_key`. Every producer mixes the band /
# probe-table index INTO the key value (MinHash band keys are seeded by band
# index in band_keys_from_signatures, hyperplane keys xor the band index in,
# SimHash block keys go through xxhash64(block_idx, value)), so carrying a
# separate band_idx column through the generator's four reads and its counts
# shuffle was 8 B/row of pure redundancy on the biggest shuffle in the
# near-dup path. A spurious key collision across bands merely merges two
# buckets — extra candidates that downstream Hamming/Jaccard verification
# filters; recall can only gain.
_KEYS = ["band_key"]


def explode_bands(with_bands: DataFrame, id_col: str = "id") -> DataFrame:
    """(id, band_keys: array<long>) -> (band_key, id); keys are band-mixed."""
    return with_bands.select(
        F.col(id_col).alias("id"),
        F.explode("band_keys").alias("band_key"),
    )


def _all_pairs(members) -> F.Column:
    """Inline all-pairs of a sorted member array (whole-stage codegen):
    flatten(transform(members, (x, i) -> transform(tail after i, y -> (x, y))))."""
    return F.flatten(
        F.transform(
            members,
            lambda x, i: F.transform(
                F.slice(members, i + 2, F.size(members)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )


def _star_pairs(members) -> F.Column:
    """Hub star: members[0] (min id after sort_array) paired with the rest."""
    return F.transform(
        F.slice(members, 2, F.size(members)),
        lambda y: F.struct(F.element_at(members, 1).alias("id_a"), y.alias("id_b")),
    )


def pairs_from_buckets(
    exploded: DataFrame, channel: str, pair_cap_all: int | None = PAIR_CAP_ALL
) -> DataFrame:
    """(band_key, id) -> distinct candidate pairs (id_a < id_b).

    One shuffle: groupBy(band_key) with sorted member lists; pairs
    are generated inline with `transform`/`flatten` (whole-stage codegen), then
    a distinct over (id_a, id_b) dedups across buckets.

    ``pair_cap_all=None`` forces exhaustive all-pairs generation regardless of
    bucket size (exact-enumeration mode for oracle-matched queries); the
    default caps quadratic blowup via the star topology. NOTE: either way one
    task collects the full bucket member list — use
    ``salted_pairs_from_buckets`` when buckets can be arbitrarily hot.
    """
    buckets = exploded.groupBy(*_KEYS).agg(
        F.sort_array(F.collect_list("id")).alias("members")
    )
    members = F.col("members")
    n = F.size(members)
    buckets = buckets.filter(n >= 2)
    cap = F.lit(2**31 - 1) if pair_cap_all is None else F.lit(pair_cap_all)
    pairs = buckets.select(
        F.explode(
            F.when(n <= cap, _all_pairs(members)).otherwise(_star_pairs(members))
        ).alias("p")
    ).select("p.id_a", "p.id_b")
    return pairs.distinct().withColumn("channel", F.lit(channel))


def _cross_pairs(a, b) -> F.Column:
    """Full cross product of two disjoint member arrays, id-ordered."""
    return F.flatten(
        F.transform(
            a,
            lambda x: F.transform(
                b,
                lambda y: F.struct(
                    F.least(x, y).alias("id_a"), F.greatest(x, y).alias("id_b")
                ),
            ),
        )
    )


def salted_pairs_from_buckets(
    exploded: DataFrame,
    channel: str,
    nsalt: int,
    pair_cap_all: int = PAIR_CAP_ALL,
    pair_cap_cross: int = PAIR_CAP_CROSS,
) -> DataFrame:
    """Size-aware skew-proof pair generation (see module docstring).

    Exhaustive (identical to the unsalted all-pairs enumeration) for every
    bucket with <= pair_cap_cross members — single-task collect_list below
    pair_cap_all, triangulated cross-salt blocks between the caps — and a
    salted two-level star only for ultra-hot buckets, whose transitive
    closure equals the unsalted bucket's.

    NOTE: reads `exploded` 4x (counts + three semi-joins); spill() any
    UDF-computed input first or the UDF re-runs per read.
    """
    if pair_cap_cross < pair_cap_all:
        pair_cap_cross = pair_cap_all
    counts = exploded.groupBy(*_KEYS).agg(F.count(F.lit(1)).alias("_n"))
    hot_keys = counts.filter(F.col("_n") > F.lit(pair_cap_cross)).select(*_KEYS)
    members = F.col("members")
    n = F.size(members)

    # small buckets: exhaustive, no salt. The semi-join keeps only buckets
    # with 2..cap members BEFORE the heavy collect_list shuffle — on web
    # corpora the vast majority of band buckets are singletons (no pair
    # possible), so this shrinks the expensive aggregation ~10x; the eligible
    # key list is pair-density-sized and AQE broadcasts it (measured: the
    # join runs as BroadcastHashJoin at runtime), leaving one heavy shuffle
    # over only pair-capable rows.
    eligible = counts.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= F.lit(pair_cap_all))
    ).select(*_KEYS)
    small = (
        exploded.join(eligible, _KEYS, "left_semi")
        .groupBy(*_KEYS)
        .agg(F.sort_array(F.collect_list("id")).alias("members"))
        .filter(n >= 2)
        .select(F.explode(_all_pairs(members)).alias("p"))
        .select("p.id_a", "p.id_b")
    )

    # mid buckets: exhaustive triangulated block all-pairs. Each member is
    # replicated to nsalt (t1, t2) task keys; a task holds at most two salt
    # groups (~2n/nsalt members) and emits either in-group all-pairs
    # (t1 == t2) or the full cross product (t1 < t2), so every bucket pair is
    # produced exactly once with NO hub mediation and no unbounded task.
    mid_keys = counts.filter(
        (F.col("_n") > F.lit(pair_cap_all)) & (F.col("_n") <= F.lit(pair_cap_cross))
    ).select(*_KEYS)
    salt = F.pmod(F.xxhash64("id"), F.lit(nsalt)).cast("int")
    mid = (
        exploded.join(mid_keys, _KEYS, "left_semi")
        .withColumn("salt", salt)
        .select(
            *_KEYS,
            "salt",
            "id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(nsalt - 1)),
                    lambda t: F.struct(
                        F.least(F.col("salt"), t).alias("t1"),
                        F.greatest(F.col("salt"), t).alias("t2"),
                    ),
                )
            ).alias("tk"),
        )
        .select(*_KEYS, F.col("tk.t1").alias("t1"), F.col("tk.t2").alias("t2"),
                "salt", "id")
        .groupBy(*_KEYS, "t1", "t2")
        .agg(F.sort_array(F.collect_list(F.struct("salt", "id"))).alias("mem"))
    )
    grp_a = F.transform(
        F.filter("mem", lambda m: m.salt == F.col("t1")), lambda m: m.id
    )
    grp_b = F.transform(
        F.filter("mem", lambda m: m.salt == F.col("t2")), lambda m: m.id
    )
    mid_pairs = (
        mid.select(
            F.explode(
                F.when(F.col("t1") == F.col("t2"), _all_pairs(grp_a)).otherwise(
                    _cross_pairs(grp_a, grp_b)
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )

    # ultra-hot buckets: per-salt sub-buckets, every task bounded by ~bucket/nsalt
    hot = exploded.join(hot_keys, _KEYS, "left_semi").withColumn(
        "salt", F.pmod(F.xxhash64("id"), F.lit(nsalt))
    )
    sub = hot.groupBy(*_KEYS, "salt").agg(
        F.sort_array(F.collect_list("id")).alias("members")
    )
    sub = sub.withColumn("hub", F.element_at(members, 1))
    level1 = (
        sub.filter(n >= 2)
        .select(
            F.explode(
                F.when(n <= F.lit(pair_cap_all), _all_pairs(members)).otherwise(
                    _star_pairs(members)
                )
            ).alias("p")
        )
        .select("p.id_a", "p.id_b")
    )
    # level 2: connect sub-buckets — all pairs among the <= nsalt hubs
    hubs = sub.groupBy(*_KEYS).agg(
        F.sort_array(F.collect_set("hub")).alias("members")
    )
    level2 = (
        hubs.filter(n >= 2)
        .select(F.explode(_all_pairs(members)).alias("p"))
        .select("p.id_a", "p.id_b")
    )
    return (
        small.unionByName(mid_pairs)
        .unionByName(level1)
        .unionByName(level2)
        .distinct()
        .withColumn("channel", F.lit(channel))
    )


def lsh_candidate_pairs(
    with_bands: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    channel: str = "minhash",
) -> DataFrame:
    """Distinct candidate pairs from MinHash band-bucket co-membership
    (size-aware salted generation — the scale path)."""
    return salted_pairs_from_buckets(
        explode_bands(with_bands, id_col), channel, nsalt=config.bucket_salts
    )


def hot_buckets(
    with_bands: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "id",
) -> DataFrame:
    """Report buckets above the all-pairs cap (N10: no silent caps).

    Diagnostic path: keeps the explicit (band_idx, band_key) pair so a hot
    bucket is attributable to its band."""
    exploded = with_bands.select(
        F.col(id_col).alias("id"),
        F.posexplode("band_keys").alias("band_idx", "band_key"),
    )
    return (
        exploded.groupBy("band_idx", "band_key")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") > PAIR_CAP_ALL)
        .orderBy(F.col("n_members").desc())
    )
