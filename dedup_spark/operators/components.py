"""Connected components via hash-min label propagation (N8 in SURVEY.md §2.7).

DataFrame-native iterative min-label propagation (cf. Rastogi et al.,
"Finding connected components in map-reduce in logarithmic rounds", ICDE 2013
— see PAPERS.md): every node repeatedly adopts the minimum label in its
closed neighborhood until fixpoint. Dedup graphs are unions of near-cliques
(star/all-pair bucket edges), so diameters are tiny and convergence takes a
handful of rounds; `localCheckpoint` after every round cuts the lineage that
would otherwise grow the plan exponentially (SURVEY.md §4.2 #3).

Works directly on string ids (urls): labels are min-strings. No hashing of
node ids means no 64-bit collision risk merging unrelated clusters at
10^12-doc scale; the label column stays a short prefix-compressible string in
Tungsten rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG


def connected_components(
    edges: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """edges(id_a, id_b) -> labels(id, cluster_id).

    cluster_id = min id in the component (deterministic, partition-invariant).
    Only nodes that appear in an edge are returned (singletons dropped —
    reference invariant /root/reference/src/find_duplicates_map.cpp:196-201).
    """
    e = edges.select("id_a", "id_b").filter(F.col("id_a") != F.col("id_b")).distinct()
    # symmetric neighbor view incl. self-loop so labels never regress
    sym = e.unionByName(
        e.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    # checkpoint sym FIRST: labels derive from it, so the (possibly very
    # expensive) upstream pair pipeline is materialized exactly once
    sym = sym.localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("id_a").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )

    for _ in range(config.cc_max_iterations):
        # min label over closed neighborhood: self + neighbors' labels
        nbr_min = (
            sym.join(labels, sym.id_b == labels.id)
            .groupBy(sym.id_a.alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
                (F.col("nbr_label") < F.col("label")).alias("_changed"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break

    return labels.select("id", F.col("label").alias("cluster_id"))
