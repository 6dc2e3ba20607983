"""Salted two-level LSH pair generation (N10): connectivity equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.lsh import (
    pairs_from_buckets,
    salted_pairs_from_buckets,
)


def _components(pair_rows):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pair_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for node in list(parent):
        comps.setdefault(find(node), set()).add(node)
    return {frozenset(v) for v in comps.values()}


@pytest.fixture(scope="module")
def exploded(spark):
    # 3 buckets: tiny (2), medium (10), hot (300 members)
    rows = []
    for i in range(2):
        rows.append((0, 100, f"a{i:04d}"))
    for i in range(10):
        rows.append((0, 200, f"b{i:04d}"))
    for i in range(300):
        rows.append((1, 300, f"c{i:04d}"))
    # one doc in two buckets (cross-bucket bridge)
    rows.append((0, 200, "c0000"))
    df = spark.createDataFrame(rows, "band_idx int, band_key long, id string")
    df.persist().count()
    return df


def test_salted_connectivity_equals_unsalted(exploded):
    plain = pairs_from_buckets(exploded, "x").select("id_a", "id_b").toPandas()
    salted = salted_pairs_from_buckets(exploded, "x", nsalt=8).select(
        "id_a", "id_b"
    ).toPandas()
    assert _components(map(tuple, plain.values)) == _components(
        map(tuple, salted.values)
    )


def test_salted_task_bound(exploded):
    """No sub-bucket member list exceeds ~bucket/nsalt (the OOM guard)."""
    salted = exploded.withColumn("salt", F.pmod(F.xxhash64("id"), F.lit(8)))
    sizes = (
        salted.groupBy("band_idx", "band_key", "salt")
        .count()
        .agg(F.max("count"))
        .collect()[0][0]
    )
    assert sizes <= 300 / 8 * 3  # loose balance bound

def test_salted_pairs_are_ordered_distinct(exploded):
    out = salted_pairs_from_buckets(exploded, "x", nsalt=4).toPandas()
    assert (out.id_a < out.id_b).all()
    assert not out.duplicated(["id_a", "id_b"]).any()
