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


def test_small_buckets_exhaustive_across_salts(spark):
    """Regression for the cross-salt recall hole: two docs co-bucketed in a
    sub-cap bucket must be paired DIRECTLY even when their per-id salts
    differ — enumeration below pair_cap_all is exhaustive, not star-closed."""
    rows = [(0, 100, f"d{i:03d}") for i in range(12)]
    df = spark.createDataFrame(rows, "band_idx int, band_key long, id string")
    got = {
        tuple(r)
        for r in salted_pairs_from_buckets(df, "x", nsalt=8)
        .select("id_a", "id_b")
        .collect()
    }
    ids = sorted(r[2] for r in rows)
    want = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1 :]}
    assert got == want  # all 66 pairs, no hub mediation


def test_hot_bucket_pairs_bounded_and_connected(spark):
    """Hot buckets (> cap) must not emit quadratic pairs but must stay one
    component, with all pairs ordered/distinct."""
    rows = [(0, 7, f"h{i:04d}") for i in range(300)]
    df = spark.createDataFrame(rows, "band_idx int, band_key long, id string")
    out = salted_pairs_from_buckets(df, "x", nsalt=8).toPandas()
    # sub-buckets (~n/nsalt <= cap) do local all-pairs: bounded by n*cap/2
    # + hub closure, far below the full quadratic C(300,2)=44850
    assert len(out) <= 300 * 64 / 2 + 8 * 7 / 2
    comps = _components(map(tuple, out[["id_a", "id_b"]].values))
    assert len(comps) == 1 and len(next(iter(comps))) == 300
