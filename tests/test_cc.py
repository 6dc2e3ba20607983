"""Connected-components tests on adversarial graphs (SURVEY.md §5.2 #4)."""

from __future__ import annotations

import pytest

from dedup_spark.config import DedupConfig
from dedup_spark.operators.components import connected_components


def _cc(spark, edges, **kw):
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = connected_components(df, DedupConfig(shuffle_partitions=8, **kw))
    return {r.id: r.cluster_id for r in got.collect()}


def test_chain(spark):
    # worst case for min-propagation: diameter = n
    edges = [(f"n{i}", f"n{i+1}") for i in range(9)]
    labels = _cc(spark, edges)
    assert set(labels.values()) == {"n0"}
    assert len(labels) == 10


def test_star_and_two_components(spark):
    edges = [("h", f"m{i}") for i in range(5)] + [("x1", "x2"), ("x2", "x3")]
    labels = _cc(spark, edges)
    assert labels["h"] == "h" and all(labels[f"m{i}"] == "h" for i in range(5))
    assert labels["x1"] == labels["x2"] == labels["x3"] == "x1"


def test_self_loop_and_duplicate_edges(spark):
    edges = [("a", "a"), ("a", "b"), ("b", "a"), ("a", "b")]
    labels = _cc(spark, edges)
    assert labels == {"a": "a", "b": "a"}


def test_singleton_nodes_absent(spark):
    labels = _cc(spark, [("a", "b")])
    assert set(labels) == {"a", "b"}


def test_bridge_merge(spark):
    # two cliques joined by one bridge edge -> single component
    edges = (
        [(f"a{i}", f"a{j}") for i in range(3) for j in range(i + 1, 3)]
        + [(f"b{i}", f"b{j}") for i in range(3) for j in range(i + 1, 3)]
        + [("a2", "b0")]
    )
    labels = _cc(spark, edges)
    assert set(labels.values()) == {"a0"}


def test_long_chain_converges_logarithmically(spark):
    """A 300-node chain (diameter 300) — the drifting-boilerplate shape a
    crawl produces across overlapping LSH buckets. Plain neighbor-min
    propagation needs ~300 rounds and would exhaust any practical cap,
    silently mislabeling before the r4 fix; pointer doubling converges in
    O(log d), so 12 rounds MUST suffice (log2(300) ~ 8.2). The tight cap is
    the proof: exhaustion now raises instead of returning partial labels."""
    n = 300
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(n - 1)]
    labels = _cc(spark, edges, cc_max_iterations=12)
    assert len(labels) == n
    assert set(labels.values()) == {"n0000"}


def test_nonconvergence_raises_instead_of_partial_labels(spark):
    """With a cap too small even for doubling, the operator must refuse."""
    edges = [(f"n{i:04d}", f"n{i+1:04d}") for i in range(299)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, edges, cc_max_iterations=2)
