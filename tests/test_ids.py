"""Order-preserving long id assignment (operators/ids.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup_spark.operators.ids import assign_dense_ids


def test_ids_unique_and_order_preserving(spark):
    rows = [(f"u{i:05d}", i) for i in range(997)]
    df = spark.createDataFrame(rows[::-1], "url string, payload int")
    out = assign_dense_ids(df, "url", "nid").select("url", "nid").toPandas()
    assert out.nid.is_unique
    by_url = out.sort_values("url").nid.tolist()
    assert by_url == sorted(by_url)  # nid order == url order


def test_min_nid_selects_min_url(spark):
    """The hub-selection property CC relies on: min(nid) over any subset is
    the row with the lexicographically smallest url."""
    rows = [(u,) for u in ["b", "zz", "a", "m", "aa"]]
    df = spark.createDataFrame(rows, "url string")
    out = assign_dense_ids(df, "url", "nid")
    got = out.orderBy("nid").select("url").first()[0]
    assert got == "a"
    hub = out.agg(F.min_by("url", "nid")).first()[0]
    assert hub == "a"


def test_capacity_bound_enforced(spark):
    """The 2^33-rows-per-partition id-space bound is enforced at runtime:
    forcing a tiny bound with an overfull partition must raise, not bleed
    ids into the next partition's range."""
    import pytest
    from py4j.protocol import Py4JJavaError

    rows = [(f"u{i:05d}",) for i in range(100)]
    df = spark.createDataFrame(rows, "url string")
    with pytest.raises(Exception) as ei:
        assign_dense_ids(
            df, "url", "nid", partitions=2, max_rows_per_partition=4
        ).collect()
    assert "id-space overflow" in str(ei.value) or "exceeded" in str(ei.value)
