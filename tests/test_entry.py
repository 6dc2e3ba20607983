"""Driver-contract tests: every queries() entry runs; SQL-expressible ones
match their DuckDB oracle on sf0.001 (value-level, order-insensitive) —
a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonicalize to the driver's dtype-sensitive hash semantics.

    Integer widths are normalized to int64 (Spark int vs DuckDB BIGINT is
    not a semantic difference), but int-vs-float is NOT coerced: a DuckDB
    HUGEINT (windowed sum of BIGINT) arrives as float64 and must FAIL the
    dtype check here, exactly as it fails the driver's value hash
    (round-2 `q_event_sessions` escaped because this harness compared with
    check_dtype=False).
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype("bool")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ALL = sorted(entrymod.queries())
SQL_CHECKED = sorted(entrymod.oracle_sql())


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert df.columns


@pytest.mark.parametrize("name", ALL)
def test_query_runs(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    got = _canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    want = _canon(duck.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: {len(got)} vs {len(want)} rows"
    pd.testing.assert_frame_equal(got, want, check_dtype=True, atol=1e-9)


def test_oracle_keys_subset_of_queries():
    assert set(SQL_CHECKED) <= set(ALL)


def test_event_sessions_timezone_invariant(spark, duck):
    """The driver may run under any session timezone; sessionization must be
    a pure function of the NTZ wall-clock values (round-1 hash-fail was a
    cast("timestamp").cast("long") reinterpreting epochs in session tz)."""
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        got = _canon(
            entrymod.queries()["q_event_sessions"](spark, SF_DIR).toPandas()
        )
        want = _canon(duck.sql(entrymod.oracle_sql()["q_event_sessions"]).df())
        pd.testing.assert_frame_equal(got, want, check_dtype=True, atol=1e-9)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_n5_recall_truth_set_nonvacuous(spark):
    """n5_recall_vs_oracle's oracle is a constant-0 claim; this guards the
    vacuous-pass case by asserting the Hamming-ball truth set is non-empty
    on sf0.001 (which has planted exact dups -> identical simhashes)."""
    from dedup_spark import queries as q
    from pyspark.sql import functions as F

    sims = q._doc_features(spark, SF_DIR).select("doc_id", "simhash")
    a = sims.select(F.col("doc_id").alias("da"), F.col("simhash").alias("sa"))
    b = sims.select(F.col("doc_id").alias("db"), F.col("simhash").alias("sb"))
    n_true = (
        a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
        .count()
    )
    assert n_true > 0
