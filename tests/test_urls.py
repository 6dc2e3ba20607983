"""URL canonicalization (dedup_spark/functions/urls.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup_spark.functions.urls import canonical_url


CASES = [
    # fragment dropped
    ("https://a.example/p#sec", "https://a.example/p"),
    # scheme+host lowered, path/query case kept
    ("HTTPS://A.Example.COM/Path?Q=Xy", "https://a.example.com/Path?Q=Xy"),
    # default ports dropped (scheme-matched only)
    ("http://a.example:80/p", "http://a.example/p"),
    ("https://a.example:443/p", "https://a.example/p"),
    ("http://a.example:8080/p", "http://a.example:8080/p"),
    ("https://a.example:80/p", "https://a.example:80/p"),
    # tracking params dropped wherever they sit; separators stay coherent
    ("https://a.example/p?utm_source=x", "https://a.example/p"),
    ("https://a.example/p?utm_source=x&b=2", "https://a.example/p?b=2"),
    ("https://a.example/p?a=1&utm_medium=m&b=2", "https://a.example/p?a=1&b=2"),
    ("https://a.example/p?a=1&fbclid=zz", "https://a.example/p?a=1"),
    ("https://a.example/p?gclid=g&utm_a=1", "https://a.example/p"),
    # trailing slash merges directory/root spellings
    ("https://a.example/", "https://a.example"),
    ("https://a.example/p/", "https://a.example/p"),
    # whitespace trimmed; non-absolute strings pass through otherwise
    ("  https://a.example/p  ", "https://a.example/p"),
    ("not a url", "not a url"),
]


def test_canonical_url_cases(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i int, url string")
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: got {got[i]!r}, want {want!r}"


def test_canonical_url_is_jvm_side(spark):
    """No Python evaluation node: the canonicalizer must stay codegen-able."""
    df = spark.range(5).select(
        F.concat(F.lit("https://H.example/p/"), F.col("id")).alias("url")
    )
    plan = df.select(canonical_url("url")).sample(1.0)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "EvalPython" not in plan


def test_canonical_url_idempotent(spark):
    """canonical(canonical(u)) == canonical(u) for every test spelling."""
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    rows = df.select(
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    ).collect()
    for r in rows:
        assert r.c1 == r.c2
