"""Exact-dedup operator tests: reference invariants §2.8 on the synthetic corpus."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from dedup_spark.operators.exact import exact_dup_members, exact_dup_pairs
from dedup_spark.operators.scan import ingest_pages

TS = datetime(2024, 1, 1, tzinfo=timezone.utc)
SCHEMA = "url string, warc_ts timestamp, html binary, text string, lang string, source string"


def test_exact_clusters_match_golden(spark, pages, corpus, config):
    ingested = ingest_pages(pages, config)
    members = exact_dup_members(ingested, "url", "text", config).toPandas()
    gold = corpus.golden_clusters
    gold_exact = gold[gold.dup_kind == "exact"]
    got = members.groupby("exact_cluster_id").id.apply(sorted).to_dict()
    want = gold_exact.groupby("cluster_id").url.apply(sorted).to_dict()
    assert got == want


def test_singletons_dropped(spark, config):
    # mirrors /root/reference/src/find_duplicates_map.cpp:196-201
    rows = [("u1", TS, b"", "alpha beta", "en", "s0"),
            ("u2", TS, b"", "gamma delta", "en", "s0")]
    df = spark.createDataFrame(rows, SCHEMA)
    assert exact_dup_members(df, config=config).count() == 0


def test_empty_text_excluded(spark, config):
    # mirrors /root/reference/src/find_duplicates_base.cpp:34-35
    rows = [("u1", TS, b"", "", "en", "s0"), ("u2", TS, b"", "", "en", "s0"),
            ("u3", TS, b"", "  \t ", "en", "s0"), ("u4", TS, b"", " \t  ", "en", "s0")]
    df = ingest_pages(spark.createDataFrame(rows, SCHEMA))
    assert df.count() == 0


def test_identity_dedup_at_ingest(spark, config):
    # same url twice (hard-link analogue, /root/reference/src/find_duplicates_base.cpp:40-51)
    rows = [("u1", TS, b"", "same text here", "en", "s0"),
            ("u1", datetime(2024, 2, 1, tzinfo=timezone.utc), b"", "later text", "en", "s0"),
            ("u2", TS, b"", "same text here", "en", "s0")]
    df = ingest_pages(spark.createDataFrame(rows, SCHEMA))
    assert df.count() == 2
    kept = {r.url: r.text for r in df.collect()}
    assert kept["u1"] == "same text here"  # earliest warc_ts wins


def test_exact_pairs_star_topology(spark, config):
    rows = [(f"u{i}", TS, b"", "dup dup dup", "en", "s0") for i in range(5)]
    pairs = exact_dup_pairs(spark.createDataFrame(rows, SCHEMA), config=config)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # star around min id u0: n-1 = 4 pairs
    assert got == {("u0", f"u{i}") for i in range(1, 5)}


def test_cluster_is_content_class_not_hash_class(spark, config):
    """Same normalized prefix, different tails -> separate clusters (V1)."""
    a = "shared prefix words here " * 4 + "tail one ending alpha beta " * 3
    b = "shared prefix words here " * 4 + "tail two ending gamma delta " * 3
    rows = [("a1", TS, b"", a, "en", "s0"), ("a2", TS, b"", a, "en", "s0"),
            ("b1", TS, b"", b, "en", "s0"), ("b2", TS, b"", b, "en", "s0")]
    m = exact_dup_members(spark.createDataFrame(rows, SCHEMA), config=config).toPandas()
    clusters = m.groupby("exact_cluster_id").id.apply(sorted).tolist()
    assert sorted(clusters) == [["a1", "a2"], ["b1", "b2"]]


def test_sha256_verify_mode_equals_text_mode(spark, pages, config):
    """config.exact_verify='sha256' (the 100 TB shuffle-light key) must
    produce identical clusters to full-text grouping."""
    from dedup_spark.config import DedupConfig

    ingested = ingest_pages(pages, config)
    a = exact_dup_members(ingested, "url", "text", config).toPandas()
    cfg2 = config.with_(exact_verify="sha256")
    b = exact_dup_members(ingested, "url", "text", cfg2).toPandas()
    key = lambda df: sorted(map(tuple, df[["id", "exact_cluster_id"]].values))
    assert key(a) == key(b)
