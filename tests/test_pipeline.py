"""End-to-end pipeline tests: golden recall (the judge's metric), keep policy,
physical invariance (SURVEY.md §2.8 #2 — results independent of parallelism)."""

from __future__ import annotations

import itertools

import pytest

from dedup_spark.plans.pipeline import run_dedup


def _cluster_pairs(df, url_col="url", cl_col="cluster_id"):
    out = set()
    for _, grp in df.groupby(cl_col):
        out |= set(itertools.combinations(sorted(grp[url_col]), 2))
    return out


@pytest.fixture(scope="module")
def result(spark, pages, config):
    res = run_dedup(pages, config)
    members = res.members.toPandas()
    pairs = res.pairs.toPandas()
    summary = res.summary.toPandas()
    return members, pairs, summary


def test_dup_pair_recall_geq_099(result, corpus):
    members, _, _ = result
    gold_pairs = _cluster_pairs(corpus.golden_clusters)
    got_pairs = _cluster_pairs(members)
    recall = len(gold_pairs & got_pairs) / len(gold_pairs)
    assert recall >= 0.99, f"recall {recall}"


def test_no_false_merges(result, corpus):
    """Precision guard: planted sub-threshold sets (J=0.55/0.35, prefix,
    substring) must NOT cluster; no filler doc may join a planted cluster."""
    members, _, _ = result
    gold_pairs = _cluster_pairs(corpus.golden_clusters)
    got_pairs = _cluster_pairs(members)
    assert got_pairs == gold_pairs


def test_keep_policy_representatives(result, corpus):
    members, _, _ = result
    gold = corpus.golden_clusters
    gr = gold[gold.is_representative].set_index("cluster_id").url.to_dict()
    mr = members[members.is_representative].set_index("cluster_id").url.to_dict()
    assert mr == gr


def test_exactly_one_representative_per_cluster(result):
    members, _, _ = result
    per = members.groupby("cluster_id").is_representative.sum()
    assert (per == 1).all()


def test_summary_consistent(result):
    members, _, summary = result
    n_sets = members.cluster_id.nunique()
    n_dups = len(members) - n_sets
    row = summary.iloc[0]
    assert row.n_duplicate_sets == n_sets
    assert row.n_duplicate_docs == n_dups


def test_pairs_have_channel_and_order(result):
    _, pairs, _ = result
    assert set(pairs.channel.unique()) <= {"exact", "minhash", "simhash"}
    assert (pairs.id_a < pairs.id_b).all()
    assert (pairs.jaccard >= 0.7).all()


def test_physical_invariance_shuffle_partitions(spark, pages, config, result):
    """Same clusters at a different shuffle parallelism (§2.8 #2)."""
    members, _, _ = result
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        again = run_dedup(pages, config).members.toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    a = set(map(tuple, members[["url", "cluster_id"]].values))
    b = set(map(tuple, again[["url", "cluster_id"]].values))
    assert a == b
