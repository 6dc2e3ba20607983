"""Bloom-sidecar incremental exact dedup (operators/bloom.py): the composed
result must EQUAL the text-equality anti-join (Bloom hits are exact-verified,
misses are guaranteed-absent), the sidecar must be deterministic, and the
false-positive pre-filter must actually prune. Oracle parity at driver SFs
rides tests/test_entry.py (c16_bloom_delta)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.bloom import (
    bloom_delta_new,
    bloom_probe,
    bloom_sidecar,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _expected(base_rows, delta_rows):
    base_map = {}
    for i, t in base_rows:
        base_map.setdefault(t or "", []).append(i)
    out = {}
    for i, t in delta_rows:
        hit = base_map.get(t or "")
        out[i] = ("dup", min(hit)) if hit else ("new", None)
    return out


def _run(spark, base_rows, delta_rows, **kw):
    got = bloom_delta_new(_docs(spark, base_rows), _docs(spark, delta_rows), **kw)
    return {r.doc_id: (r.status, r.canonical_doc_id) for r in got.collect()}


def test_equals_anti_join_with_planted_dups(spark):
    base_rows = [(i, f"body of page {i}") for i in range(1, 300, 2)]
    # dups of base texts, an intra-delta dup pair (both must resolve to the
    # same base id or both be new), and null/empty-text equality
    delta_rows = (
        [(i, f"body of page {i}") for i in range(0, 300, 2)]  # all new
        + [(1000 + j, f"body of page {j * 2 + 1}") for j in range(25)]  # dups
        + [(2000, "body of page 7"), (2001, "body of page 7")]
        + [(2002, None), (2003, "")]
    )
    got = _run(spark, base_rows, delta_rows)
    assert got == _expected(base_rows, delta_rows)
    assert sum(1 for v in got.values() if v[0] == "dup") == 27


def test_no_false_negatives_is_structural(spark):
    """Every true dup MUST come back 'dup' even with a tiny, saturated
    bloom (8 bits/slice, 1 slice): saturation only inflates maybe=True,
    never deflates it — the exact verify join absorbs the difference."""
    base_rows = [(i, f"t {i}") for i in range(1, 200)]
    delta_rows = [(1000 + i, f"t {i}") for i in range(1, 200)]
    got = _run(
        spark, base_rows, delta_rows, n_slices=1, bits_per_slice=8, k=2
    )
    assert got == _expected(base_rows, delta_rows)
    assert all(v == ("dup", i - 1000) for i, v in got.items())


def test_empty_base_and_empty_delta(spark):
    rows = [(1, "a a a"), (2, "b b b")]
    empty = _docs(spark, rows).filter(F.lit(False))
    assert _run(spark, [], rows) == {1: ("new", None), 2: ("new", None)}
    got = bloom_delta_new(_docs(spark, rows), empty)
    assert got.count() == 0


def test_probe_prunes_definite_misses(spark):
    """At sane sizing the bloom must do its job: disjoint delta keys come
    back overwhelmingly maybe=False (here: zero hits among 500 keys at
    ~330 bits/key), so the verify join sees only the planted dups."""
    base = spark.range(500).select(F.xxhash64(F.col("id")).alias("h"))
    probe_keys = spark.range(1000, 1500).select(
        F.xxhash64(F.col("id")).alias("h")
    )
    side = bloom_sidecar(base, n_slices=4, bits_per_slice=1 << 12, k=7)
    probed = bloom_probe(
        probe_keys, side, n_slices=4, bits_per_slice=1 << 12, k=7
    )
    n_maybe = probed.filter("maybe").count()
    assert n_maybe == 0, f"fpr too high: {n_maybe}/500"
    # and present keys all hit (no false negatives at the probe layer)
    present = bloom_probe(
        base, side, n_slices=4, bits_per_slice=1 << 12, k=7
    )
    assert present.filter("maybe").count() == 500


def test_sidecar_is_deterministic_and_sliced(spark):
    base = spark.range(2000).select(F.xxhash64(F.col("id")).alias("h"))
    a = {r.slice: r.bitmap for r in bloom_sidecar(base, n_slices=8).collect()}
    b = {
        r.slice: r.bitmap
        for r in bloom_sidecar(base.repartition(13), n_slices=8).collect()
    }
    assert a == b  # partitioning-invariant
    assert set(a) == set(range(8))  # 2000 keys populate every slice


def test_geometry_validation():
    from dedup_spark.operators.bloom import _validate

    with pytest.raises(ValueError):
        _validate(0, 1 << 16, 7)
    with pytest.raises(ValueError):
        _validate(4, 1000, 7)  # not a power of two
    with pytest.raises(ValueError):
        _validate(4, 4, 7)  # under a byte
    with pytest.raises(ValueError):
        _validate(4, 1 << 16, 0)


def test_contract_query_dup_branch_at_sf01(spark):
    """The %2 split crosses 4 exact-dup groups ONLY at sf0.1 (probed in the
    testdata; sf0.001/0.01 have no exact dups) — pin the one SF where the
    contract query's dup branch actually fires."""
    from dedup_spark.queries import QUERIES

    out = QUERIES["c16_bloom_delta"](spark, "/root/testdata/sf0.1")
    dups = {
        r.doc_id: r.canonical_doc_id for r in out.filter("status = 'dup'").collect()
    }
    assert dups == {3562: 1917, 1882: 4677, 1824: 2221, 4246: 1237}


def test_hot_key_delta_all_copies_resolve(spark):
    """Skew shape: 5,000 batch copies of ONE standing page all hash to one
    slice and one verify key — the probe task vectorizes over the whole
    group and the verify join must attribute every copy to the same base
    doc without exploding (hits broadcast, base side never fans out)."""
    base_rows = [(i, f"page {i}") for i in range(100)]
    delta_rows = [(10_000 + j, "page 7") for j in range(5_000)]
    got = _run(spark, base_rows, delta_rows)
    assert len(got) == 5_000
    assert set(got.values()) == {("dup", 7)}


def test_near_dup_bloom_prefilter_is_identity(spark, pages):
    """incremental_near_dups(bloom=...) must return EXACTLY the plain
    result: a Bloom miss cannot join (the sidecar holds every base
    shingle), a false positive only adds a joinless row. Checked both at
    sane sizing and with a deliberately saturated 8-bit bloom."""
    from dedup_spark.functions.text import shingle_hashes
    from dedup_spark.operators.curation import incremental_near_dups

    feats = pages.select(
        F.xxhash64("url").alias("id"),
        shingle_hashes("text", 5).alias("shingle_hashes"),
    ).persist()
    delta = feats.filter(F.pmod("id", F.lit(5)) == 0)
    base = feats.filter(F.pmod("id", F.lit(5)) != 0)

    def run(**kw):
        out = incremental_near_dups(delta, base, threshold=0.7, **kw)
        return sorted(map(tuple, out.collect()))

    plain = run()
    assert sum(1 for r in plain if r[1] == "dup") > 0  # non-vacuous
    assert run(bloom={"n_slices": 8, "bits_per_slice": 1 << 14, "k": 5}) == plain
    assert run(bloom={"n_slices": 1, "bits_per_slice": 8, "k": 2}) == plain
    feats.unpersist()


def test_union_equals_build_of_union(spark):
    """Bloom filters are union-homomorphic: union(build(A), build(B)) must
    equal build(A ∪ B) bit-for-bit — the daily-cycle property that lets a
    standing corpus fold each accepted batch into its sidecar without ever
    rebuilding over the history. Geometry mismatch must fail loudly."""
    from dedup_spark.operators.bloom import bloom_union

    ha = spark.range(0, 1500).select(F.xxhash64("id").alias("h"))
    hb = spark.range(1200, 3000).select(F.xxhash64("id").alias("h"))
    geo = dict(n_slices=8, bits_per_slice=1 << 12, k=5)
    merged = {
        r.slice: r.bitmap
        for r in bloom_union(
            bloom_sidecar(ha, **geo), bloom_sidecar(hb, **geo)
        ).collect()
    }
    direct = {
        r.slice: r.bitmap
        for r in bloom_sidecar(ha.union(hb), **geo).collect()
    }
    assert merged == direct
    # and the merged sidecar probes exactly like the direct one
    probed = bloom_probe(hb, bloom_union(
        bloom_sidecar(ha, **geo), bloom_sidecar(hb, **geo)
    ), **geo)
    assert probed.filter("maybe").count() == hb.count()

    import pytest as _pytest

    bad = bloom_sidecar(hb, n_slices=8, bits_per_slice=1 << 10, k=5)
    with _pytest.raises(Exception, match="geometry mismatch"):
        bloom_union(bloom_sidecar(ha, **geo), bad).collect()


def test_probe_rejects_unmerged_multi_row_sidecar(spark):
    """Two sidecars combined with a plain table union (instead of
    bloom_union) would make the probe see only one bitmap per slice and
    emit Bloom FALSE NEGATIVES — the probe must fail loudly instead."""
    import pytest as _pytest
    from pyspark.errors.exceptions.captured import PythonException

    from dedup_spark.operators.bloom import bloom_probe, bloom_sidecar

    geo = dict(n_slices=4, bits_per_slice=1 << 10, k=3)
    ha = spark.range(0, 500).select(F.xxhash64("id").alias("h"))
    hb = spark.range(500, 1000).select(F.xxhash64("id").alias("h"))
    bad = bloom_sidecar(ha, **geo).unionByName(bloom_sidecar(hb, **geo))
    with _pytest.raises(PythonException, match="bloom_union"):
        bloom_probe(hb, bad, **geo).filter("maybe").count()
