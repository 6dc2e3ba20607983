"""Embedding similarity: hyperplane-LSH near-dup channel + ANN vs brute force."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.embedding import (
    ann_topk,
    brute_force_topk,
    cosine_near_dup_pairs,
)

DIM = 32


@pytest.fixture(scope="module")
def vectors(spark):
    """64 base vectors + planted near-dups (cosine ~0.99) of the first 8."""
    rng = np.random.default_rng(5)
    base = rng.standard_normal((64, DIM))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(f"v{i:03d}", base[i].tolist()) for i in range(64)]
    for i in range(8):
        # 0.02 noise in 32 dims -> cosine ~0.994, comfortably above 0.95
        nd = base[i] + 0.02 * rng.standard_normal(DIM)
        rows.append((f"d{i:03d}", (nd / np.linalg.norm(nd)).tolist()))
    df = spark.createDataFrame(rows, "id string, embedding array<double>")
    df.persist().count()
    return df, base


def test_cosine_near_dup_pairs_finds_planted(vectors):
    df, _ = vectors
    pairs = cosine_near_dup_pairs(df, dim=DIM, threshold=0.95).toPandas()
    got = {frozenset((r.id_a, r.id_b)) for r in pairs.itertuples()}
    expected = {frozenset((f"v{i:03d}", f"d{i:03d}")) for i in range(8)}
    assert expected <= got
    assert (pairs.cosine >= 0.95).all()


def test_ann_topk_recall_vs_brute_force(vectors):
    df, _ = vectors
    v = df.select("id", F.col("embedding").alias("v"))
    q = df.filter(F.col("id").startswith("v")).limit(10).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = brute_force_topk(v, q, k=5).toPandas()
    approx = ann_topk(v, q, dim=DIM, k=5).toPandas()
    e = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    a = set(map(tuple, approx[["query_id", "neighbor_id"]].values))
    recall = len(e & a) / len(e)
    assert recall >= 0.8, f"ANN recall {recall}"


def test_banding_for_threshold_curve():
    """Auto-banding: largest r whose S-curve miss prob at the threshold is
    <= 5e-3 — selective where geometry allows, recall-first where it doesn't."""
    import math

    from dedup_spark.operators.embedding import banding_for_threshold

    for t, exp_r in [(0.95, 8), (0.9, 8), (0.7, 4), (0.45, 4)]:
        b, r = banding_for_threshold(t)
        assert b * r == 128
        assert r == exp_r, f"threshold {t}: got r={r}"
        p = 1 - math.acos(t) / math.pi
        assert (1 - p**r) ** b <= 5e-3


def test_lsh_pairs_equal_brute_force_on_planted(vectors):
    """The scale path's whole contract: LSH candidates + exact rescore return
    the SAME pair set as the quadratic scan at the same threshold."""
    df, _ = vectors
    lsh = cosine_near_dup_pairs(df, dim=DIM, threshold=0.95).toPandas()
    a = df.select(F.col("id").alias("id_a"), F.col("embedding").alias("va"))
    b = df.select(F.col("id").alias("id_b"), F.col("embedding").alias("vb"))
    dot = F.aggregate(
        F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
    )
    na = F.sqrt(F.aggregate("va", F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate("vb", F.lit(0.0), lambda s, x: s + x * x))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", dot / (na * nb))
        .filter(F.col("cosine") >= 0.95)
        .toPandas()
    )
    assert {frozenset((r.id_a, r.id_b)) for r in lsh.itertuples()} == {
        frozenset((r.id_a, r.id_b)) for r in brute.itertuples()
    }


def test_ann_exact_cosines_match_brute_force(vectors):
    """Where ANN returns a neighbor the oracle also has, the cosine is exact."""
    df, _ = vectors
    v = df.select("id", F.col("embedding").alias("v"))
    q = df.limit(5).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = brute_force_topk(v, q, k=3).toPandas()
    approx = ann_topk(v, q, dim=DIM, k=3).toPandas()
    em = {(r.query_id, r.neighbor_id): r.cosine for r in exact.itertuples()}
    am = {(r.query_id, r.neighbor_id): r.cosine for r in approx.itertuples()}
    for key in em.keys() & am.keys():
        assert abs(em[key] - am[key]) < 1e-9


def test_ivf_full_probe_equals_brute_force(vectors):
    """nprobe == n_centroids scores every vector exactly once -> the IVF
    result must equal exact search row for row (same tie-breaks)."""
    from dedup_spark.operators.embedding import ivf_topk, train_centroids

    df, _ = vectors
    v = df.select("id", F.col("embedding").alias("v"))
    q = df.filter(F.col("id").startswith("v")).limit(10).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cents = train_centroids(v, n_centroids=8, id_col="id", vec_col="v", seed=7)
    exact = brute_force_topk(v, q, k=5).toPandas()
    ivf = ivf_topk(v, q, cents, k=5, nprobe=8).toPandas()
    e = sorted(map(tuple, exact[["query_id", "neighbor_id", "rank"]].values))
    a = sorted(map(tuple, ivf[["query_id", "neighbor_id", "rank"]].values))
    assert e == a


def test_ivf_recall_at_small_nprobe(vectors):
    """Planted near-dups (cosine ~0.99) land in their base vector's cell, so
    even probing 2 of 8 cells finds them as the top-1 neighbor."""
    from dedup_spark.operators.embedding import ivf_topk, train_centroids

    df, _ = vectors
    v = df.select("id", F.col("embedding").alias("v"))
    q = df.filter(F.col("id").startswith("v") & (F.col("id") < "v008")).select(
        F.col("id").alias("query_id"), F.col("embedding").alias("qv")
    )
    cents = train_centroids(v, n_centroids=8, id_col="id", vec_col="v", seed=7)
    top1 = ivf_topk(v, q, cents, k=1, nprobe=2).toPandas()
    hits = sum(
        1 for r in top1.itertuples()
        if r.neighbor_id == "d" + r.query_id[1:]
    )
    assert hits >= 6, f"IVF top-1 planted recall {hits}/8"


def test_train_centroids_deterministic_unit_norm(vectors):
    from dedup_spark.operators.embedding import train_centroids

    df, _ = vectors
    v = df.select("id", F.col("embedding").alias("v"))
    c1 = train_centroids(v, n_centroids=8, id_col="id", vec_col="v", seed=7)
    c2 = train_centroids(v, n_centroids=8, id_col="id", vec_col="v", seed=7)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def test_banding_scales_with_corpus_size():
    """Band width r must grow with n: an r-bit band has 2^r buckets, so at
    n vectors expected buckets hold n/2^r members and blow past the pair
    generator's star cap if r stays at the fixed-128-bit choice (measured
    at 1M dim-64 vectors / threshold 0.95: recall collapsed to ~2% before
    the size-aware rule; 10,000/10,000 planted pairs after)."""
    import math

    from dedup_spark.operators.embedding import banding_for_threshold

    # small n: identical to the fixed-budget answer (driver plans unchanged)
    assert banding_for_threshold(0.95, n=1000) == banding_for_threshold(0.95)

    p95 = 1 - math.acos(0.95) / math.pi
    prev_r = 0
    for n in (20_000, 1_000_000, 100_000_000):
        b, r = banding_for_threshold(0.95, n=n)
        assert r >= prev_r, "r must be monotone in n"
        prev_r = r
        # expected uniform bucket stays far under the >1024 star tier
        assert n / 2**r <= 16
        # the S-curve miss bound at the threshold holds (tightened target)
        assert (1 - p95**r) ** b <= 1e-4
        assert b * r <= 4096

    # loose threshold at large n: the bits budget caps out and r steps down
    # (documented geometry limit — buckets then exceed the star cap and the
    # residual loss is surfaced via hot-bucket reporting)
    b, r = banding_for_threshold(0.45, n=1_000_000)
    assert b * r <= 4096
    p45 = 1 - math.acos(0.45) / math.pi
    assert (1 - p45**r) ** b <= 1e-4


def test_band_key_mixing_supports_many_bands():
    """The band-index mix must keep bands distinct past 255 bands: the old
    `packed ^ (band << 56)` wrapped mod 2^64 (band 146 == band 402), merging
    unrelated buckets. The multiply-mix keeps every (band, packed) key
    distinct across all bands for the same sign slice."""
    import numpy as np

    from dedup_spark.operators.embedding import _band_keys_numpy, _hyperplanes

    bands, r, dim = 512, 6, 8
    H = _hyperplanes(dim, bands * r, seed=7)
    X = np.random.default_rng(3).standard_normal((4, dim))
    keys = _band_keys_numpy(X, H, bands, r)
    assert keys.shape == (4, bands)
    for row in keys:
        assert len(set(row.tolist())) == bands, "cross-band key collision"


def test_domain_assign_hand_values(spark):
    """Nearest-prototype assignment on axis-aligned vectors where the
    winner is known, plus the rounded-cosine tie -> smallest domain rule."""
    from dedup_spark.operators.embedding import domain_assign

    protos = np.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ]
    )
    rows = [
        (0, [2.0, 0.1, 0.0]),   # -> domain 0
        (1, [0.0, 5.0, 0.2]),   # -> domain 1
        (2, [0.1, 0.0, 1.0]),   # -> domain 2
        (3, [1.0, 1.0, 0.0]),   # exact tie d0/d1 -> smaller domain wins
    ]
    df = spark.createDataFrame(rows, "id long, v array<double>")
    got = {
        r["id"]: (r["domain_id"], r["cosine"])
        for r in domain_assign(df, protos, id_col="id", vec_col="v").collect()
    }
    assert got[0][0] == 0 and got[1][0] == 1 and got[2][0] == 2
    assert got[3] == (0, 0.7071)
    assert got[0][1] == round(2.0 / np.sqrt(4.01), 4)


def test_domain_assign_zero_exchange_plan(spark):
    """domain_assign is a pure map: one ArrowEvalPython (the matmul kernel)
    and a codegen greatest-over-structs projection — no Exchange, no window,
    no explode anywhere in the plan."""
    import re

    from dedup_spark.operators.embedding import domain_assign

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "id long, v array<double>"
    )
    protos = np.eye(2)
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        domain_assign(df, protos, id_col="id", vec_col="v").explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan
    assert len(re.findall(r"\(\d+\) ArrowEvalPython", plan)) == 1, plan
    assert "Generate" not in plan and "Window" not in plan, plan


def test_domain_assign_matches_brute_force(spark, vectors):
    """Against the fixture corpus: for every vector the assigned domain is
    the argmax over numpy-computed rounded cosines with the same tie rule."""
    from dedup_spark.operators.embedding import domain_assign

    df, _ = vectors
    pdf = df.toPandas()
    X = np.vstack(pdf["embedding"].map(np.asarray))
    protos = X[:4]
    C = (X @ protos.T) / (
        np.linalg.norm(X, axis=1)[:, None] * np.linalg.norm(protos, axis=1)[None, :]
    )
    Cr = np.round(C, 4)  # fixture cosines are nowhere near .5e-4 boundaries
    expect = Cr.argmax(axis=1)  # argmax returns FIRST max = smallest domain
    got = {
        r["id"]: r["domain_id"]
        for r in domain_assign(
            df, protos, id_col="id", vec_col="embedding"
        ).collect()
    }
    for i, vid in enumerate(pdf["id"]):
        assert got[vid] == expect[i], vid


def test_semantic_dedup_planted_clusters(spark):
    """Planted scenario: two tight clusters dedup to their min id, a
    singleton keeps itself, and a near-identical pair that straddles a
    domain boundary is NOT merged (the SemDeDup within-domain contract)."""
    from dedup_spark.operators.embedding import semantic_dedup

    e = np.eye(8)
    protos = e[:3]
    mid_a = e[0] + 0.9 * e[1]   # nearest proto 0
    mid_b = 0.9 * e[0] + e[1]   # nearest proto 1; cosine(mid_a, mid_b)~0.994
    rows = [
        (10, e[0]), (11, e[0] + 0.01 * e[3]), (12, e[0] + 0.01 * e[4]),
        (20, e[1]), (21, e[1] + 0.01 * e[5]),
        (30, e[2]),
        (40, mid_a), (41, mid_b),
    ]
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in rows], "id long, v array<double>"
    )
    got = {
        r["id"]: (r["domain_id"], r["rep_id"], r["cluster_size"], r["keep"])
        for r in semantic_dedup(df, protos, threshold=0.9, dim=8).collect()
    }
    assert len(got) == 8
    for i in (10, 11, 12):
        assert got[i] == (0, 10, 3, i == 10)
    for i in (20, 21):
        assert got[i] == (1, 20, 2, i == 20)
    assert got[30] == (2, 30, 1, True)
    # cosine(40,41) >= 0.9 but domains differ: both stay singletons
    assert got[40] == (0, 40, 1, True)
    assert got[41] == (1, 41, 1, True)


def test_semantic_dedup_matches_brute_force(spark, vectors):
    """Identity vs a numpy replay on the fixture corpus (string ids):
    argmax assignment on rounded cosines, same-domain rounded-cosine>=t
    pairs, union-find closure, min-id reps, sizes."""
    from dedup_spark.operators.embedding import semantic_dedup

    df, _ = vectors
    pdf = df.toPandas()
    ids = pdf["id"].tolist()
    X = np.vstack(pdf["embedding"].map(np.asarray))
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    protos = X[:4]
    Pn = protos / np.linalg.norm(protos, axis=1, keepdims=True)
    dom = np.round(Xn @ Pn.T, 4).argmax(axis=1)  # first max = smallest id
    C = np.round(Xn @ Xn.T, 4)
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    n = len(ids)
    for i in range(n):
        for j in range(i + 1, n):
            if C[i, j] >= 0.95 and dom[i] == dom[j]:
                ra, rb = find(ids[i]), find(ids[j])
                if ra != rb:
                    lo, hi = min(ra, rb), max(ra, rb)
                    parent[hi] = lo
    reps = {i: find(i) for i in ids}
    sizes: dict = {}
    for r in reps.values():
        sizes[r] = sizes.get(r, 0) + 1

    got = semantic_dedup(
        df, protos, threshold=0.95, dim=DIM, id_col="id", vec_col="embedding"
    ).collect()
    assert len(got) == n
    for r in got:
        i = ids.index(r["id"])
        assert r["domain_id"] == dom[i], r
        assert r["rep_id"] == reps[r["id"]], r
        assert r["cluster_size"] == sizes[reps[r["id"]]], r
        assert r["keep"] == (r["id"] == reps[r["id"]]), r
    assert sum(1 for r in got if r["keep"]) == len(sizes)


def test_cosine_exact_bit_identical_to_interpreted_fold(spark):
    """cosine_exact (Arrow kernel) must equal _cosine (the interpreted JVM
    fold) BIT-FOR-BIT, not approximately: every rounded-threshold keep
    decision and every rank tie in the embedding queries rides the exact
    double, so a single ULP of summation-order drift could flip an oracle
    row. The kernel earns exactness by looping dimensions in fold order;
    this pins it across dims that exercise partial final blocks."""
    import random

    from pyspark.sql import functions as F

    from dedup_spark.operators.embedding import _cosine, cosine_exact

    import struct

    rng = random.Random(7)
    # one pass per dim: a vector column has ONE dim (every operator takes
    # `dim` explicitly); the Arrow kernel may assume rectangular batches
    for dim in (3, 17, 64):
        rows = []
        for i in range(200):
            # mixed magnitudes force non-commutative-summation differences
            # to surface if the op order ever diverges
            va = [rng.uniform(-1, 1) * 10 ** rng.randint(-6, 6) for _ in range(dim)]
            vb = [rng.uniform(-1, 1) * 10 ** rng.randint(-6, 6) for _ in range(dim)]
            rows.append((i, va, vb))
        df = spark.createDataFrame(rows, "id long, va array<double>, vb array<double>")
        got = (
            df.withColumn("c_jvm", _cosine(F.col("va"), F.col("vb")))
            .withColumn("c_arrow", cosine_exact(F.col("va"), F.col("vb")))
            .select("id", "c_jvm", "c_arrow")
            .collect()
        )
        assert len(got) == 200
        bits = lambda x: struct.pack("<d", x)
        for r in got:
            assert bits(r["c_jvm"]) == bits(r["c_arrow"]), (
                dim, r["id"], r["c_jvm"].hex(), r["c_arrow"].hex(),
            )


def test_blocked_argmax_identical_to_full_matrix():
    """The large-k blocked kernel must be bitwise identical to the one-shot
    round-then-argmax over the full (n, k) matrix, including first-max tie
    resolution across block boundaries."""
    import numpy as np

    from dedup_spark.operators.embedding import _blocked_rounded_argmax
    import dedup_spark.operators.embedding as emb_mod

    rng = np.random.default_rng(9)
    n, k, dim = 64, 20000, 6
    X = rng.normal(size=(n, dim))
    P = rng.normal(size=(k, dim))
    # plant exact ties: duplicate some prototypes so rounded cosines tie
    P[5000] = P[17]
    P[19999] = P[17]
    pn = np.sqrt((P * P).sum(axis=1))
    xn = np.sqrt((X * X).sum(axis=1))
    C = np.round((X @ P.T) / (xn[:, None] * pn[None, :]), 4)
    want_i = C.argmax(axis=1)
    want_v = C[np.arange(n), want_i]
    got_i, got_v = _blocked_rounded_argmax(X, P, pn, xn, 4)
    np.testing.assert_array_equal(got_i, want_i)
    np.testing.assert_array_equal(got_v, want_v)
    # and with a tiny block size (forces many blocks + cross-block ties)
    old = emb_mod._PROTO_BLOCK
    try:
        emb_mod._PROTO_BLOCK = 7
        got_i2, got_v2 = _blocked_rounded_argmax(X, P, pn, xn, 4)
    finally:
        emb_mod._PROTO_BLOCK = old
    np.testing.assert_array_equal(got_i2, want_i)
    np.testing.assert_array_equal(got_v2, want_v)


def test_domain_assign_large_k_path_matches_small_k_rule(spark):
    """k > 256 routes through the blocked-argmax UDF; its winners must
    match the rounded-argmax rule the JVM greatest-struct path pins."""
    import numpy as np

    from dedup_spark.operators.embedding import domain_assign

    rng = np.random.default_rng(3)
    k, dim, n = 300, 8, 40
    protos = rng.normal(size=(k, dim))
    vecs = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(n)]
    df = spark.createDataFrame(vecs, "id long, v array<double>")
    got = {
        r.id: (r.domain_id, r.cosine)
        for r in domain_assign(df, protos, id_col="id", vec_col="v").collect()
    }
    X = np.vstack([np.asarray(v, dtype=np.float64) for _, v in vecs])
    pn = np.sqrt((protos * protos).sum(axis=1))
    xn = np.sqrt((X * X).sum(axis=1))
    C = np.round((X @ protos.T) / (xn[:, None] * pn[None, :]), 4)
    for i in range(n):
        j = int(C[i].argmax())
        assert got[i] == (j, C[i, j])


def test_semantic_dedup_blocked_path_matches_fused(spark):
    """Forcing the blocked large-k map phase (tiny _PROTO_BLOCK) must give
    the identical semantic_dedup output as the fused single-matmul path."""
    import numpy as np

    import dedup_spark.operators.embedding as emb_mod
    from dedup_spark.operators.embedding import semantic_dedup

    rng = np.random.default_rng(11)
    dim, k = 6, 5
    protos = rng.normal(size=(k, dim))
    base = rng.normal(size=(20, dim))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, [float(x) for x in v]))
        if i < 6:  # planted near-identical partner
            rows.append((100 + i, [float(x) for x in v + rng.normal(scale=1e-4, size=dim)]))
    df = spark.createDataFrame(rows, "id long, v array<double>")

    def run():
        return sorted(
            (r.id, r.domain_id, r.rep_id, r.cluster_size, r.keep)
            for r in semantic_dedup(
                df, protos, threshold=0.95, dim=dim, id_col="id", vec_col="v"
            ).collect()
        )

    fused = run()
    old = emb_mod._PROTO_BLOCK
    try:
        emb_mod._PROTO_BLOCK = 2  # forces the blocked map phase
        blocked = run()
    finally:
        emb_mod._PROTO_BLOCK = old
    assert fused == blocked
    assert any(r[3] > 1 for r in fused)  # planted clusters exist
