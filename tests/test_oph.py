"""Densified one-permutation hashing (config.minhash_scheme="oph").

Pins: (1) the vectorized kernel is bit-identical to a straightforward
per-doc reference implementation of the published scheme (hash once, range
bins, per-bin min, circular borrow densification with +t*p offsets);
(2) per-row agreement estimates Jaccard without bias (the property banding
relies on); (3) batch/slicing invariance and empty-doc sentinel semantics
match the classic kernel's contract; (4) the full pipeline under scheme
"oph" still clusters the planted corpus exactly (recall 1.0, no false
merges) — banding and verification downstream are scheme-agnostic.
"""

from __future__ import annotations

import numpy as np
import pytest

from dedup_spark.config import MERSENNE_31, DedupConfig
from dedup_spark.functions.minhash import (
    _permutation_coeffs,
    fold31,
    minhash_from_flat,
    oph_from_flat,
)

P = MERSENNE_31


def _oph_reference(doc: np.ndarray, num_perm: int, seed: int) -> np.ndarray:
    """Per-doc reference implementation: plain Python, no packing tricks."""
    if len(doc) == 0:
        return np.full(num_perm, P, dtype=np.int64)
    a, b = _permutation_coeffs(1, seed + 1_000_003)
    h = (int(a[0]) * fold31(doc).astype(object) + int(b[0])) % P
    h = np.array([int(v) for v in h], dtype=np.uint64)
    bins = (h * np.uint64(num_perm)) >> np.uint64(31)
    sig = [None] * num_perm
    for hv, bn in zip(h.tolist(), bins.tolist()):
        if sig[bn] is None or hv < sig[bn]:
            sig[bn] = hv
    out = np.empty(num_perm, dtype=np.int64)
    for j in range(num_perm):
        if sig[j] is not None:
            out[j] = sig[j]
            continue
        t = 1
        while sig[(j + t) % num_perm] is None:
            t += 1
        out[j] = sig[(j + t) % num_perm] + t * P
    return out


def _rand_docs(rng, n, lo=0, hi=220):
    return [
        np.unique(
            rng.integers(-(2**62), 2**62, size=rng.integers(lo, hi), dtype=np.int64)
        )
        for _ in range(n)
    ]


def _flat(docs):
    lengths = np.array([len(d) for d in docs], dtype=np.int64)
    flat = (
        np.concatenate(docs) if len(docs) else np.empty(0, dtype=np.int64)
    )
    return flat, lengths


def test_kernel_matches_reference_implementation():
    rng = np.random.default_rng(7)
    docs = _rand_docs(rng, 40, lo=0, hi=60)  # includes empty and tiny docs
    flat, lengths = _flat(docs)
    got = oph_from_flat(flat, lengths, 16, seed=42)
    for i, doc in enumerate(docs):
        want = _oph_reference(doc, 16, seed=42)
        np.testing.assert_array_equal(got[i], want, err_msg=f"doc {i}")


def test_batch_equals_per_doc():
    rng = np.random.default_rng(11)
    docs = _rand_docs(rng, 25)
    flat, lengths = _flat(docs)
    batched = oph_from_flat(flat, lengths, 128, seed=42)
    for i, doc in enumerate(docs):
        solo = oph_from_flat(doc, np.array([len(doc)]), 128, seed=42)[0]
        np.testing.assert_array_equal(batched[i], solo)


def test_empty_docs_get_sentinel():
    got = oph_from_flat(
        np.array([5], dtype=np.int64), np.array([0, 1, 0]), 8, seed=42
    )
    assert (got[0] == P).all() and (got[2] == P).all()
    assert not (got[1] == P).all()


def test_deterministic_and_seed_sensitive():
    rng = np.random.default_rng(3)
    docs = _rand_docs(rng, 10)
    flat, lengths = _flat(docs)
    a = oph_from_flat(flat, lengths, 64, seed=42)
    b = oph_from_flat(flat, lengths, 64, seed=42)
    c = oph_from_flat(flat, lengths, 64, seed=43)
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()


@pytest.mark.parametrize("target", [0.9, 0.7, 0.5])
def test_agreement_estimates_jaccard(target):
    """Mean per-row agreement over independent pairs tracks true Jaccard
    (unbiasedness of the densified estimator). 60 pairs x 128 rows gives a
    standard error of ~0.01; assert within 0.03."""
    ests, trues = [], []
    m = 150
    s = int(round(target * 2 * m / (1 + target)))
    for trial in range(60):
        g = np.random.default_rng(1000 + trial)
        a_set = g.integers(-(2**62), 2**62, size=m, dtype=np.int64)
        b_set = np.concatenate(
            [a_set[:s], g.integers(-(2**62), 2**62, size=m - s, dtype=np.int64)]
        )
        flat = np.concatenate([a_set, b_set])
        sig = oph_from_flat(flat, np.array([m, m]), 128, seed=42)
        ests.append(float((sig[0] == sig[1]).mean()))
        trues.append(s / (2 * m - s))
    assert abs(np.mean(ests) - np.mean(trues)) < 0.03


def test_oph_differs_from_classic_but_same_shape():
    rng = np.random.default_rng(5)
    docs = _rand_docs(rng, 8)
    flat, lengths = _flat(docs)
    oph = oph_from_flat(flat, lengths, 128, seed=42)
    classic = minhash_from_flat(flat, lengths, 128, seed=42)
    assert oph.shape == classic.shape and oph.dtype == classic.dtype
    assert (oph != classic).any()


def test_config_rejects_unknown_scheme():
    with pytest.raises(ValueError, match="minhash_scheme"):
        DedupConfig(minhash_scheme="simhash")


def test_pipeline_under_oph_clusters_planted_corpus(spark, pages, config, corpus):
    """Full engine with scheme='oph': the planted corpus must cluster
    EXACTLY (pair recall 1.0, zero false merges) — downstream banding,
    verification, and CC are scheme-agnostic, and the Jaccard verify gate
    keeps precision independent of the candidate generator."""
    import itertools

    from dedup_spark.plans.pipeline import run_dedup

    def pair_set(df, id_col, cl_col):
        out = set()
        for _, grp in df.groupby(cl_col):
            out |= set(itertools.combinations(sorted(grp[id_col]), 2))
        return out

    res = run_dedup(pages, config.with_(minhash_scheme="oph"))
    members = res.members.toPandas()
    gold = pair_set(corpus.golden_clusters, "url", "cluster_id")
    got = pair_set(members, "url", "cluster_id")
    assert got == gold


def test_minhash_signature_udf_honors_scheme(spark):
    """The public functions-API signature UDF must follow
    config.minhash_scheme like the engine's doc_signature_udf does."""
    from dedup_spark.functions.minhash import minhash_signature_udf

    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, [10, 20, 30, 40]), (2, [10, 20, 30, 41])],
        "id long, sh array<long>",
    )
    cfg_c = DedupConfig()
    cfg_o = DedupConfig(minhash_scheme="oph")
    sig_c = {
        r.id: r.s
        for r in df.select("id", minhash_signature_udf(cfg_c)("sh").alias("s")).collect()
    }
    sig_o = {
        r.id: r.s
        for r in df.select("id", minhash_signature_udf(cfg_o)("sh").alias("s")).collect()
    }
    flat = np.array([10, 20, 30, 40, 10, 20, 30, 41], dtype=np.int64)
    lengths = np.array([4, 4])
    np.testing.assert_array_equal(
        np.array([sig_c[1], sig_c[2]]),
        minhash_from_flat(flat, lengths, 128, 42),
    )
    np.testing.assert_array_equal(
        np.array([sig_o[1], sig_o[2]]),
        oph_from_flat(flat, lengths, 128, 42),
    )


def test_checkpoint_digest_includes_scheme():
    """A classic->oph flip must invalidate checkpointed features and pairs
    (silent stale reuse would emit wrong-scheme candidates)."""
    from dedup_spark.plans.incremental import (
        pairs_config_digest,
        signature_config_digest,
    )

    a, b = DedupConfig(), DedupConfig(minhash_scheme="oph")
    assert signature_config_digest(a) != signature_config_digest(b)
    assert pairs_config_digest(a) != pairs_config_digest(b)


def test_short_doc_agreement_still_tracks_jaccard():
    """Docs with far fewer shingles than num_perm lean almost entirely on
    densified rows (16 shingles -> ~112 borrowed bins); rotation
    densification must still give agreement ~ J so banding recall holds
    for short documents (measured band-hit 1.000 at J>=0.7 across
    150/40/16/8-shingle pairs, BENCH/oph_kernel.json)."""
    m, target = 16, 0.8
    s = int(round(target * 2 * m / (1 + target)))
    ests = []
    for trial in range(200):
        g = np.random.default_rng(4000 + trial)
        a = g.integers(-(2**62), 2**62, size=m, dtype=np.int64)
        b = np.concatenate(
            [a[:s], g.integers(-(2**62), 2**62, size=m - s, dtype=np.int64)]
        )
        sig = oph_from_flat(np.concatenate([a, b]), np.array([m, m]), 128, 42)
        ests.append(float((sig[0] == sig[1]).mean()))
    true_j = s / (2 * m - s)
    assert abs(np.mean(ests) - true_j) < 0.06
