"""Unit tests: MinHash/SimHash math vs brute-force oracles (no SparkSession)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from dedup_spark.config import MERSENNE_31
from dedup_spark.functions.minhash import _permutation_coeffs, minhash_batch
from dedup_spark.functions.simhash import simhash_batch


def _brute_minhash(shingles: list[int], num_perm: int, seed: int) -> list[int]:
    a, b = _permutation_coeffs(num_perm, seed)
    p = MERSENNE_31
    out = []
    for j in range(num_perm):
        best = None
        for x in shingles:
            xu = int(x) & 0xFFFFFFFFFFFFFFFF
            x31 = (xu ^ (xu >> 33)) & 0x7FFFFFFF
            hv = (int(a[j]) * x31 + int(b[j])) % p
            best = hv if best is None else min(best, hv)
        out.append(best)
    return out


def test_minhash_matches_bruteforce():
    rng = np.random.default_rng(7)
    docs = [list(rng.integers(-(2**62), 2**62, size=n)) for n in (1, 3, 50, 400)]
    got = minhash_batch(pd.Series(docs), 16, seed=42)
    for i, d in enumerate(docs):
        assert list(got.iloc[i]) == _brute_minhash(d, 16, 42), f"doc {i}"


def test_minhash_deterministic_and_chunked():
    rng = np.random.default_rng(3)
    # force multiple chunks: 300 docs x 500 shingles > chunk target 65536
    docs = [list(rng.integers(-(2**62), 2**62, size=500)) for _ in range(300)]
    a = minhash_batch(pd.Series(docs), 32, seed=42)
    b = minhash_batch(pd.Series(docs), 32, seed=42)
    for x, y in zip(a, b):
        assert list(x) == list(y)
    # chunk boundaries must not affect values: compare doc 250 alone
    solo = minhash_batch(pd.Series([docs[250]]), 32, seed=42)
    assert list(solo.iloc[0]) == list(a.iloc[250])


def test_minhash_similarity_estimate():
    """Signature agreement rate ~ Jaccard (the property LSH relies on)."""
    rng = np.random.default_rng(11)
    base = list(rng.integers(0, 2**62, size=200))
    other = base[:150] + list(rng.integers(0, 2**62, size=50))
    true_j = 150 / 250
    sigs = minhash_batch(pd.Series([base, other]), 128, seed=42)
    agree = np.mean(np.array(sigs.iloc[0]) == np.array(sigs.iloc[1]))
    assert abs(agree - true_j) < 0.15


def test_minhash_empty_sentinel():
    got = minhash_batch(pd.Series([[], None, [5]]), 8, seed=42)
    assert list(got.iloc[0]) == [MERSENNE_31] * 8
    assert list(got.iloc[1]) == [MERSENNE_31] * 8
    assert all(v < MERSENNE_31 for v in got.iloc[2])


def test_simhash_properties():
    rng = np.random.default_rng(5)
    base = list(rng.integers(-(2**62), 2**62, size=300))
    near = base[:285] + list(rng.integers(-(2**62), 2**62, size=15))
    far = list(rng.integers(-(2**62), 2**62, size=300))
    s = simhash_batch(pd.Series([base, base.copy(), near, far]))
    h = lambda a, b: bin((int(a) ^ int(b)) & (2**64 - 1)).count("1")
    assert s.iloc[0] == s.iloc[1]  # identical sets -> identical simhash
    assert h(s.iloc[0], s.iloc[2]) < h(s.iloc[0], s.iloc[3])
    assert h(s.iloc[0], s.iloc[2]) <= 12
    assert h(s.iloc[0], s.iloc[3]) >= 20


def test_simhash_order_invariant():
    rng = np.random.default_rng(9)
    base = list(rng.integers(-(2**62), 2**62, size=100))
    perm = list(np.array(base)[rng.permutation(100)])
    s = simhash_batch(pd.Series([base, perm]))
    assert s.iloc[0] == s.iloc[1]


def test_minhash_tiled_mersenne_equals_npmod_reference():
    """The tiled Mersenne shift-add reduction must be bit-identical to a
    direct (a*x + b) % p implementation — including docs LARGER than the
    tile, empty docs between tiles, and tile-boundary docs."""
    import numpy as np

    from dedup_spark.config import MERSENNE_31
    from dedup_spark.functions.minhash import (
        _TILE_SHINGLES,
        _permutation_coeffs,
        fold31,
        minhash_from_flat,
    )

    rng = np.random.default_rng(11)
    lengths = [0, 3, 170, 0, _TILE_SHINGLES + 257, 1, 40, 0]
    lengths = np.array(lengths, dtype=np.int64)
    flat = rng.integers(-(2**62), 2**62, size=int(lengths.sum()), dtype=np.int64)

    got = minhash_from_flat(flat, lengths, 16, 42)

    a, b = _permutation_coeffs(16, 42)
    p = np.uint64(MERSENNE_31)
    x31 = fold31(flat)
    start = 0
    for d, ln in enumerate(lengths):
        for pi in range(16):
            if ln == 0:
                assert got[d, pi] == MERSENNE_31  # sentinel
            else:
                xs = x31[start : start + ln]
                want = int(((xs * a[pi] + b[pi]) % p).min())
                assert got[d, pi] == want, (d, pi)
        start += ln
