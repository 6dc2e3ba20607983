"""MinHash signatures (N3) and LSH band keys (N4).

The permutation family is the classic universal hash h_i(x) = (a_i*x + b_i)
mod p over the Mersenne-31 field (p = 2^31 - 1). Shingle hashes are folded to
31 bits and coefficients range over the FULL field, so a_i*x + b_i < 2^62
stays strictly inside uint64 — exact arithmetic, no wrapping tricks — while
keeping the family min-wise independent (truncating the coefficient range
biases signature agreement far above true Jaccard; measured 0.89 vs 0.60).
Coefficients are drawn once from a seeded generator (config.minhash_seed)
so signatures are deterministic across sessions, retries, and speculative
task attempts (SURVEY.md §4.2 determinism pinning).

This is the one place Spark built-ins genuinely can't express the math at
acceptable cost (128 aggregates per row), so it's an Arrow-batched pandas UDF
with numpy segment-min (`np.minimum.reduceat`) — no per-row Python.

Band keys are pure JVM: xxhash64 over each r-row slice of the signature via
higher-order `transform`, mirroring the reference's cheap-signature-first
design (prefix hash before full hash,
/root/reference/src/find_duplicates_map_two.cpp:104-156).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from dedup_spark.config import DedupConfig, MERSENNE_31

_CHUNK_TARGET = 1 << 16  # flattened shingles per numpy chunk (~64 MB peak)


def _permutation_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_31, size=num_perm, dtype=np.uint64)
    return a, b


def fold31(x: np.ndarray) -> np.ndarray:
    """Fold int64 shingle hashes into the Mersenne-31 field [0, 2^31)."""
    u = x.astype(np.int64).view(np.uint64)
    return (u ^ (u >> np.uint64(33))) & np.uint64(0x7FFFFFFF)


def minhash_batch(
    shingle_arrays: pd.Series, num_perm: int, seed: int
) -> pd.Series:
    """Compute MinHash signatures for a batch of shingle-hash arrays.

    Pure function so unit tests can compare it against a brute-force oracle
    without a SparkSession.
    """
    a, b = _permutation_coeffs(num_perm, seed)
    p = np.uint64(MERSENNE_31)
    sentinel = np.int64(MERSENNE_31)

    lengths = shingle_arrays.map(lambda v: 0 if v is None else len(v)).to_numpy()
    out = np.empty((len(shingle_arrays), num_perm), dtype=np.int64)
    nonempty_idx = np.flatnonzero(lengths > 0)
    out[lengths == 0] = sentinel

    # process docs in chunks whose flattened shingle count stays bounded
    i = 0
    while i < len(nonempty_idx):
        j = i
        total = 0
        while j < len(nonempty_idx) and (total == 0 or total + lengths[nonempty_idx[j]] <= _CHUNK_TARGET):
            total += lengths[nonempty_idx[j]]
            j += 1
        idx = nonempty_idx[i:j]
        flat = np.concatenate(
            [np.asarray(shingle_arrays.iloc[k], dtype=np.int64) for k in idx]
        )
        # (T, P) exact universal hash over the folded 31-bit inputs
        x31 = fold31(flat)
        hv = (x31[:, None] * a[None, :] + b[None, :]) % p
        offsets = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(lengths[idx][:-1], out=offsets[1:])
        mins = np.minimum.reduceat(hv, offsets, axis=0)
        out[idx] = mins.astype(np.int64)
        i = j

    return pd.Series(list(out))


def minhash_signature_udf(config: DedupConfig):
    """pandas UDF: array<long> shingle hashes -> array<long> signature."""
    num_perm, seed = config.num_perm, config.minhash_seed

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(shingle_arrays: pd.Series) -> pd.Series:
        return minhash_batch(shingle_arrays, num_perm, seed)

    return _minhash


def band_keys(sig: Column | str, config: DedupConfig) -> Column:
    """array<long> of per-band xxhash64 keys, JVM-side.

    Band i (0-based) hashes signature rows [i*r, (i+1)*r). The band index is
    mixed into the key so identical row-slices in different bands never
    collide into one bucket.
    """
    s = F.col(sig) if isinstance(sig, str) else sig
    r = config.lsh_rows_per_band
    return F.transform(
        F.sequence(F.lit(0), F.lit(config.lsh_bands - 1)),
        lambda i: F.xxhash64(i, F.slice(s, i * r + 1, r)),
    )
