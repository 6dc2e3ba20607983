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


def _permutation_coeffs(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, MERSENNE_31, size=num_perm, dtype=np.uint64)
    b = rng.integers(0, MERSENNE_31, size=num_perm, dtype=np.uint64)
    return a, b


def fold31(x: np.ndarray) -> np.ndarray:
    """Fold int64 shingle hashes into the Mersenne-31 field [0, 2^31)."""
    u = x.astype(np.int64).view(np.uint64)
    return (u ^ (u >> np.uint64(33))) & np.uint64(0x7FFFFFFF)


_TILE_SHINGLES = 1 << 15  # ~256 KB x 3 u64 buffers: L2-resident per worker


def minhash_from_flat(
    flat: np.ndarray, lengths: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """(n_docs, num_perm) int64 signatures from a flattened shingle-hash
    array + per-doc lengths. Zero-length docs get the sentinel signature.

    Iterates PERMUTATIONS inside doc TILES: each tile's shingles (~32k,
    doc-boundary-aligned) stay L2-resident across all 128 permutation
    passes, and each pass is a handful of in-place SIMD ops plus a
    contiguous reduceat — no (T, P) matrix, no large temporaries. The
    earlier (T, 128) layout collapsed under concurrent executor processes
    (bandwidth-bound, ~11x slower at 32 workers); the earlier untiled
    per-perm loop streamed the full batch from cache/DRAM 128 times.

    The (a*x + b) mod p step uses Mersenne shift-add reduction
    (two (v & p) + (v >> 31) folds, then one conditional subtract for the
    v in {p, p+1, p+2} tail) instead of np.mod: all SIMD-vectorizable
    passes. Bit-identical to np.mod (property-tested); measured 409 ->
    283 ms per 4096-doc batch (1.44x) — but ONLY when tiled (untiled, the
    extra passes cost full memory bandwidth and LOSE to libdivide's ~4.7
    ns/elem division; measured 3.27 vs 2.83 ms/pass at 600k elems).
    """
    p = np.uint64(MERSENNE_31)
    sh31 = np.uint64(31)
    sentinel = np.int64(MERSENNE_31)
    a, b = _permutation_coeffs(num_perm, seed)
    n = len(lengths)
    out = np.full((n, num_perm), sentinel, dtype=np.int64)
    if flat.size == 0:
        return out
    doc_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=doc_starts[1:])
    nonempty = np.flatnonzero(lengths > 0)
    if nonempty.size == 0:
        return out
    x31 = fold31(flat)
    starts_ne = doc_starts[nonempty]
    ends_ne = starts_ne + lengths[nonempty]
    cap = _TILE_SHINGLES * 2
    tmp = np.empty(cap, dtype=np.uint64)
    lo = np.empty(cap, dtype=np.uint64)
    mask = np.empty(cap, dtype=bool)
    i = 0
    while i < nonempty.size:
        # grow the tile to whole docs up to ~_TILE_SHINGLES shingles (a
        # single doc larger than the tile gets its own tile)
        j = int(np.searchsorted(ends_ne, starts_ne[i] + _TILE_SHINGLES, "right"))
        j = max(j, i + 1)
        s0, s1 = starts_ne[i], ends_ne[j - 1]
        xs = x31[s0:s1]
        offs = starts_ne[i:j] - s0
        m = int(s1 - s0)
        if m <= cap:
            tv, lv, mv = tmp[:m], lo[:m], mask[:m]
        else:
            tv = np.empty(m, np.uint64)
            lv = np.empty(m, np.uint64)
            mv = np.empty(m, bool)
        rows = nonempty[i:j]
        for pi in range(num_perm):
            np.multiply(xs, a[pi], out=tv)
            np.add(tv, b[pi], out=tv)
            # Mersenne-31 reduction of v < 2^62: two folds bring v <= p + 2
            np.bitwise_and(tv, p, out=lv)
            np.right_shift(tv, sh31, out=tv)
            np.add(tv, lv, out=tv)
            np.bitwise_and(tv, p, out=lv)
            np.right_shift(tv, sh31, out=tv)
            np.add(tv, lv, out=tv)
            np.greater_equal(tv, p, out=mv)
            tv[mv] -= p
            out[rows, pi] = np.minimum.reduceat(tv, offs).astype(np.int64)
        i = j
    return out


def oph_from_flat(
    flat: np.ndarray, lengths: np.ndarray, num_perm: int, seed: int
) -> np.ndarray:
    """Densified one-permutation MinHash (Shrivastava & Li, ICML 2014
    "Densifying One Permutation Hashing via Rotation" — the fixed-direction
    rotation scheme; the UAI 2014 "Improved Densification" follow-up halves
    variance for docs with far fewer shingles than num_perm via randomized
    borrow directions, a possible upgrade if short-doc banding recall ever
    matters; binning per Li, Owen & Zhang, NIPS 2012): (n_docs, num_perm)
    int64 signatures from the
    same flattened input as `minhash_from_flat`, at ~1 hash pass instead of
    num_perm permutation passes.

    Scheme: ONE Mersenne-31 universal hash h(x) (the classic family's
    arithmetic, independent coefficients); the value range [0, p) is split
    into num_perm equal bins (bin = h*num_perm >> 31); signature row j is
    the min h over the doc's shingles landing in bin j. Empty bins are
    densified by circular borrow from the NEXT filled bin: sig[j] =
    sig[j+t] + t*p for the smallest t with bin j+t (mod num_perm) filled —
    the +t*p offset keeps (borrow distance, source value) collisions exact,
    so two docs agree on a densified row iff they borrowed the same value
    from the same distance (the paper's estimator). Pr[sig_A[j] ==
    sig_B[j]] = J(A, B) per row, unbiased, so LSH banding downstream is
    scheme-agnostic. Zero-shingle docs get the classic sentinel signature.

    Kernel shape (one pass, no per-perm loop): hash + bin are streaming
    SIMD ops; the per-(doc, bin) min rides ONE np.sort of
    (doc*num_perm + bin) << 31 | h packed keys — after an ascending sort,
    the first element of each key group IS the min, no reduceat needed.
    Densification is vectorized over the (n, num_perm) matrix via a
    reversed minimum.accumulate next-filled-index scan on the horizontally
    doubled matrix. Measured ~2.7x faster than the tiled classic kernel at
    4096-doc/650k-shingle batches; the gap widens with num_perm.
    """
    p = np.uint64(MERSENNE_31)
    sh31 = np.uint64(31)
    sentinel = np.int64(MERSENNE_31)
    n = len(lengths)
    out = np.full((n, num_perm), sentinel, dtype=np.int64)
    if flat.size == 0 or n == 0:
        return out
    # independent coefficient draw (offset seed: perm 0 of the classic
    # family must not be reused, the schemes are distinct estimators)
    a, b = _permutation_coeffs(1, seed + 1_000_003)
    v = fold31(flat) * a[0] + b[0]
    lo = v & p
    v >>= sh31
    v += lo
    lo = v & p
    v >>= sh31
    v += lo
    v[v >= p] -= p  # h < p, exact Mersenne reduction (same as classic)
    bins = (v * np.uint64(num_perm)) >> sh31
    doc_idx = np.repeat(np.arange(n, dtype=np.uint64), lengths)
    # pack (doc, bin) key above the 31-bit hash value: one sort, group
    # minima are the first element per key
    packed = ((doc_idx * np.uint64(num_perm) + bins) << sh31) | v
    packed = np.sort(packed)
    keys = packed >> sh31
    first = np.empty(len(packed), dtype=bool)
    first[0] = True
    np.not_equal(keys[1:], keys[:-1], out=first[1:])
    sel = packed[first]
    empty = np.uint64(0xFFFFFFFFFFFFFFFF)
    m = np.full(n * num_perm, empty, dtype=np.uint64)
    m[(sel >> sh31).astype(np.int64)] = sel & p
    m = m.reshape(n, num_perm)
    filled = m != empty
    any_filled = filled.any(axis=1)
    # next-filled-index per row over the doubled matrix (circular borrow):
    # reversed running-min of (own index if filled else +inf)
    big = np.int32(1 << 30)
    cols2 = np.arange(2 * num_perm, dtype=np.int32)
    f2 = np.concatenate([filled, filled], axis=1)
    idx2 = np.where(f2, cols2, big)
    nn = np.minimum.accumulate(idx2[:, ::-1], axis=1)[:, ::-1][:, :num_perm]
    nn_safe = np.where(nn >= big, np.int32(0), nn)  # all-empty rows: any index
    t = (nn_safe - np.arange(num_perm, dtype=np.int32)).astype(np.uint64)
    src = np.take_along_axis(
        np.concatenate([m, m], axis=1), nn_safe.astype(np.int64), axis=1
    )
    res = np.where(filled, m, src + t * p).astype(np.int64)
    res[~any_filled] = sentinel
    return res


def minhash_batch(
    shingle_arrays: pd.Series, num_perm: int, seed: int
) -> pd.Series:
    """Compute MinHash signatures for a batch of shingle-hash arrays.

    Pure function so unit tests can compare it against a brute-force oracle
    without a SparkSession.
    """
    arrs = [
        np.empty(0, dtype=np.int64) if v is None else np.asarray(v, dtype=np.int64)
        for v in shingle_arrays
    ]
    lengths = np.array([len(v) for v in arrs], dtype=np.int64)
    flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    out = minhash_from_flat(flat, lengths, num_perm, seed)
    return pd.Series(list(out))


def minhash_signature_udf(config: DedupConfig):
    """pandas UDF: array<long> shingle hashes -> array<long> signature.
    Honors config.minhash_scheme like doc_signature_udf does."""
    num_perm, seed = config.num_perm, config.minhash_seed
    kernel = oph_from_flat if config.minhash_scheme == "oph" else minhash_from_flat

    @F.pandas_udf(ArrayType(LongType()))
    def _minhash(shingle_arrays: pd.Series) -> pd.Series:
        arrs = [
            np.empty(0, dtype=np.int64)
            if v is None
            else np.asarray(v, dtype=np.int64)
            for v in shingle_arrays
        ]
        lengths = np.array([len(v) for v in arrs], dtype=np.int64)
        flat = (
            np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
        )
        return pd.Series(list(kernel(flat, lengths, num_perm, seed)))

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
