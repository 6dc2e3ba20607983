"""SimHash-64 (N5) with Hamming-ball probing keys.

SimHash: per bit position, sum +1/-1 votes across the doc's shingle hashes;
the fingerprint bit is 1 iff the vote is positive. Near-identical shingle
sets differ in few bits, so near-dups sit within a small Hamming distance.

Probing (pigeonhole): split the 64-bit key into (hamming_max + 1) equal-width
blocks — any pair within Hamming distance <= hamming_max agrees on at least
one whole block, so an equi-join on (block_idx, block_value) finds every such
pair; `bit_count(xor)` then filters to the exact ball. Both the block split
and the distance filter are JVM built-ins; only the bit-voting is a pandas UDF
(numpy popcount-style matrix, Arrow-batched).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from dedup_spark.config import DedupConfig


def simhash_from_flat(flat: np.ndarray, lengths: np.ndarray) -> np.ndarray:
    """(n_docs,) int64 SimHash-64 from flattened shingle hashes + lengths.

    Per-bit streaming: for each of the 64 bit positions, one shift-and pass
    over the flat (T,) vector and one contiguous reduceat-sum of 0/1 counts;
    the fingerprint bit is 1 iff ones > len/2 (i.e. the ±1 vote is positive).
    Same cache-friendly shape as minhash_from_flat — no (T, 64) vote matrix.
    Zero-length docs hash to 0.
    """
    n = len(lengths)
    out_bits = np.zeros(n, dtype=np.uint64)
    if flat.size == 0:
        return out_bits.view(np.int64)
    doc_starts = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=doc_starts[1:])
    nonempty = np.flatnonzero(lengths > 0)
    if nonempty.size == 0:
        return out_bits.view(np.int64)
    offsets = doc_starts[nonempty]
    u = flat.view(np.uint64)
    half = lengths[nonempty].astype(np.int64)  # ones*2 > len <=> vote > 0
    tmp = np.empty(u.size, dtype=np.int64)
    one = np.uint64(1)
    for bit in range(64):
        np.right_shift(u, np.uint64(bit), out=tmp.view(np.uint64))
        np.bitwise_and(tmp.view(np.uint64), one, out=tmp.view(np.uint64))
        ones = np.add.reduceat(tmp, offsets)
        out_bits[nonempty] |= ((ones * 2 > half).astype(np.uint64)) << np.uint64(bit)
    return out_bits.view(np.int64)


def simhash_batch(shingle_arrays: pd.Series, bits: int = 64) -> pd.Series:
    """64-bit SimHash per doc from its shingle-hash array (pure function)."""
    assert bits == 64
    arrs = [
        np.empty(0, dtype=np.int64) if v is None else np.asarray(v, dtype=np.int64)
        for v in shingle_arrays
    ]
    lengths = np.array([len(v) for v in arrs], dtype=np.int64)
    flat = np.concatenate(arrs) if arrs else np.empty(0, dtype=np.int64)
    return pd.Series(simhash_from_flat(flat, lengths))


def simhash_udf(config: DedupConfig):
    bits = config.simhash_bits

    @F.pandas_udf(LongType())
    def _simhash(shingle_arrays: pd.Series) -> pd.Series:
        return simhash_batch(shingle_arrays, bits)

    return _simhash


def simhash_blocks(sim: Column | str, config: DedupConfig) -> Column:
    """array<long> of probe-key values for Hamming probing (JVM-side).

    Multi-index probing (Manku/Jain/Das Sarma, WWW 2007): the 64-bit
    fingerprint splits into m = hamming_max + key_blocks blocks; each probe
    key concatenates one c = key_blocks block combination, giving C(m, c)
    keys. Any pair within Hamming distance <= hamming_max corrupts at most
    hamming_max blocks, so >= c blocks stay clean and at least one combined
    key matches — the pigeonhole guarantee, generalized.

    key_blocks=1 degenerates to the classic one-key-per-block scheme
    (m = hamming_max + 1 blocks of 64 // m bits). Larger key_blocks buys
    exponentially finer buckets (key width ~ c * 64/m bits) for C(m, c)
    probe rows per doc — the knob that keeps web-scale block buckets inside
    the exhaustive pair-generation tiers. All ops are bit shifts/masks in
    whole-stage codegen; the array position is the probe-table index
    (posexplode's band_idx).
    """
    from itertools import combinations

    c = F.col(sim) if isinstance(sim, str) else sim
    kb = config.simhash_key_blocks
    n_blocks = config.simhash_hamming_max + kb
    width = 64 // n_blocks
    block_vals = []
    widths = []
    for i in range(n_blocks):
        lo = i * width
        w = 64 - lo if i == n_blocks - 1 else width
        mask = (1 << w) - 1
        block_vals.append(F.shiftrightunsigned(c, lo).bitwiseAND(F.lit(mask)))
        widths.append(w)
    keys = []
    for combo in combinations(range(n_blocks), kb):
        key = block_vals[combo[0]]
        shift = widths[combo[0]]
        for b in combo[1:]:
            key = key.bitwiseOR(F.shiftleft(block_vals[b], shift))
            shift += widths[b]
        keys.append(key)
    return F.array(*keys)


def hamming_distance(a: Column, b: Column) -> Column:
    """bit_count(a XOR b) — JVM built-in popcount."""
    return F.bit_count(a.bitwiseXOR(b))
