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

_CHUNK_TARGET = 1 << 16


def simhash_batch(shingle_arrays: pd.Series, bits: int = 64) -> pd.Series:
    """64-bit SimHash per doc from its shingle-hash array (pure function)."""
    assert bits == 64
    shifts = np.arange(64, dtype=np.uint64)
    lengths = shingle_arrays.map(lambda v: 0 if v is None else len(v)).to_numpy()
    out = np.zeros(len(shingle_arrays), dtype=np.int64)
    nonempty_idx = np.flatnonzero(lengths > 0)

    i = 0
    while i < len(nonempty_idx):
        j = i
        total = 0
        while j < len(nonempty_idx) and (
            total == 0 or total + lengths[nonempty_idx[j]] <= _CHUNK_TARGET
        ):
            total += lengths[nonempty_idx[j]]
            j += 1
        idx = nonempty_idx[i:j]
        flat = np.concatenate(
            [np.asarray(shingle_arrays.iloc[k], dtype=np.int64) for k in idx]
        ).view(np.uint64)
        # (T, 64) bit matrix -> ±1 votes
        votes = (((flat[:, None] >> shifts[None, :]) & np.uint64(1)).astype(np.int32) * 2 - 1)
        offsets = np.zeros(len(idx), dtype=np.int64)
        np.cumsum(lengths[idx][:-1], out=offsets[1:])
        sums = np.add.reduceat(votes, offsets, axis=0)
        fp_bits = (sums > 0).astype(np.uint64)
        fp = np.zeros(len(idx), dtype=np.uint64)
        for bpos in range(64):
            fp |= fp_bits[:, bpos] << np.uint64(bpos)
        out[idx] = fp.view(np.int64)
        i = j

    return pd.Series(out)


def simhash_udf(config: DedupConfig):
    bits = config.simhash_bits

    @F.pandas_udf(LongType())
    def _simhash(shingle_arrays: pd.Series) -> pd.Series:
        return simhash_batch(shingle_arrays, bits)

    return _simhash


def simhash_blocks(sim: Column | str, config: DedupConfig) -> Column:
    """array<long> of block values for Hamming probing (JVM-side).

    n_blocks = hamming_max + 1 blocks of 64 // n_blocks bits each (the last
    block absorbs the remainder bits).
    """
    c = F.col(sim) if isinstance(sim, str) else sim
    n_blocks = config.simhash_hamming_max + 1
    width = 64 // n_blocks
    blocks = []
    for i in range(n_blocks):
        lo = i * width
        w = 64 - lo if i == n_blocks - 1 else width
        mask = (1 << w) - 1
        blocks.append(
            F.shiftrightunsigned(c, lo).bitwiseAND(F.lit(mask))
        )
    return F.array(*blocks)


def hamming_distance(a: Column, b: Column) -> Column:
    """bit_count(a XOR b) — JVM built-in popcount."""
    return F.bit_count(a.bitwiseXOR(b))
