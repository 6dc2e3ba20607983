"""Multi-index SimHash probing (functions/simhash.simhash_blocks).

The Manku-style generalization keys buckets on c-block combinations so
web-scale block buckets shrink ~2^16x while the pigeonhole guarantee holds:
any pair within hamming_max shares at least one probe key. key_blocks=1 must
degenerate to the classic one-key-per-block scheme exactly (round-2
behavior), and the candidate set after the Hamming cut must be IDENTICAL
for any key_blocks (only bucket granularity changes)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig
from dedup_spark.functions.simhash import simhash_blocks


def _probe_keys_py(v: int, hamming_max: int, key_blocks: int) -> set:
    """Pure-python reference of the probe-key construction."""
    from itertools import combinations

    m = hamming_max + key_blocks
    width = 64 // m
    vals, widths = [], []
    for i in range(m):
        lo = i * width
        w = 64 - lo if i == m - 1 else width
        vals.append((v >> lo) & ((1 << w) - 1))
        widths.append(w)
    keys = set()
    for idx, combo in enumerate(combinations(range(m), key_blocks)):
        key, shift = 0, 0
        for b in combo:
            key |= vals[b] << shift
            shift += widths[b]
        keys.add((idx, key))
    return keys


def _spark_keys(spark, v: int, cfg: DedupConfig) -> set:
    sv = v - (1 << 64) if v >= (1 << 63) else v
    row = (
        spark.createDataFrame([(sv,)], "simhash long")
        .select(F.posexplode(simhash_blocks("simhash", cfg)).alias("i", "k"))
        .collect()
    )
    return {(r.i, r.k & ((1 << 64) - 1)) for r in row}


def test_key_blocks_1_degenerates_to_classic_blocks(spark):
    """kb=1 must produce exactly the round-2 4x16-bit block values."""
    cfg = DedupConfig()  # hamming_max=3, key_blocks=1
    v = 0x0123_4567_89AB_CDEF
    got = _spark_keys(spark, v, cfg)
    want = {(i, (v >> (16 * i)) & 0xFFFF) for i in range(4)}
    assert got == want


@pytest.mark.parametrize("kb", [1, 2, 3])
def test_spark_keys_match_python_reference(spark, kb):
    cfg = DedupConfig(simhash_key_blocks=kb)
    rng = random.Random(7)
    for _ in range(5):
        v = rng.getrandbits(64)
        assert _spark_keys(spark, v, cfg) == _probe_keys_py(v, 3, kb)


@pytest.mark.parametrize("kb", [1, 2, 3])
def test_pigeonhole_guarantee(kb):
    """Any pair within hamming_max shares >= 1 probe key (pure-python check
    over random fingerprints and random <=3-bit corruptions)."""
    rng = random.Random(42)
    for _ in range(200):
        v = rng.getrandbits(64)
        nbits = rng.randint(0, 3)
        u = v
        for pos in rng.sample(range(64), nbits):
            u ^= 1 << pos
        assert _probe_keys_py(v, 3, kb) & _probe_keys_py(u, 3, kb), (
            f"kb={kb}: no shared key for hamming={nbits}"
        )


def test_candidate_pairs_identical_across_key_blocks(spark):
    """The channel's emitted pair set after the Hamming cut is invariant to
    the probing granularity (kb=1 vs kb=3) on an exhaustively-enumerable
    corpus: multi-index changes WHERE pairs are found, never WHICH."""
    from dedup_spark.plans.pipeline import simhash_candidate_pairs

    rng = random.Random(3)
    sims = []
    base = rng.getrandbits(64)
    for i in range(60):
        if i % 3 == 0:
            v = base
            for pos in rng.sample(range(64), rng.randint(0, 3)):
                v ^= 1 << pos
        else:
            v = rng.getrandbits(64)
        sims.append((i, v - (1 << 64) if v >= (1 << 63) else v))
    df = spark.createDataFrame(sims, "id long, simhash long")
    got = {}
    for kb in (1, 3):
        cfg = DedupConfig(simhash_key_blocks=kb)
        got[kb] = {
            (r.id_a, r.id_b)
            for r in simhash_candidate_pairs(df, cfg).collect()
        }
    assert got[1] == got[3]
    assert got[1]  # non-vacuous: the planted cluster produces pairs
