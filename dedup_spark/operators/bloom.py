"""Bloom-sidecar incremental exact dedup — delta-vs-base at sidecar cost.

The reference's exact channel answers "which files share content" by
hash-grouping the whole corpus (/root/reference/src/dedup.cpp group-by-hash
stages); its incremental question — "which of TODAY's pages are new vs the
standing corpus" — would re-join every batch against the full history. At
10^12 standing documents that join shuffles the history every day. The
production pattern instead publishes a compact **sharded Bloom sidecar** of
the corpus content hashes once, and each incoming batch:

1. probes the sidecar (no false negatives: a Bloom miss is DEFINITIVELY a
   new document — zero joins for the typical ~90%+ of a crawl batch),
2. pays an exact verify join ONLY for the Bloom hits (true dups + the
   bounded false-positive fraction), broadcast from the batch side so the
   standing corpus is scanned, never shuffled.

Because every Bloom hit is verified on full text equality, the composed
result is EXACTLY the anti-join semantics — checkable by any SQL engine —
while the data moved is ~8 bytes/doc for the sidecar build and probe plus
the hit subset. Sidecar sizing: with k=7 hash functions, ~10 bits/key gives
~1% false positives; bits_per_slice * n_slices total bits are spread over
`n_slices` independent slices so the build is one hash-partitioned
aggregation (each slice built by one task, no bitmap merging) and a probe
batch shuffles by slice, 8-byte hashes only.

Design (Spark-first): hashes and slice routing are JVM `xxhash64`/`pmod`
expressions; only the bit-set/bit-test kernels are Python, Arrow-batched
via `applyInPandas` (build) and cogrouped `applyInPandas` (probe) — one
bitmap per task, vectorized numpy bit ops, never per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType, StructField, StructType

__all__ = ["bloom_sidecar", "bloom_probe", "bloom_union", "bloom_delta_new"]

# splitmix64 finalizer constants — the build and probe sides must mix
# identically, but nothing outside this module depends on these values.
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_M2 = np.uint64(0x94D049BB133111EB)


def _splitmix(x: np.ndarray) -> np.ndarray:
    x = (x + _SM_GAMMA).astype(np.uint64)
    x ^= x >> np.uint64(30)
    x *= _SM_M1
    x ^= x >> np.uint64(27)
    x *= _SM_M2
    x ^= x >> np.uint64(31)
    return x


def _bit_positions(h: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(k, n) bit indices per key via double hashing (Kirsch-Mitzenmacher):
    pos_j = (h1 + j*h2) mod n_bits, h2 forced odd so the stride is coprime
    with the power-of-two slice size and the k probes never collapse."""
    u = h.astype(np.int64).view(np.uint64)
    h1 = _splitmix(u)
    h2 = _splitmix(u ^ _SM_M1) | np.uint64(1)
    j = np.arange(k, dtype=np.uint64)[:, None]
    mask = np.uint64(n_bits - 1)
    return ((h1[None, :] + j * h2[None, :]) & mask).astype(np.int64)


def _validate(n_slices: int, bits_per_slice: int, k: int) -> None:
    if n_slices <= 0:
        raise ValueError("n_slices must be positive")
    if bits_per_slice <= 0 or bits_per_slice & (bits_per_slice - 1):
        raise ValueError("bits_per_slice must be a positive power of two")
    if bits_per_slice % 8:
        raise ValueError("bits_per_slice must be a multiple of 8")
    if k <= 0:
        raise ValueError("k must be positive")


def bloom_sidecar(
    hashes: DataFrame,
    *,
    n_slices: int = 64,
    bits_per_slice: int = 1 << 16,
    k: int = 7,
    hash_col: str = "h",
) -> DataFrame:
    """Build the sharded sidecar: (slice long, bitmap binary), one row per
    slice that holds at least one key. Slice = pmod(h, n_slices) routes in
    the JVM; each slice's bitmap is set by ONE task over its Arrow batch —
    no bitmap union step, so the build is a single hash-partitioned pass.
    """
    _validate(n_slices, bits_per_slice, k)
    n_bytes = bits_per_slice // 8

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pos = _bit_positions(pdf["h"].to_numpy(np.int64), k, bits_per_slice)
        bitmap = np.zeros(n_bytes, dtype=np.uint8)
        flat = pos.ravel()
        np.bitwise_or.at(bitmap, flat >> 3, np.uint8(1) << (flat & 7).astype(np.uint8))
        return pd.DataFrame(
            {"slice": [int(pdf["_slice"].iloc[0])], "bitmap": [bitmap.tobytes()]}
        )

    return (
        hashes.select(
            F.col(hash_col).alias("h"),
            F.pmod(F.col(hash_col), F.lit(n_slices)).alias("_slice"),
        )
        .groupBy("_slice")
        .applyInPandas(build, "slice long, bitmap binary")
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Fold two sidecars of IDENTICAL geometry into one: slice-wise bitmap
    OR (Bloom filters are union-homomorphic). The standing-corpus daily
    cycle never rebuilds over the history — build a sidecar of just the
    accepted batch and union it in: union(build(A), build(B)) ==
    build(A ∪ B) bit-for-bit (pinned in test_bloom). The sidecar table is
    O(slices) rows, so this is driver-trivial work kept as a DataFrame op
    for composability."""

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        maps = [np.frombuffer(buf, dtype=np.uint8) for buf in pdf["bitmap"]]
        out = maps[0].copy()
        for x in maps[1:]:
            if len(x) != len(out):
                raise ValueError("bloom_union: geometry mismatch between sidecars")
            out |= x
        return pd.DataFrame(
            {"slice": [int(pdf["slice"].iloc[0])], "bitmap": [out.tobytes()]}
        )

    return (
        a.select("slice", "bitmap")
        .unionByName(b.select("slice", "bitmap"))
        .groupBy("slice")
        .applyInPandas(merge, "slice long, bitmap binary")
    )


def bloom_probe(
    delta: DataFrame,
    sidecar: DataFrame,
    *,
    n_slices: int = 64,
    bits_per_slice: int = 1 << 16,
    k: int = 7,
    hash_col: str = "h",
) -> DataFrame:
    """delta (any columns + `hash_col`) -> same columns + `maybe` boolean.

    maybe=False is a Bloom guarantee of absence from the sidecar's key set;
    maybe=True needs exact verification. Cogrouped by slice so each task
    tests its whole Arrow batch against ONE bitmap (a slice with no sidecar
    row holds no keys: everything in it is definitively absent). The
    sidecar geometry (n_slices/bits_per_slice/k) must match the build call.
    """
    _validate(n_slices, bits_per_slice, k)
    out_schema = StructType(
        delta.schema.fields + [StructField("maybe", BooleanType(), False)]
    )
    cols = list(delta.columns)

    def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        out = left[cols]
        if left.empty or right.empty:
            return out.assign(maybe=np.zeros(len(out), dtype=bool))
        if len(right) != 1:
            # >1 bitmap per slice means two sidecars were unioned with a
            # plain table union instead of bloom_union; testing against
            # only one would yield Bloom FALSE NEGATIVES — fail loud.
            raise ValueError(
                f"bloom_probe: slice {int(right['slice'].iloc[0])} has "
                f"{len(right)} sidecar rows (expected 1); merge sidecars "
                "with bloom_union, not a table union"
            )
        bitmap = np.frombuffer(right["bitmap"].iloc[0], dtype=np.uint8)
        pos = _bit_positions(out[hash_col].to_numpy(np.int64), k, bits_per_slice)
        hit = (bitmap[pos >> 3] & (np.uint8(1) << (pos & 7).astype(np.uint8))) != 0
        return out.assign(maybe=hit.all(axis=0))

    keyed = delta.withColumn("_slice", F.pmod(F.col(hash_col), F.lit(n_slices)))
    return (
        keyed.groupBy("_slice")
        .cogroup(sidecar.groupBy(F.col("slice").alias("_slice")))
        .applyInPandas(probe, out_schema)
    )


def bloom_delta_new(
    base: DataFrame,
    delta: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_slices: int = 64,
    bits_per_slice: int = 1 << 16,
    k: int = 7,
    materialize=None,
) -> DataFrame:
    """Exact incremental dedup: one row per delta doc — (id_col, status
    'new'|'dup', canonical_{id_col} = smallest base id with identical text,
    null for new docs). Equal to the text-equality anti-join, computed at
    sidecar cost (see module docstring).

    Null text hashes as '' on both sides and two null/'' texts are equal —
    the scan/ingest convention. `materialize` (e.g. a plans.pipeline.spill
    closure) is applied to the probe output, which has three consumers; the
    default persists it (driver-SF friendly; scale jobs pass a spill).

    Plan shape: base is scanned twice (8-byte hashes for the build; the
    verify join streams it against a BROADCAST of the hit subset) and
    never shuffled; delta shuffles 8-byte (id, hash) rows by slice once.
    The broadcast is sized by hits ~= (dup_rate + fpr) * |delta| — size
    bits_per_slice so fpr stays ~1% (about 10 bits per standing doc).
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    h = F.xxhash64(txt)
    base_h = base.select(
        F.col(id_col).alias("_base_id"), txt.alias("_btext"), h.alias("h")
    )
    delta_h = delta.select(F.col(id_col), txt.alias("_dtext"), h.alias("h"))

    sidecar = bloom_sidecar(
        base_h.select("h"),
        n_slices=n_slices,
        bits_per_slice=bits_per_slice,
        k=k,
    )
    probed = bloom_probe(
        delta_h.select(id_col, "h"),
        sidecar,
        n_slices=n_slices,
        bits_per_slice=bits_per_slice,
        k=k,
    )
    probed = materialize(probed) if materialize else probed.persist()

    canonical_col = f"canonical_{id_col}"
    news = probed.filter(~F.col("maybe")).select(
        id_col,
        F.lit("new").alias("status"),
        F.lit(None).cast(delta_h.schema[id_col].dataType).alias(canonical_col),
    )
    hits = probed.filter(F.col("maybe")).select(id_col)
    # hit subset -> texts (broadcast: hits are the small verified fraction,
    # so neither the delta re-scan nor the base scan ever shuffles), then
    # the verify join streams the base scan against the broadcast side
    hit_docs = F.broadcast(delta_h.join(F.broadcast(hits), id_col))
    verified = (
        hit_docs.join(base_h, "h")
        .filter(F.col("_dtext") == F.col("_btext"))
        .groupBy(id_col)
        .agg(F.min("_base_id").alias(canonical_col))
    )
    resolved = hits.join(F.broadcast(verified), id_col, "left").select(
        id_col,
        F.when(F.col(canonical_col).isNull(), F.lit("new"))
        .otherwise(F.lit("dup"))
        .alias("status"),
        canonical_col,
    )
    return news.unionByName(resolved)
