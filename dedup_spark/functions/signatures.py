"""Fused per-doc signature computation: shingle hashes + MinHash + SimHash in
ONE Arrow round trip.

Why fused: Catalyst higher-order lambda functions (transform/slice/concat_ws)
are interpreted per element — building k-word string shingles JVM-side
measured 28s for 30k docs where hashing the tokens takes 0.4s. So the JVM
does only `transform(split(normalize(text)), xxhash64)` (one cheap lambda),
and a single pandas UDF turns token-hash arrays into:

    shingle_hashes : distinct k-token rolling window hashes (array<long>)
    signature      : 128-perm MinHash over those hashes (array<long>)
    simhash        : 64-bit SimHash over those hashes (long)

Window hashes are the exact position-independent polynomial of
functions/rolling.py computed ONCE over the flattened batch (per-doc slices
of the global output — windows never cross doc boundaries because each doc's
valid range is [start, end-k]). Equality semantics match string shingles:
two k-token windows hash equal iff their tokens are equal (64-bit collisions
aside), so Jaccard/banding behavior is unchanged from the string formulation
while the hot path stays pure numpy.

Shingle semantics (same as functions/text.shingles): docs with 0 < n < k
tokens contribute one whole-doc window; empty docs contribute nothing.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType, StructField, StructType

from dedup_spark.config import DedupConfig
from dedup_spark.functions.minhash import minhash_batch
from dedup_spark.functions.rolling import window_hashes
from dedup_spark.functions.simhash import simhash_batch
from dedup_spark.functions.text import tokens

SIGNATURE_SCHEMA = StructType(
    [
        StructField("shingle_hashes", ArrayType(LongType())),
        StructField("signature", ArrayType(LongType())),
        StructField("simhash", LongType()),
        StructField("bands", ArrayType(LongType())),
    ]
)

# pipeline variant: the engine consumes only (shingle_hashes, simhash,
# bands) — the raw 128-long signature is folded into band keys INSIDE the
# UDF, so shipping it through Arrow (128 x 8 B per doc, ~1 GB per 10^6 docs)
# just to have Catalyst prune the struct field afterwards is pure serde
# waste. Contract queries that expose signatures (n3) use the full schema.
FEATURES_SCHEMA = StructType(
    [
        StructField("shingle_hashes", ArrayType(LongType())),
        StructField("simhash", LongType()),
        StructField("bands", ArrayType(LongType())),
    ]
)

# channel variant: pair GENERATION consumes only (simhash, bands) — the
# shingle arrays (~130 longs/doc, the bulk of the Arrow transfer and of the
# feats spill) are only needed for Jaccard verification, which touches the
# small candidate-involved subset of docs (measured 8% at 600k), so the
# engine computes them lazily for that subset via shingle_hashes_udf.
CHANNEL_SCHEMA = StructType(
    [
        StructField("simhash", LongType()),
        StructField("bands", ArrayType(LongType())),
    ]
)

# odd multiplier for the band-key polynomial mix (splitmix64 constant)
_BAND_MIX = np.uint64(0xBF58476D1CE4E5B9)


def band_keys_from_signatures(
    sigs: np.ndarray, bands: int, rows_per_band: int
) -> np.ndarray:
    """(n, num_perm) signatures -> (n, bands) int64 band keys, vectorized.

    Key = polynomial fold of the band's r signature rows seeded by the band
    index (so identical row-slices in different bands never share a bucket),
    finished with an xor-shift mix. Replaces the JVM `xxhash64(slice(...))`
    higher-order transform, whose interpreted per-band lambda measured ~20s
    flat for 600k docs regardless of core count.
    """
    n = sigs.shape[0]
    u = sigs.view(np.uint64).reshape(n, bands, rows_per_band)
    acc = np.full((n, bands), np.arange(1, bands + 1, dtype=np.uint64))
    for r in range(rows_per_band):
        acc *= _BAND_MIX
        acc ^= u[:, :, r]
    # finalize: xorshift avalanche
    acc ^= acc >> np.uint64(31)
    acc *= _BAND_MIX
    acc ^= acc >> np.uint64(29)
    return acc.view(np.int64)


def token_hashes(col: Column | str) -> Column:
    """xxhash64 per whitespace token of normalized text (JVM-side, cheap)."""
    return F.transform(tokens(col), lambda t: F.xxhash64(t))


def _shingle_flat(
    tok_arrays: pd.Series, k: int
) -> tuple[list[np.ndarray], np.ndarray, np.ndarray]:
    """(per-doc distinct window-hash arrays, lengths, flat concat).

    One global window_hashes pass over the flattened batch, then per-doc
    slicing + np.unique. Docs with 0 < n < k get a single whole-doc hash.
    """
    lengths = np.array(
        [0 if v is None else len(v) for v in tok_arrays], dtype=np.int64
    )
    total = int(lengths.sum())
    flat = np.empty(total, dtype=np.int64)
    pos = 0
    for v, ln in zip(tok_arrays, lengths):
        if ln:
            flat[pos : pos + ln] = np.asarray(v, dtype=np.int64)
            pos += ln
    global_wh = window_hashes(flat, k) if total >= k else np.empty(0, np.uint64)

    out: list[np.ndarray] = []
    start = 0
    for ln in lengths:
        if ln == 0:
            out.append(np.empty(0, dtype=np.int64))
        elif ln < k:
            wh = window_hashes(flat[start : start + ln], int(ln))
            out.append(np.unique(wh).view(np.int64))
        else:
            sl = global_wh[start : start + ln - k + 1]
            out.append(np.unique(sl).view(np.int64))
        start += ln
    sh_lengths = np.array([len(a) for a in out], dtype=np.int64)
    sh_flat = (
        np.concatenate(out) if len(out) else np.empty(0, dtype=np.int64)
    )
    return out, sh_lengths, sh_flat


def shingle_hash_arrays(tok_arrays: pd.Series, k: int) -> pd.Series:
    """Batch: token-hash arrays -> distinct k-window hash arrays (int64)."""
    out, _, _ = _shingle_flat(tok_arrays, k)
    return pd.Series(out)


def signature_batch(
    tok_arrays: pd.Series,
    k: int,
    num_perm: int,
    seed: int,
    bands: int,
    rows_per_band: int,
    include_signature: bool = True,
    include_shingles: bool = True,
    scheme: str = "classic",
) -> pd.DataFrame:
    """Pure-function batch used by the UDF (unit-testable without Spark).

    Stays numpy end-to-end: the per-doc arrays handed to Arrow are ndarray
    views, never Python lists — .tolist() on millions of values measured as
    the dominant cost of the whole signature stage.

    ``include_signature=False`` computes the MinHash signatures (bands need
    them) but leaves them out of the returned frame — the engine-facing
    shape (see FEATURES_SCHEMA). ``include_shingles=False`` additionally
    drops the shingle arrays (CHANNEL_SCHEMA): they are still computed
    (MinHash needs them) but never serialized back.
    """
    from dedup_spark.functions.minhash import minhash_from_flat, oph_from_flat
    from dedup_spark.functions.simhash import simhash_from_flat

    sh_list, sh_lengths, sh_flat = _shingle_flat(tok_arrays, k)
    mh = oph_from_flat if scheme == "oph" else minhash_from_flat
    sigs = mh(sh_flat, sh_lengths, num_perm, seed)
    sims = simhash_from_flat(sh_flat, sh_lengths)
    bnd = band_keys_from_signatures(sigs, bands, rows_per_band)
    cols = {}
    if include_shingles:
        cols["shingle_hashes"] = sh_list
    if include_signature:
        cols["signature"] = list(sigs)
    cols["simhash"] = sims
    cols["bands"] = list(bnd)
    return pd.DataFrame(cols)


def doc_signature_udf(
    config: DedupConfig,
    include_signature: bool = True,
    include_shingles: bool = True,
):
    """pandas UDF: array<long> token hashes -> struct([shingle_hashes,]
    [signature,] simhash, bands). One Python worker pass for all of them;
    pass include_signature=False on engine paths that never read the raw
    signature so 128 longs/doc stay out of the Arrow transfer, and
    include_shingles=False on pair-generation paths (verification recomputes
    shingles lazily for the candidate-involved subset)."""
    k, num_perm, seed = config.shingle_k, config.num_perm, config.minhash_seed
    b, r = config.lsh_bands, config.lsh_rows_per_band
    scheme = config.minhash_scheme
    if not include_shingles:
        schema = CHANNEL_SCHEMA
        if include_signature:
            raise ValueError("include_shingles=False implies engine shape")
    else:
        schema = SIGNATURE_SCHEMA if include_signature else FEATURES_SCHEMA

    @F.pandas_udf(schema)
    def _sig(tok: pd.Series) -> pd.DataFrame:
        return signature_batch(
            tok, k, num_perm, seed, b, r,
            include_signature=include_signature,
            include_shingles=include_shingles,
            scheme=scheme,
        )

    return _sig


def shingle_hashes_udf(config: DedupConfig):
    """pandas UDF: array<long> token hashes -> array<long> distinct k-window
    shingle hashes. The verification-side twin of doc_signature_udf's
    internal shingling (same window-hash polynomial, bit-identical arrays)
    that skips the MinHash/SimHash kernels entirely."""
    k = config.shingle_k

    @F.pandas_udf(ArrayType(LongType()))
    def _sh(tok: pd.Series) -> pd.Series:
        return shingle_hash_arrays(tok, k)

    return _sh
