"""Suffix-array channel (N6): pairs of documents sharing a long repeated
token run.

Generalizes the reference's cheap-signature-then-verify shape
(/root/reference/src/find_duplicates_map_two.cpp:104-156 — prefix hash prunes,
whole-file hash confirms) to substring similarity:

  stage 1 (prune)  : winnowed rolling-hash fingerprints per doc (vectorized
                     pandas UDF, functions/rolling.py). Guarantee: any pair
                     sharing a run of >= min_run_tokens shares a fingerprint,
                     so channel recall is 1.0 up to 64-bit hash collisions.
  stage 2 (pairs)  : fingerprint-bucket co-membership -> candidate pairs,
                     reusing the LSH bucket pair generator (same skew caps).
  stage 3 (verify) : exact longest common token run per pair via suffix
                     array + Kasai LCP (functions/suffix.py) in an
                     Arrow-batched pandas UDF; keep pairs >= min_run_tokens.

Scale: stage 1 is O(tokens) per doc and embarrassingly parallel; stage 2 is
one shuffle on fingerprint; stage 3 joins token arrays to pairs (two equi-
joins on id) and verifies pair-at-a-time — no bucket-sized suffix arrays, no
driver-side work. At 100 TB the token arrays are the heavy column; they are
built once, persisted, and never carried past this channel.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG
from dedup_spark.functions.rolling import doc_fingerprints
from dedup_spark.functions.signatures import token_hashes
from dedup_spark.functions.suffix import longest_common_run
from dedup_spark.operators.lsh import pairs_from_buckets


def fingerprint_udf(config: DedupConfig):
    min_run, w = config.suffix_min_run_tokens, config.suffix_winnow_w

    @F.pandas_udf(ArrayType(LongType()))
    def _fp(tok: pd.Series) -> pd.Series:
        return doc_fingerprints(tok, min_run, w)

    return _fp


def common_run_udf():
    @F.pandas_udf(LongType())
    def _run(tok_a: pd.Series, tok_b: pd.Series) -> pd.Series:
        out = np.zeros(len(tok_a), dtype=np.int64)
        for i, (a, b) in enumerate(zip(tok_a, tok_b)):
            if a is not None and b is not None and len(a) and len(b):
                out[i] = longest_common_run(
                    np.asarray(a, dtype=np.int64), np.asarray(b, dtype=np.int64)
                )
        return pd.Series(out)

    return _run


def suffix_repeat_pairs(
    docs: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "id",
    text_col: str = "text",
    pair_cap_all: int | None = None,
) -> DataFrame:
    """docs(id, text) -> (id_a, id_b, run_tokens, channel='suffix') for pairs
    sharing a repeated run of >= config.suffix_min_run_tokens tokens.

    Exhaustive by default (pair_cap_all=None: recall 1.0 — the fingerprint
    guarantee plus exact verification); pass a cap to switch hot fingerprint
    buckets to star topology when only CC connectivity is needed.
    """
    from dedup_spark.plans.pipeline import spill

    toks = docs.select(
        F.col(id_col).alias("id"), token_hashes(text_col).alias("tok")
    ).filter(F.size("tok") > 0)
    # token arrays are a wide array column consumed by both the fingerprint
    # stage and the two verify joins: parquet spill-checkpoint, NOT .persist()
    # — the on-heap columnar cache build anti-scales for wide arrays (measured
    # 2.2x slower at 32 cores; see config.spill_dir)
    toks = spill(toks, config, "suffix_toks")

    fps = toks.select("id", fingerprint_udf(config)("tok").alias("fps"))
    exploded = fps.select(
        "id", F.lit(0).alias("band_idx"), F.explode("fps").alias("band_key")
    )
    cand = pairs_from_buckets(exploded, channel="suffix", pair_cap_all=pair_cap_all)

    a = toks.select(F.col("id").alias("id_a"), F.col("tok").alias("tok_a"))
    b = toks.select(F.col("id").alias("id_b"), F.col("tok").alias("tok_b"))
    verified = (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("run_tokens", common_run_udf()(F.col("tok_a"), F.col("tok_b")))
        .filter(F.col("run_tokens") >= config.suffix_min_run_tokens)
        .select("id_a", "id_b", "run_tokens", "channel")
    )
    return verified
