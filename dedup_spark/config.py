"""Frozen pipeline configuration.

Analogue of the reference's ``ArgMap`` (/root/reference/src/utilities.h:16-22):
the whole "query" of the reference engine is its config record. Ours is a
frozen dataclass broadcast by value into every closure/UDF so retried or
speculated tasks can never observe a different configuration (determinism
invariant, SURVEY.md §2.8).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace


# Mersenne prime 2^31 - 1: modulus for the universal-hash MinHash permutation
# family. Coefficients and inputs range over the full field, so a*x + b stays
# strictly below 2^64 and the arithmetic is EXACT in uint64 — full-range a is
# what makes the family min-wise independent enough (empirically, agreement
# rate tracks true Jaccard; a truncated-coefficient 61-bit variant biased
# agreement from 0.60 up to 0.89 in testing).
MERSENNE_31 = (1 << 31) - 1


@dataclass(frozen=True)
class DedupConfig:
    """All knobs in one place; never duplicate a constant outside this class.

    Defaults follow BASELINE.json's north_star: k=5 word shingles, 128 MinHash
    permutations, LSH banding at 16 bands x 8 rows (S-curve threshold ~0.7),
    SimHash-64.
    """

    # --- shingling (N2) ---
    shingle_k: int = 5

    # --- MinHash (N3) ---
    num_perm: int = 128
    minhash_seed: int = 42
    # "classic": num_perm independent Mersenne-31 permutations — the
    #   reference configuration (BASELINE.json north_star: "128
    #   permutations"); every recall-vs-reference claim is made under it.
    # "oph": densified one-permutation hashing (Shrivastava & Li, ICML 2014)
    #   — ONE permutation pass over the shingles, range-split into num_perm
    #   bins, per-bin min, empty bins filled by circular borrow from the
    #   next filled bin (+t*p offset so borrow distance never aliases).
    #   Same (n, num_perm) signature shape, unbiased Jaccard estimator,
    #   ~128x less hash arithmetic — the scheme you'd run at 10^12 docs.
    #   Banding/verification downstream is scheme-agnostic.
    minhash_scheme: str = "classic"

    # --- LSH banding (N4): bands * rows_per_band must equal num_perm.
    # theta ~ (1/b)^(1/r): b=32, r=4 -> ~0.42. The banding threshold must sit
    # WELL BELOW jaccard_threshold so recall at the verify threshold is ~1
    # (at J=0.75 the miss probability is (1-0.75^4)^32 ~ 4e-6, vs ~17% for
    # b=16/r=8); the Jaccard verification stage discards the extra low-J
    # candidates, so precision is unaffected (SURVEY.md §7.3 #2).
    lsh_bands: int = 32
    lsh_rows_per_band: int = 4

    # --- verification (N7) ---
    jaccard_threshold: float = 0.7

    # --- SimHash (N5) ---
    simhash_bits: int = 64
    # max Hamming distance considered near-dup; probing splits the 64-bit key
    # into (hamming_max + key_blocks) blocks and keys each bucket on a
    # c=key_blocks block combination (Manku/Jain/Das Sarma, WWW 2007,
    # "Detecting Near-Duplicates for Web Crawling"): any pair within
    # hamming_max corrupts at most hamming_max blocks, leaving >= key_blocks
    # clean ones, so at least one of the C(m, c) combined keys matches.
    simhash_hamming_max: int = 3
    # key_blocks=1 -> classic 4x16-bit block probing (4 probe tables, 16-bit
    # keys: at 10^12 docs a bucket holds ~n/2^16 docs — every bucket is
    # ultra-hot). key_blocks=3 -> 20 probe tables with ~32-bit keys: buckets
    # shrink ~2^16x, landing inside the exhaustive pair-generation tiers at
    # web scale. More probe rows per doc (C(6,3)=20 vs 4) buys bounded
    # buckets — the Manku trade. Candidate semantics are IDENTICAL after the
    # Hamming cut (equivalence is property-tested); only bucket granularity
    # changes.
    simhash_key_blocks: int = 1

    # --- suffix-array channel (N6) ---
    suffix_min_run_tokens: int = 50
    # winnowing window (Schleimer et al. 2003): gram size g = min_run - w + 1
    # gives a shared-fingerprint guarantee exactly at min_run tokens.
    suffix_winnow_w: int = 8
    suffix_enabled: bool = False

    # --- skew handling (N10) ---
    # Bucket-size tier routing lives in operators/lsh.py
    # (PAIR_CAP_ALL/PAIR_CAP_CROSS — generator-level constants, overridable
    # per call site); the config knob here is the salt count for the
    # ultra-hot star tier. (A former `bucket_cap` field was dead — nothing
    # read it while the generator constants governed routing — and was
    # removed rather than left describing behavior that didn't exist.)
    bucket_salts: int = 8

    # --- connected components (N8) ---
    cc_max_iterations: int = 50

    # --- ingest invariants (SURVEY.md §2.8 #5-6) ---
    drop_empty_text: bool = True
    dedup_url_keep: str = "first"  # one row per url: earliest warc_ts wins

    # --- exact-channel verification key ---
    # "text": group by the full normalized text — the reference's literal
    #   content-equality contract (collision splitting by value,
    #   /root/reference/src/find_duplicates_map.cpp:43-66). Shuffles the text.
    # "sha256": group by (length, sha256) — 256-bit key, collision probability
    #   ~n^2/2^257 (~1e-54 at 10^12 docs); shuffles 40 bytes/row instead of
    #   the document. The right choice at 100 TB; identical results in any
    #   universe without a SHA-256 collision.
    exact_verify: str = "text"

    # --- execution ---
    shuffle_partitions: int = 32
    arrow_max_records_per_batch: int = 4096
    # multi-consumer intermediates are spill-checkpointed to parquet instead
    # of .persist(): building Spark's on-heap columnar cache for wide array
    # columns anti-scales with executor concurrency (measured 2.2x SLOWER at
    # 32 cores than 8 in local mode), while a columnar write rides the OS
    # page cache. None -> a fresh temp dir per run.
    spill_dir: str | None = None
    # "parquet" (default, the scale path above) or "cache" (plain .persist()
    # — for SMALL corpora, where each parquet write+read barrier is a fixed
    # ~0.7-1 s/job of pure overhead: measured ~4 s of an ~8 s 5,000-doc
    # pipeline run. The columnar-cache anti-scaling only bites when the
    # cached arrays are large; at <=100k docs persist is strictly faster.
    # Values are identical either way: spill is a materialization barrier,
    # and the one lineage it pins — order-preserving ids over range-
    # partitioned sorted urls — is deterministic under recompute.)
    spill_mode: str = "parquet"

    extra: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.lsh_bands * self.lsh_rows_per_band != self.num_perm:
            raise ValueError(
                f"lsh_bands({self.lsh_bands}) * rows({self.lsh_rows_per_band})"
                f" != num_perm({self.num_perm})"
            )
        if self.shingle_k < 1:
            raise ValueError("shingle_k must be >= 1")
        if self.minhash_scheme not in ("classic", "oph"):
            raise ValueError(
                f"minhash_scheme must be 'classic' or 'oph', "
                f"got {self.minhash_scheme!r}"
            )
        if not (0.0 < self.jaccard_threshold <= 1.0):
            raise ValueError("jaccard_threshold in (0, 1]")
        if self.simhash_key_blocks < 1:
            raise ValueError("simhash_key_blocks must be >= 1")
        m = self.simhash_hamming_max + self.simhash_key_blocks
        if m > self.simhash_bits:
            raise ValueError(
                f"hamming_max({self.simhash_hamming_max}) + key_blocks"
                f"({self.simhash_key_blocks}) exceeds simhash_bits"
            )

    @property
    def lsh_theta(self) -> float:
        """Approximate S-curve threshold (1/b)^(1/r) of the banding scheme."""
        return (1.0 / self.lsh_bands) ** (1.0 / self.lsh_rows_per_band)

    def with_(self, **kw) -> "DedupConfig":
        return replace(self, **kw)


DEFAULT_CONFIG = DedupConfig()
