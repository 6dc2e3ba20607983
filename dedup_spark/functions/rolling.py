"""Vectorized rolling (polynomial) window hashes + winnowing fingerprints.

Stage-1 primitives for the suffix-array channel (N6 in SURVEY.md §2.7): two
documents can share a repeated token run of length >= L only if they share a
window hash of some L'-token window, and winnowing (Schleimer et al.,
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003)
selects a guaranteed-shared subset of those hashes: with gram size g and
winnow window w, any shared run of >= g + w - 1 tokens shares at least one
selected fingerprint. We pick g = min_run_tokens - winnow_w + 1 so the
guarantee kicks in exactly at config.suffix_min_run_tokens.

All numpy, exact uint64 arithmetic (mod 2^64 wraparound is the modulus):
position-independent window hash
    W_i = sum_{m=0}^{g-1} t_{i+m} * B^{-m}  (mod 2^64)
computed in O(n) from cumulative sums of t_j * B^{-j} scaled back by B^j —
no Python-level scan, no per-row Python (north rule).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# odd base -> invertible mod 2^64; fixed so fingerprints are deterministic
# across sessions/retries (SURVEY.md §4.2 determinism pinning)
_BASE = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_BASE_INV = np.uint64(pow(int(_BASE), -1, 1 << 64))


def window_hashes(token_hashes: np.ndarray, g: int) -> np.ndarray:
    """All g-token window hashes of a token-hash sequence, exact, O(n).

    Returns an array of length max(0, n - g + 1); equal windows (same g
    tokens) always produce equal hashes regardless of position or document.
    """
    t = np.asarray(token_hashes, dtype=np.int64).view(np.uint64)
    n = t.shape[0]
    if n < g:
        return np.empty(0, dtype=np.uint64)
    # c_j = t_j * Binv^j;  S_i = sum_{j<=i} c_j;  W_i = (S_{i+g-1} - S_{i-1}) * B^i
    binv_pows = np.empty(n, dtype=np.uint64)
    binv_pows[0] = np.uint64(1)
    np.multiply.accumulate(np.full(n - 1, _BASE_INV, dtype=np.uint64),
                           out=binv_pows[1:])
    b_pows = np.empty(n - g + 1, dtype=np.uint64)
    b_pows[0] = np.uint64(1)
    np.multiply.accumulate(np.full(n - g, _BASE, dtype=np.uint64),
                           out=b_pows[1:])
    c = t * binv_pows
    s = np.add.accumulate(c)
    diff = s[g - 1:].copy()
    diff[1:] -= s[: n - g]
    return diff * b_pows


def winnow(hashes: np.ndarray, w: int) -> np.ndarray:
    """Winnowing selection: min hash of every w consecutive window hashes
    (rightmost min on ties — deterministic), deduplicated.

    Guarantee: two sequences sharing >= w consecutive window hashes share a
    selected fingerprint.
    """
    h = np.asarray(hashes, dtype=np.uint64)
    if h.size == 0:
        return h
    if h.size <= w:
        return np.unique(h.min(keepdims=True))
    windows = np.lib.stride_tricks.sliding_window_view(h, w)
    return np.unique(windows.min(axis=1))


def doc_fingerprints(
    token_hash_arrays: pd.Series, min_run_tokens: int, winnow_w: int
) -> pd.Series:
    """Batch: per-doc winnowed fingerprint sets (list of int64).

    Docs shorter than the gram size get no fingerprints — they cannot contain
    a run of min_run_tokens (>= gram size) tokens, so they can never satisfy
    the channel's predicate; near-dup coverage for short docs comes from the
    MinHash/SimHash channels.
    """
    g = max(2, min_run_tokens - winnow_w + 1)
    empty = np.empty(0, dtype=np.int64)
    out = []
    for arr in token_hash_arrays:
        if arr is None or len(arr) == 0:
            out.append(empty)
            continue
        wh = window_hashes(np.asarray(arr, dtype=np.int64), g)
        fp = winnow(wh, winnow_w)
        # hand Arrow an ndarray view, never a Python list (measured rule:
        # list conversion dominates the batch at scale; signature_batch
        # does the same)
        out.append(fp.view(np.int64))
    return pd.Series(out)
