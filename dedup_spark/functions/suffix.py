"""Suffix array + LCP over integer token sequences (N6 core math).

The north rule's "suffix-array pass for long repeated substrings" operates at
token granularity: a repeated substring of >= L tokens between two documents
is a common subsequence-run of their token-hash arrays. The suffix array is
built with the prefix-doubling algorithm — O(n log n), fully numpy-vectorized
(argsort/lexsort per doubling round, no per-element Python) — and LCPs with
Kasai's algorithm.

Document fencing: sequences are concatenated with unique separator values
smaller than every token value, so no suffix comparison ever runs across a
document boundary.
"""

from __future__ import annotations

import numpy as np


def suffix_array(seq: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence (any dtype, any value range)."""
    n = len(seq)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    _, rank = np.unique(seq, return_inverse=True)
    rank = rank.astype(np.int64)
    order = np.argsort(rank, kind="stable")
    k = 1
    while k < n:
        rank2 = np.full(n, -1, dtype=np.int64)
        rank2[: n - k] = rank[k:]
        order = np.lexsort((rank2, rank))
        changed = (rank[order][1:] != rank[order][:-1]) | (
            rank2[order][1:] != rank2[order][:-1]
        )
        new_rank = np.empty(n, dtype=np.int64)
        new_rank[order] = np.concatenate(([0], np.cumsum(changed)))
        rank = new_rank
        if rank[order[-1]] == n - 1:
            break
        k *= 2
    return order.astype(np.int64)


def lcp_array(seq: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """Kasai LCP: lcp[i] = longest common prefix of suffixes sa[i-1], sa[i].

    O(n) total; the inner while advances a global cursor so the Python-level
    loop body is cheap. Used on per-pair / per-bucket sequences (thousands of
    tokens), never on a whole partition.
    """
    n = len(seq)
    lcp = np.zeros(n, dtype=np.int64)
    if n == 0:
        return lcp
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        r = rank[i]
        if r > 0:
            j = sa[r - 1]
            while i + h < n and j + h < n and seq[i + h] == seq[j + h]:
                h += 1
            lcp[r] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def fence_concat(arrays: list[np.ndarray]) -> tuple[np.ndarray, np.ndarray]:
    """Concatenate integer arrays with unique separators.

    Returns (fenced sequence, doc_of: index -> doc ordinal, -1 on separators).
    Token values are densified to start at len(arrays) so separators
    0..len(arrays)-1 are unique and collide with nothing.
    """
    k = len(arrays)
    parts, owners = [], []
    for d, a in enumerate(arrays):
        parts.append(np.asarray(a, dtype=np.int64))
        owners.append(np.full(len(a), d, dtype=np.int64))
        parts.append(np.array([-(d + 1)], dtype=np.int64))  # placeholder sep
        owners.append(np.array([-1], dtype=np.int64))
    seq = np.concatenate(parts)
    doc_of = np.concatenate(owners)
    # densify: separators (doc_of == -1) -> 0..k-1; tokens -> dense rank + k
    toks = seq[doc_of >= 0]
    _, dense = np.unique(toks, return_inverse=True)
    out = np.empty(len(seq), dtype=np.int64)
    out[doc_of >= 0] = dense + k
    out[doc_of < 0] = np.arange(k, dtype=np.int64)[::-1][: (doc_of < 0).sum()]
    return out, doc_of


def longest_common_run(a: np.ndarray, b: np.ndarray) -> int:
    """Exact longest common token run between two sequences (suffix array +
    Kasai over the fenced concatenation; classic LCS-substring reduction)."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    if len(a) == 0 or len(b) == 0:
        return 0
    seq, doc_of = fence_concat([a, b])
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    owners = doc_of[sa]
    cross = (owners[1:] >= 0) & (owners[:-1] >= 0) & (owners[1:] != owners[:-1])
    if not cross.any():
        return 0
    return int(lcp[1:][cross].max())


def bucket_repeat_pairs(
    arrays: list[np.ndarray], min_run: int
) -> list[tuple[int, int, int]]:
    """All doc-ordinal pairs in a bucket sharing a token run >= min_run.

    ONE suffix array over the fenced concatenation of every doc in the bucket
    (amortized: per-pair verification would rebuild an SA per pair). Maximal
    SA intervals with lcp >= min_run identify suffix groups sharing a run; by
    the range-minimum property, every cross-doc pair inside such an interval
    has a common run >= the interval minimum, and conversely any pair with a
    true common run >= min_run lands in one interval — so emitting ALL pairs
    per interval is exactly the per-pair-verified pair set. `run_tokens` is
    the interval minimum (a lower bound, always >= min_run; exact for
    SA-adjacent entries via the lcp refinement) — use `longest_common_run`
    when the exact maximum matters.
    Returns (ord_a, ord_b, run_tokens) with ord_a < ord_b, max-aggregated.
    """
    seq, doc_of = fence_concat(arrays)
    sa = suffix_array(seq)
    lcp = lcp_array(seq, sa)
    owners = doc_of[sa]
    best: dict[tuple[int, int], int] = {}
    i = 1
    n = len(seq)
    while i < n:
        if lcp[i] < min_run:
            i += 1
            continue
        # maximal interval [i-1 .. j] with all lcp[i..j] >= min_run
        j = i
        run_min = lcp[i]
        while j + 1 < n and lcp[j + 1] >= min_run:
            j += 1
            run_min = min(run_min, lcp[j])
        docs_in = owners[i - 1 : j + 1]
        docs_in = docs_in[docs_in >= 0]
        uniq = np.unique(docs_in)
        if len(uniq) >= 2:
            run_min = int(run_min)
            for x in range(len(uniq)):
                for y in range(x + 1, len(uniq)):
                    key = (int(uniq[x]), int(uniq[y]))
                    if best.get(key, 0) < run_min:
                        best[key] = run_min
            # exact lengths for adjacent cross-doc entries
            for t in range(i, j + 1):
                x, y = int(owners[t - 1]), int(owners[t])
                if x >= 0 and y >= 0 and x != y:
                    key = (min(x, y), max(x, y))
                    if best.get(key, 0) < lcp[t]:
                        best[key] = int(lcp[t])
        i = j + 1
    return [(a, b, r) for (a, b), r in sorted(best.items())]
