"""Fused per-doc n-gram repetition counts: ONE Arrow round trip, no shuffle.

The c10 repetition signals (Gopher dup/top n-gram fractions, n = 2, 3) are
PER-DOCUMENT statistics — nothing about them needs data movement. The
relational formulation (posexplode -> window lead -> three chained groupBys)
is oracle-shaped but shuffles the whole token stream once to compute them:
measured 111.5 s for 600k docs / 84M tokens on pinned local[8]
(BENCH/curation_at_size.json), the slowest operator in the tree. This module
is the engine path: the JVM hands the UDF per-doc xxhash64 token arrays (the
doc_signature_udf input shape) and a single vectorized numpy pass returns
(tot, top, dup) per n per doc — zero exchanges, embarrassingly parallel,
skew bound = longest doc in a batch.

Equality semantics: an n-gram is identified by the rolling polynomial hash
of its n token hashes (functions/rolling.window_hashes — position
independent, equal token windows always collide). Two DIFFERENT n-grams of
a doc folding together needs a 64-bit collision (~m^2/2^65 per doc,
negligible); identity to the string-gram relational path is property-pinned
in tests/test_curation.py. The dup/top FRACTIONS stay computed in Spark SQL
expressions downstream so rounding matches the DuckDB oracle verbatim.

Kernel shape per CLAUDE.md rules: streams 1-D arrays, one lexsort + run-
length encode + 1-D maximum.reduceat per n — no per-doc Python loop, no
(T, k) matrices, ndarray views handed to Arrow.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from dedup_spark.functions.rolling import window_hashes

REPETITION_NS = (2, 3)

REPETITION_SCHEMA = StructType(
    [
        StructField(f"{name}{n}", LongType())
        for n in REPETITION_NS
        for name in ("tot", "top", "dup")
    ]
)


def repetition_batch(
    tok_arrays: pd.Series, ns: tuple[int, ...] = REPETITION_NS
) -> pd.DataFrame:
    """Batch of per-doc token-hash arrays -> per-doc (tot, top, dup) per n.

    tot = number of n-gram occurrences (max(len - n + 1, 0)), top = the most
    frequent n-gram's occurrence count, dup = tot - distinct n-grams (i.e.
    sum over grams of cnt - 1). All counts are exact modulo 64-bit window-
    hash collisions (see module docstring).
    """
    lengths = np.array(
        [0 if v is None else len(v) for v in tok_arrays], dtype=np.int64
    )
    ndocs = lengths.shape[0]
    total = int(lengths.sum())
    flat = np.empty(total, dtype=np.int64)
    pos = 0
    for v, ln in zip(tok_arrays, lengths):
        if ln:
            flat[pos : pos + ln] = np.asarray(v, dtype=np.int64)
            pos += ln
    offsets = np.zeros(ndocs + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])

    cols: dict[str, np.ndarray] = {}
    for n in ns:
        tot = np.maximum(lengths - (n - 1), 0)
        top = np.zeros(ndocs, dtype=np.int64)
        uniq = np.zeros(ndocs, dtype=np.int64)
        if total >= n:
            # one global rolling pass over the flattened batch; windows that
            # straddle a doc boundary are masked out (a window starting at
            # within-doc position p is valid iff p <= len - n)
            wh = window_hashes(flat, n)
            doc_of = np.repeat(
                np.arange(ndocs, dtype=np.int64), lengths
            )[: total - n + 1]
            pos_in_doc = (
                np.arange(total - n + 1, dtype=np.int64) - offsets[doc_of]
            )
            valid = pos_in_doc <= lengths[doc_of] - n
            g, gd = wh[valid], doc_of[valid]
            if g.size:
                # counts per (doc, gram): grams are doc-contiguous already,
                # so one stable lexsort orders runs within each doc segment
                order = np.lexsort((g, gd))
                gs, ds = g[order], gd[order]
                new_run = np.empty(gs.size, dtype=bool)
                new_run[0] = True
                new_run[1:] = (gs[1:] != gs[:-1]) | (ds[1:] != ds[:-1])
                run_starts = np.flatnonzero(new_run)
                run_docs = ds[run_starts]
                counts = np.diff(np.append(run_starts, gs.size))
                uniq = np.bincount(run_docs, minlength=ndocs).astype(np.int64)
                # per-doc max run count: runs are doc-sorted, so segment
                # boundaries + one 1-D maximum.reduceat (the approved shape)
                seg = np.empty(run_docs.size, dtype=bool)
                seg[0] = True
                seg[1:] = run_docs[1:] != run_docs[:-1]
                seg_starts = np.flatnonzero(seg)
                top[run_docs[seg_starts]] = np.maximum.reduceat(
                    counts, seg_starts
                )
        cols[f"tot{n}"] = tot
        cols[f"top{n}"] = top
        cols[f"dup{n}"] = tot - uniq
    return pd.DataFrame(cols)


def repetition_counts_udf():
    """pandas UDF: array<long> token hashes -> struct of (tot, top, dup)
    longs per n in REPETITION_NS. The operator keeps all fraction/rounding
    arithmetic JVM-side so the DuckDB oracle stays value-exact."""

    @F.pandas_udf(REPETITION_SCHEMA)
    def _rep(tok: pd.Series) -> pd.DataFrame:
        return repetition_batch(tok)

    return _rep
