"""Scan / ingest operator (S1 in SURVEY.md §2.1).

Mirrors the reference's path scan (/root/reference/src/find_duplicates_base.cpp:16-140):
  - skip empty content (:34-35)            -> filter trim(text) != ''
  - count each physical file once even via
    multiple hard links (:40-51)           -> one row per url (earliest warc_ts)
  - count files + bytes (:57-58)           -> df.observe metrics

The hard-link analogue is row identity: the same url crawled twice must be a
single input record; keep policy "first" = earliest warc_ts (config).
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG


def validate_predicates(preds: list[str]) -> list[str]:
    """S2: canonicalize the input-selection predicate list (the analogue of
    the reference's CLI path canonicalization + duplicate-path warning,
    /root/reference/src/parse.cpp:28-66).

    Strips whitespace, drops empties, dedupes while preserving order (warning
    on duplicates exactly as the reference warns on repeated paths), and
    rejects obviously non-boolean garbage early (bare column name with no
    operator is accepted — it may be a boolean column — but unbalanced quotes
    or parens are not).
    """
    out: list[str] = []
    seen: set[str] = set()
    for raw in preds:
        p = " ".join(raw.split())
        if not p:
            continue
        if p.count("(") != p.count(")") or p.count("'") % 2 or p.count('"') % 2:
            raise ValueError(f"unbalanced quotes/parens in predicate: {raw!r}")
        if p in seen:
            print(f"warning: duplicate predicate ignored: {p}", file=sys.stderr)
            continue
        seen.add(p)
        out.append(p)
    return out


def select_input(pages: DataFrame, predicates: list[str]) -> DataFrame:
    """Apply validated predicates; on a partitioned source, predicates over
    partition columns reach the scan as PartitionFilters (Catalyst partition
    pruning — the recursive/non-recursive path selection of the reference's
    scan, /root/reference/src/find_duplicates_base.cpp:83-110, as metadata-only
    pruning instead of directory walking)."""
    for p in validate_predicates(predicates):
        pages = pages.filter(F.expr(p))
    return pages


def ingest_pages(
    pages: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    id_col: str = "url",
    text_col: str = "text",
    ts_col: str | None = "warc_ts",
) -> DataFrame:
    """Identity-dedup + empty filter. Narrow projection happens at the caller;
    this operator never references `html`, so Parquet column pruning keeps the
    raw payload out of the scan entirely when downstream stages don't need it.
    """
    df = pages
    if config.drop_empty_text:
        # trim() alone strips only spaces; whitespace-only docs (tabs,
        # newlines) must also be excluded (reference skips empty files,
        # find_duplicates_base.cpp:34-35)
        df = df.filter(F.regexp_replace(F.col(text_col), r"\s+", "") != "")
    if ts_col is not None and ts_col in df.columns:
        # one row per url; earliest (or latest) warc_ts wins, url-stable
        asc = F.col(ts_col).asc() if config.dedup_url_keep == "first" else F.col(ts_col).desc()
        w = Window.partitionBy(id_col).orderBy(asc)
        df = (
            df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        df = df.dropDuplicates([id_col])
    return df
