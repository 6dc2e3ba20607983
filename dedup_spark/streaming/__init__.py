"""Structured Streaming ingest (SURVEY.md §2.6: the reference is strictly
batch; `warc_ts` is the natural watermark column for a streaming ingest)."""

from dedup_spark.streaming.ingest import (
    read_pages_stream,
    stream_ingest,
    stream_exact_dup_counts,
    run_stream_to_parquet,
)

__all__ = [
    "read_pages_stream",
    "stream_ingest",
    "stream_exact_dup_counts",
    "run_stream_to_parquet",
]
