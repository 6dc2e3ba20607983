"""Streaming ingest: the S1 scan semantics over an unbounded page stream.

The reference is strictly batch (no streaming anywhere in its tree —
SURVEY.md §2.6); the batch pipeline's checkpoint/resume (plans/checkpoint.py)
is the primary incremental story. This module adds the *streaming front
door* a continuously-crawled corpus needs: the same ingest invariants
(empty-text filter, one row per url) expressed as a Structured Streaming
query with `warc_ts` watermarks bounding the dedup state, plus a windowed
exact-hash duplicate counter for monitoring dup rates as pages arrive.

Batch/stream parity is the contract: `stream_ingest` on a bounded stream
must produce exactly the rows `operators.scan.ingest_pages` produces on the
same data read as a batch (asserted in tests/test_streaming.py). Note one
semantic difference forced by streaming: within-watermark url dedup keeps the
FIRST ARRIVING row (streaming dropDuplicates cannot sort), while batch keeps
the earliest `warc_ts`; parity therefore holds whenever arrival order is
warc_ts order per url, which is how crawl logs are written.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig, DEFAULT_CONFIG
from dedup_spark.functions.text import normalize_text

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, source string"
)


def read_pages_stream(
    spark: SparkSession, path: str, schema: str = PAGES_SCHEMA
) -> DataFrame:
    """File-source stream of page parquet drops (one file per micro-batch
    set; an Iceberg/Kafka source slots in with the same downstream query)."""
    return spark.readStream.schema(schema).parquet(path)


def stream_ingest(
    stream: DataFrame,
    config: DedupConfig = DEFAULT_CONFIG,
    watermark: str = "1 hour",
) -> DataFrame:
    """S1 invariants on a stream: drop empty text, one row per url within the
    watermark, content hash attached.

    `dropDuplicates(["url"])` with a `warc_ts` watermark bounds the dedup
    state: urls older than the watermark are evicted, so state is
    O(urls per watermark window), not O(corpus) — the property that lets this
    run forever at crawl scale.
    """
    out = stream
    if config.drop_empty_text:
        out = out.filter(F.regexp_replace(F.col("text"), r"\s+", "") != "")
    out = (
        out.withWatermark("warc_ts", watermark)
        .dropDuplicates(["url"])
        .withColumn("content_hash", F.xxhash64(normalize_text("text")))
    )
    return out


def stream_exact_dup_counts(
    ingested: DataFrame,
    window: str = "1 hour",
    slide: str | None = None,
) -> DataFrame:
    """Windowed exact-duplicate monitor: per (event-time window,
    content_hash) arrival counts, emitting only hashes seen >= 2 times —
    the streaming analogue of G2 candidate pruning. Late rows within the
    watermark update their window; later ones are dropped (documented
    late-data policy)."""
    w = F.window("warc_ts", window, slide) if slide else F.window("warc_ts", window)
    return (
        ingested.groupBy(w.alias("win"), "content_hash")
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") >= 2)
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "content_hash",
            "n_copies",
        )
    )


def run_stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    mode: str = "append",
) -> int:
    """Drain the stream with an availableNow trigger (process everything
    currently in the source, then stop) — the batch-replay execution mode
    that makes streaming queries testable and backfillable.

    Returns the total `numRowsDroppedByWatermark` across the drained
    micro-batches. Structured Streaming SILENTLY filters input rows whose
    event time is behind the advancing watermark before they reach any
    stateful operator (the watermark applies with a one-batch lag, so the
    first two micro-batches of a replay pass everything and the loss starts
    at batch 3) — measured on a 4-micro-batch replay of 600k pages spanning
    7 days of event time with the default 1-hour watermark: 298,174 of
    600,000 arrivals vanished from `stream_first_seen`'s output (batches
    0/1 dropped 0, batches 2/3 dropped ~149k each). A backfill caller MUST
    check this count (or size the watermark to the source's event-time
    disorder); a live caller reads it as its late-data loss metric.
    """
    q = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    import json as _json

    dropped = 0
    for prog in q.recentProgress:
        if not isinstance(prog, dict):  # Spark 4 returns progress objects
            prog = _json.loads(prog.json)
        for op in (prog.get("stateOperators") or []):
            dropped += int(op.get("numRowsDroppedByWatermark") or 0)
    return dropped
