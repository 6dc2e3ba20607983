"""Ingest sources beyond parquet/Iceberg: WARC (Common Crawl's native
archive format) and JSONL page dumps, both mapped to the input_hint schema
(url, warc_ts, html, text, lang, source)."""

from dedup_spark.sources.jsonl import read_jsonl_pages
from dedup_spark.sources.warc import read_warc_pages

__all__ = ["read_warc_pages", "read_jsonl_pages"]
