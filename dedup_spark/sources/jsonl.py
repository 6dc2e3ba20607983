"""JSONL page-dump ingest -> input_hint pages.

Webtext corpora commonly ship as JSONL (one document object per line:
Common Crawl derivatives, RefinedWeb/FineWeb-style dumps, internal crawls).
This maps the frequent field spellings onto the engine's
(url, warc_ts, html, text, lang, source) schema with a declarative
`spark.read.json` scan — schema applied up front (no sampling pass), lines
that fail to parse land in a `_corrupt` column and are dropped with the same
skip-empty semantics as the S1 scan. Everything is JVM-side; zero Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

# accepted input spellings, first non-null wins
_URL_FIELDS = ["url", "uri", "warc_target_uri", "id"]
_TEXT_FIELDS = ["text", "content", "raw_content", "body"]
_TS_FIELDS = ["warc_ts", "timestamp", "date", "crawl_date"]
_LANG_FIELDS = ["lang", "language"]
_SOURCE_FIELDS = ["source", "dump", "segment"]

_READ_SCHEMA = StructType(
    [StructField(f, StringType()) for f in
     dict.fromkeys(_URL_FIELDS + _TEXT_FIELDS + _TS_FIELDS + _LANG_FIELDS
                   + _SOURCE_FIELDS)]
    + [StructField("_corrupt", StringType())]
)


def read_jsonl_pages(
    spark: SparkSession, path: str, default_source: str = "jsonl"
) -> DataFrame:
    """JSONL file(s) at `path` -> pages DataFrame (input_hint schema)."""
    raw = (
        spark.read.schema(_READ_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )

    def first_of(fields: list[str]) -> F.Column:
        return F.coalesce(*[F.col(f) for f in fields])

    ts = first_of(_TS_FIELDS)
    # ANSI mode (repo default) makes to_timestamp THROW on unparseable input,
    # which would crash the whole ingest on one odd row — contradicting the
    # PERMISSIVE design. try_to_timestamp returns null instead, so the
    # coalesce fallback chain is actually reachable: ISO (default parser),
    # explicit ISO-with-offset, slash dates, and bare epoch seconds.
    warc_ts = F.coalesce(
        F.try_to_timestamp(ts),
        F.try_to_timestamp(ts, F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
        F.try_to_timestamp(ts, F.lit("MM/dd/yyyy")),
        F.when(
            ts.rlike(r"^\d{9,12}$"), F.timestamp_seconds(ts.try_cast("long"))
        ),
    )
    return (
        raw.filter(F.col("_corrupt").isNull())
        .select(
            first_of(_URL_FIELDS).alias("url"),
            warc_ts.alias("warc_ts"),
            F.lit(None).cast("binary").alias("html"),
            first_of(_TEXT_FIELDS).alias("text"),
            first_of(_LANG_FIELDS).alias("lang"),
            F.coalesce(first_of(_SOURCE_FIELDS), F.lit(default_source)).alias(
                "source"
            ),
        )
        .filter(F.col("url").isNotNull() & (F.length(F.trim("text")) > 0))
    )
