"""WARC ingest: Common-Crawl-style web archives -> input_hint pages.

The reference scans a filesystem (/root/reference/src/find_duplicates_base.cpp:16-140);
the web-scale analogue ingests WARC archives — the format Common Crawl
actually ships — into the (url, warc_ts, html, text, lang, source) table the
rest of the engine consumes. Parsing is dependency-free (WARC/1.x is a plain
"header block + payload" framing, gzip handled by the stdlib) and runs as an
iterator-of-batches mapInPandas over `binaryFile` rows: one task per archive
file, which matches how Common Crawl is laid out (~1 GB .warc.gz segments,
tens of thousands of files per crawl — natural task granularity for a
1000-executor cluster, no shuffle at ingest).

Scale note: `binaryFile` materializes a whole archive per task, so executor
memory must cover one decompressed segment (Common Crawl segments are sized
for exactly this). Only `response` records are emitted; `request`/`metadata`
records and non-HTTP payloads are skipped, mirroring the reference's
skip-empty/skip-irrelevant scan rules (S1).

Text extraction is a deterministic, tag-stripping heuristic (drop
script/style blocks, strip tags, decode the common entities, collapse
whitespace). It is NOT a production boilerplate remover — it exists so the
dedup semantics downstream (which operate on `text`) are testable end to end
from raw archives; swap in a real extractor at the same seam.
"""

from __future__ import annotations

import gzip
import io
import re
from email.utils import parsedate_to_datetime
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, "
    "lang string, source string"
)

_TAG_DROP = re.compile(
    r"<(script|style)\b[^>]*>.*?</\1\s*>", re.IGNORECASE | re.DOTALL
)
_TAGS = re.compile(r"<[^>]+>")
_WS = re.compile(r"\s+")
_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&#39;": "'", "&apos;": "'", "&nbsp;": " ",
}


def html_to_text(html: str) -> str:
    """Deterministic tag-stripping extraction (see module docstring)."""
    s = _TAG_DROP.sub(" ", html)
    s = _TAGS.sub(" ", s)
    for ent, ch in _ENTITIES.items():
        s = s.replace(ent, ch)
    return _WS.sub(" ", s).strip()


def _iter_warc_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record from one archive's bytes.

    Handles plain and gzip archives (including the member-per-record gzip
    Common Crawl uses — stdlib gzip reads concatenated members natively).
    """
    if raw[:2] == b"\x1f\x8b":
        raw = gzip.decompress(raw)
    buf = io.BytesIO(raw)
    while True:
        # skip inter-record blank lines
        line = buf.readline()
        if not line:
            return
        if line.strip() == b"":
            continue
        if not line.startswith(b"WARC/"):
            # tolerate garbage between records: scan to next version line
            continue
        headers: dict[str, str] = {}
        while True:
            h = buf.readline()
            if not h or h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        payload = buf.read(length)
        yield headers, payload


def _http_body(payload: bytes) -> bytes | None:
    """Strip the HTTP response envelope from a WARC response payload."""
    if not payload.startswith(b"HTTP/"):
        return None
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        return payload[sep + 2 :] if sep >= 0 else None
    return payload[sep + 4 :]


def parse_warc_bytes(raw: bytes, source: str) -> pd.DataFrame:
    """One archive's bytes -> pages frame (pure function, unit-testable)."""
    rows = []
    for headers, payload in _iter_warc_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        body = _http_body(payload)
        if body is None:
            continue
        html = body.decode("utf-8", "replace")
        text = html_to_text(html)
        ts = None
        wd = headers.get("warc-date")
        if wd:
            try:
                # WARC-Date is ISO-8601 (1.0/1.1); fall back to RFC 2822
                from datetime import datetime

                ts = datetime.fromisoformat(wd.replace("Z", "+00:00"))
            except ValueError:
                try:
                    ts = parsedate_to_datetime(wd)
                except (TypeError, ValueError):
                    ts = None
        if ts is not None and ts.tzinfo is not None:
            # input_hint warc_ts is NTZ: record the UTC wall clock
            import datetime as _dt

            ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        rows.append(
            {
                "url": url,
                "warc_ts": ts,
                "html": body,
                "text": text,
                "lang": None,
                "source": source,
            }
        )
    return pd.DataFrame(
        rows, columns=["url", "warc_ts", "html", "text", "lang", "source"]
    )


def read_warc_pages(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files under `path` -> pages DataFrame (input_hint schema).

    `source` is the archive file name — the natural per-file partition unit
    for the checkpointed pipeline (one WARC segment == one resumable
    partition).
    """
    import os

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for _, row in pdf.iterrows():
                yield parse_warc_bytes(
                    bytes(row["content"]), os.path.basename(row["path"])
                )

    return files.select("path", "content").mapInPandas(parse, PAGES_SCHEMA)
