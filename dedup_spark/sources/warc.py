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

Scale note: `binaryFile` materializes one COMPRESSED archive per task;
decompression is streamed record-at-a-time through `gzip.GzipFile` (never
`gzip.decompress` of the whole archive — a ~1 GB Common Crawl segment
inflates to ~4-5 GB, which at 32 concurrent tasks would blow executor heap),
and the mapInPandas iterator emits bounded pandas batches
(`_BATCH_ROWS`/`_BATCH_BYTES`) instead of one frame per archive, so peak
per-task memory is ~compressed-segment + one batch. Only `response` records
are emitted; `request`/`metadata` records and non-HTTP payloads are skipped,
mirroring the reference's skip-empty/skip-irrelevant scan rules (S1).
Parsing is pure-Python per record — at file-task granularity with zero
shuffle that is the right Spark shape, but a production 100 TB ingest would
swap this seam for fastwarc/resiliparse.

Text extraction is a seam with two built-in fillings: the default
`html_to_text` here is a deterministic tag-stripping regex heuristic (drop
script/style blocks, strip tags, decode the common entities, collapse
whitespace) — NOT a boilerplate remover, but golden-pinned and stable since
it became the ingest default; `sources/extract.py:extract_text` is the
tag-aware boilerplate stripper (real HTMLParser parse, chrome-subtree
drops, link-density block filtering) for real-crawl ingest — pass it via
the `extractor` parameter or `--extractor boilerplate` on the job CLI.
Both are pure deterministic functions of the html string (SURVEY.md §2.8
invariant 8), each pinned by its own golden-file tests.
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


def _open_stream(raw: bytes) -> io.BufferedIOBase:
    """Archive bytes -> streaming binary reader (decompress incrementally).

    `gzip.GzipFile` reads concatenated members natively (the member-per-record
    gzip Common Crawl uses) and only keeps the inflate window in memory —
    never the whole decompressed archive.
    """
    if raw[:2] == b"\x1f\x8b":
        return gzip.GzipFile(fileobj=io.BytesIO(raw))  # type: ignore[return-value]
    return io.BytesIO(raw)


def _iter_warc_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield (headers, payload) per WARC record, streaming from one archive.

    A record with a missing/malformed Content-Length cannot be framed, so it
    is dropped and the scanner RESYNCS: the next version line is only
    accepted after a blank line (the WARC-required CRLFCRLF boundary), so a
    payload body line that happens to start with 'WARC/' can't spawn phantom
    records.
    """
    from collections import deque

    buf = _open_stream(raw)
    # lines consumed by a FAILED candidate parse are replayed through the
    # scanner, so a malformed record never eats the next record's boundary
    pending: deque[bytes] = deque()

    def nextline() -> bytes:
        return pending.popleft() if pending else buf.readline()

    def readn(n: int) -> bytes:
        chunks: list[bytes] = []
        while n > 0 and pending:
            c = pending.popleft()
            if len(c) > n:
                pending.appendleft(c[n:])
                c = c[:n]
            chunks.append(c)
            n -= len(c)
        if n > 0:
            chunks.append(buf.read(n))
        return b"".join(chunks)

    resync = False
    prev_blank = True
    while True:
        line = nextline()
        if not line:
            return
        if line.strip() == b"":
            prev_blank = True
            continue
        if not line.startswith(b"WARC/") or (resync and not prev_blank):
            # tolerate garbage between records: scan to next version line
            prev_blank = False
            continue
        prev_blank = False
        headers: dict[str, str] = {}
        consumed: list[bytes] = []
        while True:
            h = nextline()
            if not h:
                break
            consumed.append(h)
            if h.strip() == b"":
                break
            if b":" in h:
                k, v = h.split(b":", 1)
                headers[k.decode("ascii", "replace").strip().lower()] = (
                    v.decode("utf-8", "replace").strip()
                )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            length = -1
        if length < 0:
            resync = True
            pending.extendleft(reversed(consumed))
            continue
        payload = readn(length)
        yield headers, payload
        resync = False


def _http_body(payload: bytes) -> bytes | None:
    """Strip the HTTP response envelope from a WARC response payload."""
    if not payload.startswith(b"HTTP/"):
        return None
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        sep = payload.find(b"\n\n")
        return payload[sep + 2 :] if sep >= 0 else None
    return payload[sep + 4 :]


_COLUMNS = ["url", "warc_ts", "html", "text", "lang", "source"]
# Batch flush thresholds for the streaming emitter: either bound trips a
# flush, so peak per-task memory is one compressed archive + one batch.
_BATCH_ROWS = 1024
_BATCH_BYTES = 32 * 1024 * 1024


def _safe_records(raw: bytes) -> Iterator[tuple[dict, bytes]]:
    """Record iterator tolerant of corrupt archives: a truncated or
    bit-rotted gzip tail (real Common Crawl segments do break) ends THIS
    archive's stream after the records already parsed instead of failing the
    task — and with it, after retries, the whole 100 TB job."""
    import zlib

    it = _iter_warc_records(raw)
    while True:
        try:
            rec = next(it)
        except StopIteration:
            return
        except (EOFError, OSError, zlib.error):
            return
        yield rec


def iter_warc_pages(raw: bytes, source: str, extractor=None) -> Iterator[dict]:
    """Stream page row-dicts from one archive's bytes (constant memory).

    `extractor`: html->text function filling the extraction seam. Default is
    the regex heuristic `html_to_text` (golden-pinned since round 3);
    `sources.extract.extract_text` is the tag-aware boilerplate stripper —
    pass it here (or --extractor boilerplate on the job CLI) for real-crawl
    ingest. Both are pure deterministic functions of the html string
    (SURVEY.md §2.8 invariant 8), each pinned by its own golden tests.
    """
    to_text = html_to_text if extractor is None else extractor
    for headers, payload in _safe_records(raw):
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        if not url:
            continue
        body = _http_body(payload)
        if body is None:
            continue
        html = body.decode("utf-8", "replace")
        text = to_text(html)
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
        yield {
            "url": url,
            "warc_ts": ts,
            "html": body,
            "text": text,
            "lang": None,
            "source": source,
        }


def parse_warc_bytes(raw: bytes, source: str, extractor=None) -> pd.DataFrame:
    """One archive's bytes -> pages frame (pure function, unit-testable)."""
    return pd.DataFrame(
        list(iter_warc_pages(raw, source, extractor)), columns=_COLUMNS
    )


def read_warc_pages(
    spark: SparkSession,
    path: str,
    batch_rows: int = _BATCH_ROWS,
    batch_bytes: int = _BATCH_BYTES,
    extractor=None,
) -> DataFrame:
    """WARC archive files under `path` -> pages DataFrame (input_hint schema).

    `source` is the archive file name — the natural per-file partition unit
    for the checkpointed pipeline (one WARC segment == one resumable
    partition). Pages are emitted as bounded pandas batches, never one frame
    per archive. `extractor` fills the text-extraction seam
    (see iter_warc_pages); it must be importable on executors — pass a
    module-level function, not a closure.
    """
    import os

    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        nbytes = 0
        for pdf in batches:
            for _, row in pdf.iterrows():
                for page in iter_warc_pages(
                    bytes(row["content"]), os.path.basename(row["path"]),
                    extractor,
                ):
                    rows.append(page)
                    nbytes += len(page["html"]) + len(page["text"])
                    if len(rows) >= batch_rows or nbytes >= batch_bytes:
                        yield pd.DataFrame(rows, columns=_COLUMNS)
                        rows, nbytes = [], 0
        if rows:
            yield pd.DataFrame(rows, columns=_COLUMNS)

    return files.select("path", "content").mapInPandas(parse, PAGES_SCHEMA)
