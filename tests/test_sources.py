"""WARC + JSONL ingest sources (dedup_spark/sources)."""

from __future__ import annotations

import gzip
import json

import pytest

from dedup_spark.sources.warc import (
    html_to_text,
    parse_warc_bytes,
    read_warc_pages,
)


def _warc_record(rtype: str, url: str | None, date: str, html: str) -> bytes:
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        + html.encode()
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    if url:
        headers.insert(2, b"WARC-Target-URI: " + url.encode())
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _sample_warc() -> bytes:
    return (
        _warc_record(
            "response", "https://a.example/x", "2024-01-02T03:04:05Z",
            "<html><head><script>var x=1;</script></head>"
            "<body><h1>Hello&nbsp;World</h1><p>a &amp; b</p></body></html>",
        )
        + _warc_record(  # request records must be skipped
            "request", "https://a.example/x", "2024-01-02T03:04:05Z", ""
        )
        + _warc_record(
            "response", "https://b.example/y", "2024-01-02T03:04:06Z",
            "<html><body>same text here</body></html>",
        )
    )


def test_html_to_text_strips_scripts_tags_entities():
    t = html_to_text(
        "<html><script>no()</script><style>p{}</style>"
        "<p>A &amp; B&nbsp;&lt;ok&gt;</p></html>"
    )
    assert t == "A & B <ok>"


def test_parse_warc_bytes_plain_and_gzip():
    raw = _sample_warc()
    for blob in (raw, gzip.compress(raw)):
        df = parse_warc_bytes(blob, "seg0")
        assert list(df.url) == ["https://a.example/x", "https://b.example/y"]
        assert df.text[0] == "Hello World a & b"
        assert df.warc_ts[0].isoformat() == "2024-01-02T03:04:05"
        assert df.warc_ts[0].tzinfo is None  # NTZ wall clock
        assert (df.source == "seg0").all()
        assert df.html[0].startswith(b"<html>")


def test_read_warc_pages_spark(spark, tmp_path):
    (tmp_path / "seg0.warc").write_bytes(_sample_warc())
    (tmp_path / "seg1.warc.gz").write_bytes(gzip.compress(_sample_warc()))
    pages = read_warc_pages(spark, str(tmp_path))
    rows = {(r.url, r.source) for r in pages.collect()}
    assert len(rows) == 4  # 2 responses x 2 archives
    assert ("https://a.example/x", "seg0.warc") in rows
    assert ("https://b.example/y", "seg1.warc.gz") in rows
    assert pages.schema["warc_ts"].dataType.typeName() == "timestamp"


def test_warc_feeds_dedup_end_to_end(spark, tmp_path, config):
    """Raw archives -> pipeline: the two identical docs across archives must
    cluster (url-distinct, text-identical -> exact channel)."""
    from dedup_spark.plans.pipeline import run_dedup

    raw = _warc_record(
        "response", "https://a.example/1", "2024-01-02T03:04:05Z",
        "<html><body>identical page body for dedup</body></html>",
    ) + _warc_record(
        "response", "https://a.example/2", "2024-01-02T03:04:06Z",
        "<html><body>identical page body for dedup</body></html>",
    )
    (tmp_path / "w.warc").write_bytes(raw)
    pages = read_warc_pages(spark, str(tmp_path))
    members = run_dedup(pages, config, channels=("exact",)).members.collect()
    assert {m.url for m in members} == {
        "https://a.example/1", "https://a.example/2"
    }
    assert len({m.cluster_id for m in members}) == 1


def test_read_jsonl_pages_field_mapping(spark, tmp_path):
    from dedup_spark.sources.jsonl import read_jsonl_pages

    lines = [
        {"url": "u1", "text": "alpha beta", "timestamp": "2024-03-04T05:06:07Z",
         "lang": "en", "dump": "cc-2024-10"},
        {"uri": "u2", "content": "gamma delta", "date": "2024-03-04 05:06:08"},
        {"url": "u3", "text": "   "},          # empty text -> dropped
        {"text": "no url"},                     # no url -> dropped
    ]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(l) for l in lines) + "\nnot json\n")
    got = {r.url: r for r in read_jsonl_pages(spark, str(p)).collect()}
    assert set(got) == {"u1", "u2"}
    assert got["u1"].text == "alpha beta"
    assert got["u1"].lang == "en" and got["u1"].source == "cc-2024-10"
    assert got["u2"].text == "gamma delta" and got["u2"].source == "jsonl"
    assert got["u1"].warc_ts is not None and got["u2"].warc_ts is not None


def test_cli_ingests_warc_input(spark, tmp_path, capsys):
    """spark-submit entry accepts --input-format warc end to end."""
    from jobs.dedup_job import main

    (tmp_path / "seg0.warc").write_bytes(_sample_warc())
    main(
        ["--input", str(tmp_path / "seg0.warc"), "--input-format", "warc",
         "--output", str(tmp_path / "out"), "--action", "summarize"],
        spark=spark,
    )
    out = capsys.readouterr().out
    assert "n_duplicate_docs" in out
