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


def test_warc_malformed_content_length_no_phantom_records():
    """A record without a framable Content-Length is dropped, and its payload
    lines starting with 'WARC/' must not spawn phantom records (resync
    requires the CRLFCRLF boundary before the next version line)."""
    body = b"HTTP/1.1 200 OK\r\n\r\nWARC/1.0 looks like a header\r\nmore"
    bad = (
        b"WARC/1.0\r\n"
        b"WARC-Type: response\r\n"
        b"WARC-Target-URI: https://bad.example/\r\n"
        b"Content-Length: garbage\r\n\r\n" + body + b"\r\n\r\n"
    )
    good = _warc_record(
        "response", "https://good.example/", "2024-01-02T03:04:05Z",
        "<html><body>fine</body></html>",
    )
    df = parse_warc_bytes(bad + good, "seg0")
    assert list(df.url) == ["https://good.example/"]
    # missing Content-Length entirely: same treatment
    bad2 = bad.replace(b"Content-Length: garbage\r\n", b"")
    df2 = parse_warc_bytes(bad2 + good, "seg0")
    assert list(df2.url) == ["https://good.example/"]


def test_warc_member_per_record_gzip_stream():
    """Common Crawl gzips each record as its own member; the streaming reader
    must handle concatenated members identically to one-shot compression."""
    members = b"".join(
        gzip.compress(rec)
        for rec in (
            _warc_record("response", "https://a.example/x",
                         "2024-01-02T03:04:05Z", "<p>one</p>"),
            _warc_record("response", "https://b.example/y",
                         "2024-01-02T03:04:06Z", "<p>two</p>"),
        )
    )
    df = parse_warc_bytes(members, "seg0")
    assert list(df.url) == ["https://a.example/x", "https://b.example/y"]
    assert list(df.text) == ["one", "two"]


def test_warc_truncated_gzip_keeps_parsed_records():
    """A truncated compressed tail (broken segment) yields the records that
    decompressed cleanly instead of raising — one bad archive must not fail
    a whole ingest job."""
    good = gzip.compress(
        _warc_record("response", "https://a.example/x",
                     "2024-01-02T03:04:05Z", "<p>one</p>")
    )
    broken = gzip.compress(
        _warc_record("response", "https://b.example/y",
                     "2024-01-02T03:04:06Z", "<p>two</p>")
    )[:-20]  # chop the trailing bytes: CRC/size footer gone mid-member
    df = parse_warc_bytes(good + broken, "seg0")
    assert list(df.url) == ["https://a.example/x"]
    # fully garbage input: no rows, no raise
    assert len(parse_warc_bytes(b"\x1f\x8b" + b"\x00" * 64, "seg0")) == 0


def test_read_warc_pages_bounded_batches(spark, tmp_path):
    """The mapInPandas emitter flushes bounded batches, and the batched output
    is identical to the pure whole-archive parse."""
    raw = b"".join(
        _warc_record("response", f"https://ex.example/{i}",
                     "2024-01-02T03:04:05Z", f"<p>page {i} body</p>")
        for i in range(10)
    )
    (tmp_path / "big.warc").write_bytes(raw)
    pages = read_warc_pages(spark, str(tmp_path), batch_rows=3).collect()
    expect = parse_warc_bytes(raw, "big.warc")
    assert [r.url for r in pages] == list(expect.url)
    assert [r.text for r in pages] == list(expect.text)


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


def test_read_jsonl_pages_tolerates_non_iso_timestamps(spark, tmp_path):
    """ANSI mode must not crash the ingest on odd timestamp spellings:
    slash dates and epoch seconds parse, garbage becomes null (row kept)."""
    from dedup_spark.sources.jsonl import read_jsonl_pages

    lines = [
        {"url": "slash", "text": "a", "date": "03/04/2024"},
        {"url": "epoch", "text": "b", "timestamp": "1709521567"},
        {"url": "junk", "text": "c", "date": "next tuesday-ish"},
    ]
    p = tmp_path / "pages.jsonl"
    p.write_text("\n".join(json.dumps(l) for l in lines))
    got = {r.url: r for r in read_jsonl_pages(spark, str(p)).collect()}
    assert set(got) == {"slash", "epoch", "junk"}
    assert got["slash"].warc_ts.year == 2024 and got["slash"].warc_ts.month == 3
    assert got["epoch"].warc_ts.year == 2024
    assert got["junk"].warc_ts is None


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


def test_cli_warc_to_canonicalize_round_trip(spark, tmp_path):
    """Full CLI composition in one invocation: raw gzip WARC archives ->
    ingest -> dedup pipeline -> canonicalize sinks (kept + redirects).
    Two archives plant a cross-archive exact dup and a unique page; the
    duplicate must collapse to one kept url with a redirect row."""
    from jobs.dedup_job import main

    dup_html = "<html><body>identical page body for the cli</body></html>"
    (tmp_path / "a.warc.gz").write_bytes(gzip.compress(
        _warc_record("response", "https://x.example/1",
                     "2024-01-02T03:04:05Z", dup_html)
        + _warc_record("response", "https://x.example/only",
                       "2024-01-02T03:04:06Z",
                       "<html><body>page that is entirely unique prose"
                       "</body></html>")
    ))
    (tmp_path / "b.warc.gz").write_bytes(gzip.compress(
        _warc_record("response", "https://x.example/2",
                     "2024-01-02T03:04:07Z", dup_html)
    ))
    out = tmp_path / "out"
    main(
        ["--input", str(tmp_path), "--input-format", "warc",
         "--output", str(out), "--action", "canonicalize"],
        spark=spark,
    )
    kept = {r.url for r in spark.read.parquet(str(out / "kept")).collect()}
    redirects = {
        (r.url, r.canonical_url)
        for r in spark.read.parquet(str(out / "redirects")).collect()
    }
    # the unique page never enters a duplicate cluster: untouched by sinks
    assert "https://x.example/only" not in kept
    assert all(u != "https://x.example/only" for u, _ in redirects)
    # exactly one of the dup pair is kept, the other redirects to it
    dup = {"https://x.example/1", "https://x.example/2"}
    assert kept & dup == kept and len(kept) == 1
    (winner,) = kept
    (loser,) = dup - kept
    assert redirects == {(loser, winner)}
