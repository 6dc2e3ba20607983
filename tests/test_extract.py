"""Tag-aware boilerplate extractor (dedup_spark/sources/extract.py).

Golden-file pins per SURVEY.md §2.8 invariant 8: extraction is a pure
deterministic function of the html string, and these goldens ARE the
contract — an intentional extractor change must update them consciously.
"""

from __future__ import annotations

import gzip
import hashlib

from dedup_spark.sources.extract import extract_text
from dedup_spark.sources.warc import parse_warc_bytes

_PAGE = """<!DOCTYPE html>
<html><head><title>Site Title</title>
<script>analytics("id");</script><style>body{margin:0}</style></head>
<body>
<header><a href="/">Acme Corp</a> &mdash; tagline</header>
<nav><a href="/a">Home</a> <a href="/b">Products</a> <a href="/c">About</a></nav>
<div id="breadcrumb"><a href="/">Home</a> &gt; <a href="/b">Products</a></div>
<main>
<h1>The Article &amp; Its Title</h1>
<p>First paragraph with <b>bold</b> and <a href="x">one inline link</a> in
running prose, long enough to obviously be content and not chrome.</p>
<p>Second&nbsp;paragraph: café, &quot;quotes&quot;, and ten or so words of body text.</p>
<ul><li>point one of the list</li><li>point two of the list</li></ul>
</main>
<aside>Related: <a href="/r1">other post</a> <a href="/r2">another</a></aside>
<div class="cookie-banner">We use cookies. <a href="/accept">Accept</a></div>
<footer><a href="/tos">Terms</a> <a href="/priv">Privacy</a> © 2024</footer>
<noscript>Please enable JavaScript</noscript>
</body></html>"""

_PAGE_GOLDEN = (
    "The Article & Its Title\n"
    "First paragraph with bold and one inline link in running prose, long "
    "enough to obviously be content and not chrome.\n"
    "Second paragraph: café, \"quotes\", and ten or so words of "
    "body text.\n"
    "point one of the list\n"
    "point two of the list"
)


def test_golden_full_page():
    assert extract_text(_PAGE) == _PAGE_GOLDEN


def test_chrome_subtrees_dropped():
    out = extract_text(_PAGE)
    for chrome in ("Acme Corp", "Home", "Terms", "cookies", "Related",
                   "enable JavaScript", "analytics", "margin", "Site Title"):
        assert chrome not in out


def test_inline_tags_do_not_split_words():
    # the regex seam turns "foo<b>bar</b>" into "foo bar"; the tag-aware
    # parse keeps inline elements inside the word run
    assert extract_text("<p>foo<b>bar</b>baz</p>") == "foobarbaz"
    assert extract_text("<p>one</p><p>two</p>") == "one\ntwo"


def test_link_density_rule():
    # short + mostly links -> chrome, dropped
    nav = "<div><a>a</a> <a>b</a> <a>c</a></div>"
    assert extract_text(nav) == ""
    # long link-heavy block (reference list) survives
    refs = "<div>" + " ".join(
        f"<a>reference number {i} with words</a>" for i in range(6)
    ) + "</div>"
    assert "reference number 0" in extract_text(refs)


def test_chrome_token_is_token_not_substring():
    # 'navy'/'headline' must NOT match the nav/header tokens
    assert extract_text(
        '<div class="navy-blue headline">real content words here</div>'
    ) == "real content words here"
    assert extract_text('<div class="main-nav">Home About</div>') == ""


def test_malformed_html_never_raises():
    cases = [
        "<p>unclosed everywhere <div><b>text",
        "</div></p>stray closers<p>ok words</p>",
        "<script>never closed... <p>invisible</p>",
        "",
        "plain text, no tags at all",
        "<a>" * 500 + "deep" + "</a>" * 600,
    ]
    for c in cases:
        extract_text(c)  # must not raise
    assert "ok words" in extract_text(cases[1])
    # an unclosed <script> swallows the rest of the document (the HTML5
    # tokenizer does the same: script data runs to </script>)
    assert extract_text(cases[2]) == ""


def test_determinism_digest():
    """One digest over a battery of inputs: any silent behavior change in
    the extractor flips this hash. Update ONLY with a conscious golden
    review (SURVEY.md §2.8 invariant 8)."""
    battery = [
        _PAGE,
        "<p>foo<b>bar</b>baz</p>",
        "<div><a>a</a> <a>b</a></div>",
        "<td>cell one</td><td>cell two</td>",
        "text &amp; entities &#233; &quot;",
        "<br>line<br/>breaks<hr>everywhere",
    ]
    h = hashlib.sha256()
    for case in battery:
        h.update(extract_text(case).encode())
        h.update(b"\x00")
    assert h.hexdigest() == (
        "a00ee45cf19a5402735797223b4fcb399d9bd6b810fa14fd11edf42c660e92ae"
    )


def _warc_record(url: str, html: str) -> bytes:
    body = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: 2024-01-02T03:04:05Z",
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def test_warc_seam_takes_extractor(spark, tmp_path):
    """The WARC ingest seam accepts the boilerplate extractor end to end
    (mapInPandas path included) and the default stays the regex heuristic."""
    from dedup_spark.sources.warc import read_warc_pages

    raw = _warc_record("https://x.example/p", _PAGE)
    boiler = parse_warc_bytes(raw, "seg", extractor=extract_text)
    assert boiler.loc[0, "text"] == _PAGE_GOLDEN
    plain = parse_warc_bytes(raw, "seg")
    assert "Acme Corp" in plain.loc[0, "text"]  # regex seam keeps chrome

    (tmp_path / "seg1.warc.gz").write_bytes(gzip.compress(raw))
    df = read_warc_pages(spark, str(tmp_path), extractor=extract_text)
    rows = df.select("url", "text").collect()
    assert rows[0]["text"] == _PAGE_GOLDEN


def test_fuzz_never_raises_and_deterministic():
    """Property fuzz (hypothesis): extract_text is total and deterministic
    on arbitrary tag-soup — the WARC task must survive any crawl bytes."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    frag = st.one_of(
        st.text(max_size=40),
        st.sampled_from([
            "<div>", "</div>", "<p class='nav'>", "<a href=x>", "</a>",
            "<script>", "</script>", "<br/>", "<![CDATA[", "]]>", "<!--",
            "-->", "&amp;", "&#xZZ;", "&#97;", "<x\x00y>", "< p >", "<>",
            "</", "<!DOCTYPE html>", "<nav>", "</nav>", "<b", "='",
        ]),
    )
    html = st.lists(frag, max_size=30).map("".join)

    @settings(max_examples=200, deadline=None)
    @given(html)
    def run(s):
        a = extract_text(s)
        assert a == extract_text(s)
        assert isinstance(a, str)

    run()


def test_implied_close_regressions():
    """Review-found failure modes of the original depth-counter design —
    each previously returned '' (total text loss). The stack with implied
    closes must keep the article text in all three."""
    # unclosed <li> menu items inside a chrome container
    assert extract_text(
        '<ul class="menu"><li>Home<li>About<li>Contact</ul>'
        "<p>Real article content.</p>"
    ) == "Real article content."
    # a VOID element carrying a chrome class has no subtree to drop
    assert extract_text(
        '<img class="banner" src="x.png"><p>Real article content.</p>'
    ) == "Real article content."
    # an unclosed <a> must not leak link state past its enclosing block
    assert extract_text(
        '<p><a href="x">link start<p>a longer real paragraph with plenty '
        "of words follows here</p><p>short block</p>"
    ) == (
        "a longer real paragraph with plenty of words follows here\n"
        "short block"
    )
    # soup that never closes <head>: body content must escape it
    assert extract_text(
        "<head><title>T</title><p>body text escaped the head"
    ) == "body text escaped the head"
    # implied closes are SCOPED: nested lists close the inner li only
    assert extract_text(
        "<ul><li>one<ul><li>inner a<li>inner b</ul><li>two</ul>"
    ) == "one\ninner a\ninner b\ntwo"


def test_depth_cap_linear_on_adversarial_nesting():
    """Pathological nesting must stay linear (stack capped), not O(n^2)."""
    import time

    soup = "<x>" * 20000 + "words survive here" + "</x>" * 20000
    t0 = time.perf_counter()
    out = extract_text(soup)
    assert time.perf_counter() - t0 < 5.0
    assert "words survive here" in out


def test_second_review_regressions():
    """Second review pass: tr-layering under omitted </tr>, skip triggers
    at the depth cap, and bare body data after head content."""
    # 600 rows of '<tr><td>a<td>b' (omitted end tags) must not accumulate
    # unclosed <tr>s to the depth cap — chrome/script after the table must
    # still be dropped
    rows = "".join("<tr><td>a<td>b" for _ in range(600))
    out = extract_text(
        "<table>" + rows + '</table><td class="banner">AD CHROME</td>'
        "<script>var x=9;</script><p>keep me</p>"
    )
    assert "AD CHROME" not in out and "var x" not in out
    assert "keep me" in out
    # a skip trigger arriving while the stack sits at the cap must still
    # engage (overflow counter), or boilerplate below depth 512 leaks
    out2 = extract_text(
        "<div>" * 512 + "<script>var secret=1;</script><p>real text here</p>"
    )
    assert "secret" not in out2 and "real text here" in out2
    # bare character data directly inside <head> is body content (HTML5
    # tree rules): it must close the head, not vanish with it
    assert extract_text(
        "<head><title>T</title>bare body text with no tags"
    ) == "bare body text with no tags"
    # ...but data inside a head <script> stays dropped
    assert extract_text(
        '<head><script>var x="hidden"</script></head><p>visible</p>'
    ) == "visible"
