"""Tag-aware boilerplate-stripping HTML text extraction (pure stdlib).

The production-grade sibling of ``warc.html_to_text``'s regex heuristic:
a real parse of the tag stream (``html.parser.HTMLParser``, no third-party
dependency) that understands document STRUCTURE — which the regex seam
cannot — so it can drop whole boilerplate subtrees and filter blocks by
link density, the two moves every practical extractor (Readability,
jusText, trafilatura) is built on. Fills the "swap in a real extractor at the same
seam" deploy note in sources/warc.py with something shippable while staying
dependency-free for this sandbox.

What it does, in document order:

1. **Subtree drops**: everything under ``script``/``style``/``noscript``/
   ``template``/``svg``/``head``/``iframe``/``object`` disappears (not
   text), and so do the explicit boilerplate containers ``nav``/``header``/
   ``footer``/``aside`` and any element carrying an id/class token that
   names chrome (``nav``, ``menu``, ``sidebar``, ``footer``, ``header``,
   ``breadcrumb``, ``cookie``, ``banner`` — token match, not substring, so
   ``navy`` or ``headline`` never false-positive).
2. **Block segmentation**: block-level tags (``p``, ``div``, ``li``,
   headings, table rows, ``br``...) close the current text block; inline
   tags (``a``, ``span``, ``b``...) do not, so "foo<b>bar</b>" stays one
   word-run where the regex seam would split it.
3. **Link-density filtering**: per block, characters contributed inside
   ``<a>`` are tracked separately; a block that is mostly links AND short
   (``link_chars / chars > 0.5`` and fewer than 10 words) is navigation
   chrome and is dropped. Long link-heavy blocks (reference lists) survive.
4. Entities decode via the parser (``convert_charrefs``), whitespace
   collapses within blocks, blocks join with ``"\\n"``.

Determinism: a pure function of the HTML string — no randomness, no
locale/environment dependence — pinned by golden-file tests
(tests/test_extract.py) per SURVEY.md §2.8 invariant 8. Malformed HTML
(unclosed tags, stray end tags) degrades gracefully: skip/link depths are
counters clamped at zero, so the extractor never throws on real crawl data.

Spark shape: called per document inside the existing WARC ``mapInPandas``
ingest (one task per archive file, zero shuffle) — swapping extractors
changes no plan, only the per-row function.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# subtrees whose text must never surface
_SKIP_TAGS = frozenset(
    "script style noscript template svg head iframe object".split()
)
# explicit boilerplate containers (HTML5 sectioning chrome)
_CHROME_TAGS = frozenset("nav header footer aside".split())
# id/class TOKENS that mark chrome containers (token equality, not substring)
_CHROME_TOKENS = frozenset(
    "nav navbar menu sidebar footer header breadcrumb breadcrumbs "
    "cookie banner".split()
)
# tags that terminate the current text block
_BLOCK_TAGS = frozenset(
    "p div li ul ol h1 h2 h3 h4 h5 h6 tr td th table blockquote pre "
    "article section main figure figcaption dd dt dl form hr br "
    "title body html".split()
)
_WS = re.compile(r"\s+")
_CLASS_SPLIT = re.compile(r"[\s_-]+")
# void elements never get an end tag: they must not count toward the
# skipped-subtree depth or the depth would never return to zero
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)

# link-density rule: a block that is mostly anchor text AND short is chrome
_LINK_RATIO_MAX = 0.5
_LINK_MIN_WORDS = 10


def _is_chrome_attrs(attrs: list[tuple[str, str | None]]) -> bool:
    for k, v in attrs:
        if k in ("id", "class", "role") and v:
            for tok in _CLASS_SPLIT.split(v.lower()):
                if tok in _CHROME_TOKENS:
                    return True
    return False


class _Extractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[tuple[str, int, int]] = []  # (text, chars, link_chars)
        self._parts: list[str] = []
        self._chars = 0
        self._link_chars = 0
        # skipped-subtree depth: a trigger element (skip/chrome tag, or any
        # element with a chrome id/class token) sets depth 1; every nested
        # non-void start tag increments, every end tag decrements, and text
        # only flows at depth 0. A depth COUNTER (not a tag stack) stays
        # deterministic on malformed HTML — stray end tags clamp at zero.
        self._skip = 0
        self._link = 0

    # -- block plumbing -----------------------------------------------------
    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, self._chars, self._link_chars))
        self._parts, self._chars, self._link_chars = [], 0, 0

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if self._skip:
            if tag not in _VOID_TAGS:
                self._skip += 1
            return
        if tag in _SKIP_TAGS or tag in _CHROME_TAGS or _is_chrome_attrs(attrs):
            self._flush()
            self._skip = 1
            return
        if tag == "a":
            self._link += 1
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_startendtag(self, tag: str, attrs) -> None:  # <br/>, <hr/>
        if self._skip:
            return
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if self._skip:
            if tag not in _VOID_TAGS:
                self._skip -= 1
            return
        if tag == "a":
            self._link = max(0, self._link - 1)
        if tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        if self._skip or not data:
            return
        self._parts.append(data)
        n = len(data.strip())
        self._chars += n
        if self._link:
            self._link_chars += n


def extract_text(html: str) -> str:
    """HTML -> boilerplate-stripped text (pure, deterministic; see module
    docstring for the rules). Degrades to best-effort on malformed input —
    never raises on crawl data."""
    p = _Extractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # HTMLParser is robust in practice; any residual parse explosion
        # falls back to whatever blocks were already collected
        pass
    p._flush()
    kept = []
    for text, chars, link_chars in p.blocks:
        if chars > 0 and link_chars / chars > _LINK_RATIO_MAX:
            if len(text.split()) < _LINK_MIN_WORDS:
                continue
        kept.append(text)
    return "\n".join(kept)
