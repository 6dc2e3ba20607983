"""Tag-aware boilerplate-stripping HTML text extraction (pure stdlib).

The production-grade sibling of ``warc.html_to_text``'s regex heuristic:
a real parse of the tag stream (``html.parser.HTMLParser``, no third-party
dependency) that understands document STRUCTURE — which the regex seam
cannot — so it can drop whole boilerplate subtrees and filter blocks by
link density, the two moves every practical extractor (Readability,
jusText, trafilatura) is built on. Fills the "swap in a real extractor at
the same seam" deploy note in sources/warc.py with something shippable
while staying dependency-free for this sandbox.

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

Element tracking is a real OPEN-TAG STACK with HTML5-style implied closes,
NOT a raw start/end counter — real crawl HTML leans hard on optional end
tags, and a counter silently desynchronizes on them (a ``<ul
class="menu"><li>..<li>..</ul>`` menu would otherwise leave the skip state
stuck on and drop the rest of the document — found by review, regression-
pinned in tests/test_extract.py):

- ``li``/``p``/``td``/``th``/``tr``/``dd``/``dt``/``option`` starting
  while a sibling of their close-group is open implies closing it (scoped:
  an ``li`` never reaches out of its ``ul``/``ol``, a ``td`` out of its
  ``table``).
- Any non-head-content tag implies ``</head>`` (soup commonly omits it).
- An end tag pops to its nearest matching open element, closing everything
  above it — so an unclosed ``<a>`` cannot leak link state past its
  enclosing block.
- Void elements (``br``/``img``/``input``...) never push: a void element
  carrying a chrome class (``<img class="banner">``) has no subtree to
  drop and must never toggle skip state.
- The stack depth is capped (``_MAX_DEPTH``): pathological nesting
  degrades to flat text instead of O(n²) scans — the WARC task must stay
  linear on adversarial crawl bytes.

Determinism: a pure function of the HTML string — no randomness, no
locale/environment dependence — pinned by golden-file tests
(tests/test_extract.py) per SURVEY.md §2.8 invariant 8, including a
property fuzz for totality. Malformed HTML degrades gracefully (stray end
tags ignored, unclosed elements closed by their ancestors), never raises.

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
# void elements never get an end tag: they must never enter the open stack
# (nor toggle skip state — they have no subtree to drop)
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)
# implied closes (HTML5 optional end tags): starting tag -> set of open
# sibling tags it closes, searched downward but never past a scope barrier
_CLOSES = {
    "li": frozenset({"li"}),
    "p": frozenset({"p"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
    "tr": frozenset({"td", "th", "tr"}),
    "dd": frozenset({"dd", "dt"}),
    "dt": frozenset({"dd", "dt"}),
    "option": frozenset({"option"}),
}
_SCOPE = {
    "li": frozenset({"ul", "ol"}),
    "td": frozenset({"table"}),
    "th": frozenset({"table"}),
    "tr": frozenset({"table"}),
    "dd": frozenset({"dl"}),
    "dt": frozenset({"dl"}),
    "option": frozenset({"select"}),
    # a <p> never implicitly closes a <p> outside its own block container
    "p": _BLOCK_TAGS - {"p"},
}
# tags that may live inside <head>; anything else implies </head>
_HEAD_CONTENT = frozenset(
    "head title meta link base style script noscript template".split()
)
_MAX_DEPTH = 512

_WS = re.compile(r"\s+")
_CLASS_SPLIT = re.compile(r"[\s_-]+")

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
        # open-element stack of (tag, is_skip_trigger); the two counters are
        # pure functions of it (number of trigger entries / of open <a>s),
        # maintained incrementally on push/pop
        self._stack: list[tuple[str, bool]] = []
        self._skip = 0
        self._link = 0
        self._head_idx = -1  # stack index of an open <head>, -1 if none
        # skip triggers arriving while the stack is at _MAX_DEPTH: the
        # element can't be pushed, but its subtree must STILL be dropped —
        # per-tag overflow counts let the matching end tag release the skip
        # (depth-cap degradation affects block segmentation only, never
        # skip semantics)
        self._overflow: dict[str, int] = {}

    # -- block plumbing -----------------------------------------------------
    def _flush(self) -> None:
        text = _WS.sub(" ", "".join(self._parts)).strip()
        if text:
            self.blocks.append((text, self._chars, self._link_chars))
        self._parts, self._chars, self._link_chars = [], 0, 0

    # -- stack plumbing -----------------------------------------------------
    def _push(self, tag: str, trigger: bool) -> None:
        if len(self._stack) >= _MAX_DEPTH:
            # degrade flat: deeper NESTING is treated as unnested — but a
            # skip trigger still engages (its end tag releases it via the
            # overflow count), or boilerplate below the cap would leak
            if trigger:
                self._overflow[tag] = self._overflow.get(tag, 0) + 1
                self._skip += 1
            return
        if tag == "head" and self._head_idx < 0:
            self._head_idx = len(self._stack)
        self._stack.append((tag, trigger))
        if trigger:
            self._skip += 1
        if tag == "a":
            self._link += 1

    def _pop_to(self, i: int) -> None:
        """Close stack[i] and everything above it; flush once if any popped
        element was a block (the accumulated text belongs to that block)."""
        block = False
        while len(self._stack) > i:
            tag, trigger = self._stack.pop()
            if trigger:
                self._skip -= 1
            if tag == "a":
                self._link -= 1
            block = block or tag in _BLOCK_TAGS
        if self._head_idx >= len(self._stack):
            self._head_idx = -1
        if block:
            self._flush()  # harmless while skipping: parts are empty

    def _implied_close(self, tag: str) -> None:
        # soup commonly omits </head>: any body-content tag closes it
        if self._head_idx >= 0 and tag not in _HEAD_CONTENT:
            self._pop_to(self._head_idx)
        closes = _CLOSES.get(tag)
        if not closes:
            return
        barriers = _SCOPE.get(tag, frozenset())
        # LOOP until no closeable element remains in scope: a starting <tr>
        # must close an open <td> AND the <tr> under it (legitimately
        # layered cells); a single pass would leave one unclosed <tr> on
        # the stack per omitted </tr> — 512 rows later the depth cap would
        # engage mid-table (review-found, regression-pinned). Sibling-only
        # closers (li/p/dd/dt) never layer, so the loop's second iteration
        # finds nothing and the scope barriers stop any runaway.
        while True:
            closed = False
            for i in range(len(self._stack) - 1, -1, -1):
                t = self._stack[i][0]
                if t in closes:
                    self._pop_to(i)
                    closed = True
                    break
                if t in barriers:
                    return
            if not closed:
                return

    # -- parser callbacks ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _VOID_TAGS:
            # no subtree: nothing to drop even for a chrome-classed void
            # element, and it can never be closed — never push, never
            # skip (and never pay the attrs scan: voids are the most
            # frequent tags in crawl HTML)
            if not self._skip and tag in _BLOCK_TAGS:
                self._flush()
            return
        trigger = (
            tag in _SKIP_TAGS or tag in _CHROME_TAGS or _is_chrome_attrs(attrs)
        )
        self._implied_close(tag)
        if trigger:
            self._flush()  # harmless while skipping: parts are empty
            self._push(tag, True)
            return
        if not self._skip and tag in _BLOCK_TAGS:
            self._flush()
        self._push(tag, False)

    def handle_startendtag(self, tag: str, attrs) -> None:  # <br/>, <hr/>
        if not self._skip and tag in _BLOCK_TAGS:
            self._flush()

    def handle_endtag(self, tag: str) -> None:
        if tag in _VOID_TAGS:
            return  # </br> and friends: browsers ignore them
        # a trigger held in the depth-cap overflow is the innermost match
        if self._overflow.get(tag):
            self._overflow[tag] -= 1
            self._skip -= 1
            return
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                self._pop_to(i)
                return
        # stray end tag (never opened): at most a block boundary
        if not self._skip and tag in _BLOCK_TAGS:
            self._flush()

    def handle_data(self, data: str) -> None:
        # bare body text directly inside <head> (no intervening start tag)
        # is body content per the HTML5 tree rules: close the head first or
        # the text would vanish with the head's skip subtree
        if (
            self._head_idx == len(self._stack) - 1
            and self._head_idx >= 0
            and data.strip()
        ):
            self._pop_to(self._head_idx)
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
