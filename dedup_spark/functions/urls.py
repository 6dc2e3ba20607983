"""URL canonicalization — crawl-side identity dedup for webtext pipelines.

Common Crawl frontiers see the same page under many spellings (fragment
anchors, tracking params, default ports, case-variant hosts, trailing
slashes); canonicalizing urls BEFORE content dedup collapses those for free
— the reference's hardlink-identity analogue (S7,
/root/reference/src/find_duplicates_base.cpp:16-140 skips same-inode files)
lifted to the web: same canonical url == same fetch identity.

Pure JVM column expressions (regexp/string ops, no UDF, whole-stage
codegen). Every regex sticks to the common subset of Java regex and RE2 (no
lookaround) so the DuckDB oracle can mirror the spec exactly; the
transformation order below IS the spec:

  1. trim surrounding whitespace
  2. drop the fragment ('#...' to end)
  3. lowercase the scheme://host[:port] prefix (path/query stay case-exact)
  4. drop default ports (:80 for http, :443 for https)
  5. drop tracking params (utm_*, fbclid, gclid) wherever they sit in the
     query string, keeping the separators of surviving params intact
  6. drop a now-dangling trailing '?' or '&'
  7. drop one trailing '/' (host roots and directory spellings merge;
     'scheme://' itself never matches)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# params that never change page identity (analytics attribution only)
_TRACKING = r"(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*"


def canonical_url(col: Column | str) -> Column:
    """Canonical form of a url column (see module docstring for the spec)."""
    u = F.trim(F.col(col) if isinstance(col, str) else col)
    u = F.regexp_replace(u, r"#.*", "")
    # lowercase only the scheme://host[:port] prefix, drop default ports
    pre = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*", 0)
    rest = u.substr(F.length(pre) + 1, F.length(u))
    pre = F.lower(pre)
    pre = F.regexp_replace(pre, r"^(http://[^/:?]*):80$", "$1")
    pre = F.regexp_replace(pre, r"^(https://[^/:?]*):443$", "$1")
    u = F.concat(pre, rest)
    # tracking params: first those followed by another param (eat their '&'),
    # then a trailing/lone one (eat its leading '?' or '&')
    u = F.regexp_replace(u, _TRACKING + r"&", "")
    u = F.regexp_replace(u, r"[?&]" + _TRACKING, "")
    u = F.regexp_replace(u, r"[?&]$", "")
    u = F.regexp_replace(u, r"([^/])/$", "$1")
    return u
