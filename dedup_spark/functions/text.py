"""Text normalization, tokenization, shingling, and analysis expressions.

All JVM-side (whole-stage codegen): `split` + higher-order `transform`/`slice`
build word shingles without any Python in the hot path. The shingling spec is
the north rule's k=5 *word* shingles; hashing each shingle with `xxhash64`
mirrors the reference's signature hashing (XXH3 at
/root/reference/src/utilities.cpp:105-202 — same family, equality semantics
preserved, digests intentionally not compared across engines).

Normalization is the byte-identity-critical pure function (SURVEY.md §7.3 #1):
lowercase, collapse all whitespace runs to single spaces, trim. Pinned by
golden tests in tests/test_text.py.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_text(col: Column | str) -> Column:
    """Deterministic text normalization: lowercase, collapse whitespace, trim.

    Must remain a pure function of its input — the per-row invariant of
    BASELINE.json's input_hint hangs on this.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of normalized text; empty text -> empty array."""
    c = normalize_text(col)
    return F.when(c == "", F.array().cast("array<string>")).otherwise(
        F.split(c, " ")
    )


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def shingles(col: Column | str, k: int) -> Column:
    """Distinct k-word shingles as strings (JVM higher-order functions).

    transform(sequence(1, n-k+1), i -> concat_ws(' ', slice(words, i, k)))
    then array_distinct. Docs with < k words yield a single whole-doc shingle
    (so short docs still participate in near-dup detection rather than
    silently vanishing).
    """
    w = tokens(col)
    n = F.size(w)
    sliding = F.transform(
        F.sequence(F.lit(1), n - F.lit(k) + 1),
        lambda i: F.concat_ws(" ", F.slice(w, i, F.lit(k))),
    )
    short = F.array(F.concat_ws(" ", w))
    return F.when(n <= F.lit(0), F.array().cast("array<string>")).otherwise(
        F.array_distinct(F.when(n < F.lit(k), short).otherwise(sliding))
    )


def shingle_hashes(col: Column | str, k: int) -> Column:
    """xxhash64 of each distinct shingle -> array<long>; the MinHash input."""
    return F.transform(shingles(col, k), lambda s: F.xxhash64(s))


# --- text analysis for training-data pipelines -------------------------------

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "fr": ["le", "la", "les", "et", "de", "un", "une", "est", "que", "pour"],
    "es": ["el", "la", "los", "las", "y", "de", "que", "en", "es", "por"],
    "de": ["der", "die", "das", "und", "ist", "von", "den", "mit", "für", "auf"],
}


def quality_features(col: Column | str) -> dict[str, Column]:
    """Heuristic document-quality features, all JVM-side.

    Returns named columns: n_chars, n_tokens, mean_token_len, punct_ratio,
    stopword_ratio (en), quality_score in [0,1].
    """
    c = normalize_text(col)
    toks = tokens(col)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    mean_tok = F.when(n_tokens > 0, n_chars.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    punct = F.length(F.regexp_replace(c, r"[^!-\/:-@\[-`{-~]", ""))
    punct_ratio = F.when(n_chars > 0, punct.cast("double") / n_chars).otherwise(
        F.lit(0.0)
    )
    sw = F.array(*[F.lit(s) for s in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    stop_ratio = F.when(n_tokens > 0, n_stop.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    # score: long-enough, mostly-alphabetic, some stopwords
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 4, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 5, F.lit(1.0)) * 0.3
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "mean_token_len": mean_tok,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "quality_score": score,
    }


def lang_stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens that are stopwords of `lang` (JVM-side)."""
    toks = tokens(col)
    sw = F.array(*[F.lit(s) for s in _STOPWORDS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))


def lang_id_expr(col: Column | str) -> Column:
    """Heuristic language id: argmax of per-language stopword hit counts,
    'und' (undetermined) when no stopword of any language is present.
    Deterministic tie-break: language name ascending."""
    hits = [(lang, lang_stopword_hits(col, lang)) for lang in sorted(_STOPWORDS)]
    best = F.lit("und")
    best_n = F.lit(0)
    for lang, h in hits:
        is_better = h > best_n
        best = F.when(is_better, F.lit(lang)).otherwise(best)
        best_n = F.when(is_better, h).otherwise(best_n)
    return best


def fingerprint(col: Column | str, k: int = 8) -> Column:
    """Rolling-style document fingerprint: min xxhash64 over k-word shingles
    (a 1-permutation MinHash — cheap content signature for sampling and
    winnowing-style selection). JVM-side."""
    hs = shingle_hashes(col, k)
    return F.when(F.size(hs) > 0, F.array_min(hs)).otherwise(F.lit(None).cast("long"))
