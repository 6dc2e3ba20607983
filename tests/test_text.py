"""Text function tests: normalization golden pins (SURVEY.md §7.3 #1),
shingling vs a Python oracle, analysis expressions."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup_spark.functions.text import (
    fingerprint,
    lang_id_expr,
    normalize_text,
    quality_features,
    shingles,
    token_count,
)


def _eval(spark, col, rows):
    df = spark.createDataFrame([(r,) for r in rows], "text string")
    return [r[0] for r in df.select(col.alias("v")).collect()]


# Golden pins: normalization is the byte-identity-critical pure function.
NORMALIZE_GOLDEN = [
    ("Hello  World", "hello world"),
    ("  A\tB\nC  ", "a b c"),
    ("", ""),
    ("   \t \n ", ""),
    ("MiXeD CaSe", "mixed case"),
    ("a  b", "a b"),
]


def test_normalize_golden(spark):
    got = _eval(spark, normalize_text("text"), [g[0] for g in NORMALIZE_GOLDEN])
    assert got == [g[1] for g in NORMALIZE_GOLDEN]


def test_token_count(spark):
    got = _eval(spark, token_count("text"), ["a b c", "", "  ", "one"])
    assert got == [3, 0, 0, 1]


def test_shingles_match_python_oracle(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b c d e",
        "a b c",  # < k words -> whole-doc shingle
        "x x x x x x x",  # repeated -> distinct
        "",
    ]

    def oracle(t, k=5):
        w = t.split()
        if not w:
            return set()
        if len(w) < k:
            return {" ".join(w)}
        return {" ".join(w[i : i + k]) for i in range(len(w) - k + 1)}

    got = _eval(spark, shingles("text", 5), texts)
    for t, g in zip(texts, got):
        assert set(g) == oracle(t), t


def test_quality_features(spark):
    feats = quality_features("text")
    df = spark.createDataFrame(
        [("the cat and the dog in the house is big",), ("!!! ??? ###",)],
        "text string",
    )
    rows = df.select(*[v.alias(k) for k, v in feats.items()]).collect()
    good, junk = rows
    assert good.n_tokens == 10
    assert good.stopword_ratio > 0.3
    assert junk.punct_ratio > 0.8
    assert good.quality_score > junk.quality_score


def test_lang_id(spark):
    got = _eval(
        spark,
        lang_id_expr("text"),
        [
            "the cat and the dog is in that house for now",
            "le chat et la vache est une chose pour demain",
            "el perro y la casa los gatos que en madrid es",
            "der hund und die katze ist von den bergen mit",
            "zzz qqq xxx",
        ],
    )
    assert got == ["en", "fr", "es", "de", "und"]


def test_fingerprint_deterministic(spark):
    texts = ["one two three four five six seven eight nine ten"] * 2 + ["other words"]
    got = _eval(spark, fingerprint("text"), texts)
    assert got[0] == got[1]
    assert got[0] != got[2]
