"""Deterministic synthetic webtext corpus with planted duplicate structure.

Implements FIXTURES.md: generates the input_hint table
(url, warc_ts, html, text, lang, source) plus golden cluster/pair fixtures
computed exactly at generation time. Fixed seed, no wall clock, no external
data — the same (seed, size) always produces byte-identical tables, which is
what pins the extractor/normalization golden tests (SURVEY.md §7.3 #1).

Planted structure (dup_kind):
  exact      — identical text, distinct urls (sizes 2, 3, 5, 20)
  near       — shared-prefix variants at target 5-shingle Jaccard levels;
               true Jaccard computed exactly with Python sets and recorded
  prefix     — identical first-N words, divergent tails (collision stand-ins)
  substring  — distinct docs sharing one >=200-word verbatim run
  boiler     — ~5% of filler docs share a template prefix (hot LSH buckets)
  degenerate — empty/whitespace text, repeated url with different warc_ts
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

import numpy as np
import pandas as pd

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)
VOCAB_SIZE = 2000
NEAR_TARGETS = (0.95, 0.85, 0.75, 0.55, 0.35)


def _vocab() -> list[str]:
    return [f"w{i:04d}" for i in range(VOCAB_SIZE)]


def _shingle_set(words: list[str], k: int = 5) -> set[str]:
    if not words:
        return set()
    if len(words) < k:
        return {" ".join(words)}
    return {" ".join(words[i : i + k]) for i in range(len(words) - k + 1)}


def _jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 0.0
    return len(a & b) / len(a | b)


@dataclass
class Corpus:
    pages: pd.DataFrame
    golden_clusters: pd.DataFrame  # url, cluster_id, is_representative, dup_kind
    golden_pairs: pd.DataFrame  # url_a, url_b, true_jaccard, expected
    theta: float = 0.7
    groups: list = field(default_factory=list)


class _Builder:
    def __init__(self, seed: int):
        self.rng = np.random.default_rng(seed)
        self.vocab = np.array(_vocab())
        self.rows: list[dict] = []
        self.pair_rows: list[dict] = []
        self.group_rows: list[tuple[list[str], str]] = []  # (urls, dup_kind)
        self.n = 0

    def words(self, n: int) -> list[str]:
        return list(self.vocab[self.rng.integers(0, VOCAB_SIZE, size=n)])

    def add(self, text: str, source_i: int | None = None, ts_off: int | None = None,
            url: str | None = None) -> str:
        i = self.n
        self.n += 1
        src = f"src{source_i if source_i is not None else int(self.rng.integers(0, 4))}"
        off = ts_off if ts_off is not None else i
        u = url or f"https://site{i % 37}.example/p{i:06d}"
        self.rows.append(
            {
                "url": u,
                "warc_ts": EPOCH + timedelta(seconds=int(off)),
                "html": f"<html><body>{text}</body></html>".encode(),
                "text": text,
                "lang": "en" if i % 10 else "fr",
                "source": src,
            }
        )
        return u

    def add_group(self, texts: list[str], dup_kind: str, theta: float) -> None:
        urls = []
        shs = [_shingle_set(t.split()) for t in texts]
        for j, t in enumerate(texts):
            # vary source + ts so keep-policy tests bite
            urls.append(self.add(t, source_i=(j % 4), ts_off=self.n * 10 + (len(texts) - j)))
        for x in range(len(urls)):
            for y in range(x + 1, len(urls)):
                tj = _jaccard(shs[x], shs[y])
                ua, ub = sorted((urls[x], urls[y]))
                self.pair_rows.append(
                    {"url_a": ua, "url_b": ub, "true_jaccard": tj,
                     "expected": (texts[x] == texts[y]) or tj >= theta}
                )
        self.group_rows.append((urls, dup_kind))


def make_corpus(
    n_rows: int = 1000,
    seed: int = 42,
    theta: float = 0.7,
    near_groups_per_level: int = 1,
) -> Corpus:
    b = _Builder(seed)

    # 1. exact-dup sets
    for size in (2, 3, 5, 20):
        t = " ".join(b.words(120))
        b.add_group([t] * size, "exact", theta)

    # 2. near-dup sets at target Jaccard levels: shared prefix + fresh tail.
    # For docs of m shingles sharing s: J = s / (2m - s) -> s = 2mJ/(1+J).
    # `near_groups_per_level` > 1 plants many independent groups per level
    # (recall benches need a large planted-pair sample; defaults unchanged).
    for target in NEAR_TARGETS:
        for _g in range(near_groups_per_level):
            m = 150  # shingles per doc (tokens = m + 4)
            s = int(round(2 * m * target / (1 + target)))
            shared = b.words(s + 4)
            texts = []
            for _ in range(2):
                tail = b.words(m - s)  # fresh region incl. boundary shingles
                texts.append(" ".join(shared + tail))
            b.add_group(texts, "near", theta)

    # 3. collision stand-ins: identical first 40 words, divergent tails
    head = b.words(40)
    b.add_group([" ".join(head + b.words(100)) for _ in range(3)], "prefix", theta)

    # 4. long-shared-substring pairs (low Jaccard, suffix-array channel)
    run = b.words(220)
    b.add_group(
        [" ".join(b.words(400) + run + b.words(400)) for _ in range(2)],
        "substring", theta,
    )

    # 6a. degenerates: empty / whitespace-only (must be excluded)
    b.add("")
    b.add("   \t  \n ")
    # 6b. same url twice with different warc_ts (identity dedup at ingest)
    dup_url = "https://siteX.example/repeat"
    b.add(" ".join(b.words(90)), url=dup_url, ts_off=5)
    b.add(" ".join(b.words(90)), url=dup_url, ts_off=99999)

    # 5 + filler: boilerplate cohort (~5%) + unique singletons
    boiler = b.words(30)
    while b.n < n_rows:
        if b.rng.random() < 0.05:
            b.add(" ".join(boiler + b.words(int(b.rng.integers(60, 140)))))
        else:
            b.add(" ".join(b.words(int(b.rng.integers(40, 200)))))

    pages = pd.DataFrame(b.rows)

    # golden clusters: components of expected pairs (groups are disjoint by
    # construction, so each planted group splits into its >=theta components)
    import itertools

    cl_rows = []
    keep_rank = {
        r["url"]: (int(r["source"][3:]), r["warc_ts"], r["url"])
        for r in b.rows
    }
    expected_pairs = {
        (p["url_a"], p["url_b"]) for p in b.pair_rows if p["expected"]
    }
    for urls, kind in b.group_rows:
        # union-find within the group on expected pairs
        parent = {u: u for u in urls}

        def find(u):
            while parent[u] != u:
                parent[u] = parent[parent[u]]
                u = parent[u]
            return u

        for ua, ub in itertools.combinations(sorted(urls), 2):
            if (ua, ub) in expected_pairs:
                ra, rb = find(ua), find(ub)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
        comps: dict[str, list[str]] = {}
        for u in urls:
            comps.setdefault(find(u), []).append(u)
        for comp in comps.values():
            if len(comp) < 2:
                continue
            cid = min(comp)
            rep = min(comp, key=lambda u: keep_rank[u])
            for u in comp:
                cl_rows.append(
                    {"url": u, "cluster_id": cid,
                     "is_representative": u == rep, "dup_kind": kind}
                )

    golden_clusters = pd.DataFrame(cl_rows)
    golden_pairs = pd.DataFrame(b.pair_rows)
    return Corpus(pages, golden_clusters, golden_pairs, theta, b.group_rows)


def synth_pages_spark(
    spark,
    n_rows: int,
    seed: int = 42,
    vocab: int = 20000,
    n_sources: int = 4,
):
    """Large deterministic input_hint corpus generated ENTIRELY JVM-side.

    spark.range + xxhash64-derived words: distributed, no Python in the loop,
    byte-identical for a given (n_rows, seed) at any parallelism — the
    generator a 100 TB bench would actually use (drive-side pandas generation
    caps out at ~10^5 rows).

    Planted structure: ids with id % 100 < 8 share their text with their
    4-block (groups of up to 4 exact dups, ~8% of rows); everything else is
    unique. Token counts 80..200.
    """
    from pyspark.sql import functions as F

    df = spark.range(n_rows)
    text_seed = F.when(
        F.pmod("id", F.lit(100)) < 8, F.col("id") - F.pmod("id", F.lit(4))
    ).otherwise(F.col("id"))
    n_tokens = (F.pmod(F.xxhash64(F.lit(seed), text_seed), F.lit(121)) + 80)
    words = F.transform(
        F.sequence(F.lit(1), n_tokens),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit(seed), text_seed, i), F.lit(vocab)).cast("string"),
        ),
    )
    return df.select(
        F.concat(F.lit("https://synth.example/p"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat_ws(" ", words).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(n_sources)).cast("string")).alias(
            "source"
        ),
    )


def corpus_to_spark(spark, corpus: Corpus):
    """pages as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType(
        [
            StructField("url", StringType()),
            StructField("warc_ts", TimestampType()),
            StructField("html", BinaryType()),
            StructField("text", StringType()),
            StructField("lang", StringType()),
            StructField("source", StringType()),
        ]
    )
    return spark.createDataFrame(corpus.pages, schema)
