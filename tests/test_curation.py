"""Unit tests for training-data curation operators (operators/curation.py):
quality gate thresholds, incremental near-dup matching (incl. the explicit
max_shingle_df recall trade), decontamination counts, and packing math.
Oracle parity at sf0.001 rides tests/test_entry.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from dedup_spark.functions.text import shingle_hashes
from dedup_spark.operators.curation import (
    decontaminate,
    incremental_near_dups,
    pack_tokens,
    quality_filter,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _with_sh(df, k=3):
    return df.select("doc_id", shingle_hashes("text", k).alias("shingle_hashes"))


GOOD = "the cat sat on the mat and it was a very fine day for all of us " * 2


def test_quality_filter_thresholds(spark):
    df = _docs(
        spark,
        [
            (1, GOOD),  # long, diverse, stopword-rich -> keep
            (2, "spam " * 40),  # top_token_frac = 1.0 -> drop
            (3, "the cat sat"),  # 3 tokens < 20 -> drop
            (4, "alpha beta gamma delta " * 10),  # no stopwords -> drop
            (5, "   "),  # empty after normalize -> n_tokens 0 -> drop
        ],
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in quality_filter(df, min_tokens=20).collect()
    }
    assert got[1]["keep"] is True
    assert got[2]["keep"] is False and got[2]["top_token_frac"] == 1.0
    assert got[3]["keep"] is False and got[3]["n_tokens"] == 3
    assert got[4]["keep"] is False and got[4]["stopword_ratio"] == 0.0
    assert got[5]["keep"] is False and got[5]["n_tokens"] == 0


def test_quality_filter_top_token_frac(spark):
    # 10 tokens, 'the' appears 3x -> top frac 0.3; stopword ratio 0.3
    df = _docs(spark, [(1, "the fish the bird the cow ate red tasty grass")])
    row = quality_filter(df).collect()[0]
    assert row["n_tokens"] == 10
    assert abs(row["top_token_frac"] - 0.3) < 1e-9
    assert abs(row["stopword_ratio"] - 0.3) < 1e-9


def test_incremental_near_dups_matches(spark):
    base = _with_sh(
        _docs(
            spark,
            [
                (10, "aa bb cc dd ee ff gg hh"),
                (11, "aa bb cc dd ee ff gg hh"),  # exact copy inside base
                (12, "zz yy xx ww vv uu tt ss"),
            ],
        )
    )
    delta = _with_sh(
        _docs(
            spark,
            [
                (100, "aa bb cc dd ee ff gg hh"),  # exact dup -> canonical 10
                (101, "aa bb cc dd ee ff gg qq"),  # near dup of 10/11
                (102, "mm nn oo pp qq rr ss tt"),  # new
            ],
        )
    )
    got = {
        r["doc_id"]: r.asDict()
        for r in incremental_near_dups(
            delta, base, threshold=0.5, id_col="doc_id"
        ).collect()
    }
    assert got[100]["status"] == "dup"
    assert got[100]["canonical_id"] == 10  # min matching base id
    assert got[100]["best_jaccard"] == 1.0
    assert got[101]["status"] == "dup" and got[101]["best_jaccard"] < 1.0
    assert got[102]["status"] == "new"
    assert got[102]["canonical_id"] is None


def test_incremental_near_dups_shingle_df_prune(spark):
    # every base doc shares the boilerplate line; delta doc 100 matches base
    # ONLY via that boilerplate (J=1 vs doc 10). With max_shingle_df=1 the
    # hot shingles are dropped from the base index -> no candidate -> 'new'
    # (the documented, explicit recall trade).
    boiler = "subscribe to our newsletter now"
    base = _with_sh(
        _docs(spark, [(10, boiler), (11, boiler), (12, boiler)]), k=5
    )
    delta = _with_sh(_docs(spark, [(100, boiler)]), k=5)
    dup = incremental_near_dups(delta, base, 0.5, id_col="doc_id").collect()[0]
    assert dup["status"] == "dup" and dup["canonical_id"] == 10
    pruned = incremental_near_dups(
        delta, base, 0.5, id_col="doc_id", max_shingle_df=1
    ).collect()[0]
    assert pruned["status"] == "new"


def test_decontaminate_counts_distinct_overlap(spark):
    ev = _with_sh(_docs(spark, [(1, "aa bb cc dd ee")]))  # 3-shingles x3
    tr = _with_sh(
        _docs(
            spark,
            [
                (10, "aa bb cc dd ee ff"),  # shares 3 of its 4 shingles
                (11, "zz yy xx ww vv"),  # clean -> absent from output
            ],
        )
    )
    got = {r["doc_id"]: r["n_contaminated_shingles"]
           for r in decontaminate(tr, ev, id_col="doc_id").collect()}
    assert got == {10: 3}


def test_pack_tokens_offsets(spark):
    df = spark.createDataFrame(
        [
            (1, "s1", "a b c d"),          # 4 tokens, start 0  -> pack 0 pos 0
            (2, "s1", " ".join(["t"] * 5)),  # start 4  -> pack 0 pos 4
            (3, "s1", "x y z"),            # start 9  -> pack 1 pos 1
            (4, "s2", "q r"),              # other shard restarts at 0
        ],
        "doc_id long, source string, text string",
    )
    got = {
        r["doc_id"]: (r["pack_id"], r["pack_pos"], r["n_tokens"])
        for r in pack_tokens(df, budget=8).collect()
    }
    assert got[1] == (0, 0, 4)
    assert got[2] == (0, 4, 5)
    assert got[3] == (1, 1, 3)
    assert got[4] == (0, 0, 2)


def test_chunk_documents_boundaries(spark):
    from dedup_spark.operators.curation import chunk_documents

    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(10))),  # 10 toks -> 1 chunk
            (2, " ".join(f"t{i}" for i in range(8))),   # == chunk_size -> 1
            (3, " ".join(f"t{i}" for i in range(9))),   # size+1 -> 2 chunks
            (4, "   "),                                  # empty -> 0 chunks
        ],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_n_tokens"])
        for r in chunk_documents(df, chunk_size=8, stride=4).collect()
    }
    by_doc = {}
    for (d, i) in got:
        by_doc.setdefault(d, []).append(i)
    assert sorted(by_doc[1]) == [0, 1]  # 10 toks, stride 4: starts 0 and 4
    assert by_doc[2] == [0]
    assert sorted(by_doc[3]) == [0, 1]
    assert 4 not in by_doc
    # overlap: chunk 1 of doc 1 starts at token 4 and has the remaining 6
    assert got[(1, 1)] == (" ".join(f"t{i}" for i in range(4, 10)), 6)
    assert got[(1, 0)][1] == 8


def test_stratified_sample_budget_and_determinism(spark):
    from dedup_spark.operators.curation import stratified_sample

    rows = [(i, "big", "tok " * 50) for i in range(200)]  # 10_000 tokens
    rows += [(1000 + i, "small", "tok " * 10) for i in range(10)]  # 100 tokens
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    # budget 2000 -> 1000/shard: big downsamples to ~10%, small passes whole
    got = stratified_sample(df, token_budget=2000).collect()
    small = [r for r in got if r["source"] == "small"]
    big = [r for r in got if r["source"] == "big"]
    assert len(small) == 10 and all(r["rate64k"] == 65536 for r in small)
    assert 0 < len(big) < 200
    rate = big[0]["rate64k"]
    assert rate == (1000 * 65536) // 10_000
    # deterministic: the exact same id set on a rerun
    again = {r["doc_id"] for r in stratified_sample(df, token_budget=2000).collect()}
    assert again == {r["doc_id"] for r in got}


def test_keyword_extract_integer_ranking(spark):
    from dedup_spark.operators.curation import keyword_extract

    df = _docs(
        spark,
        [
            # doc 1: 'cat' tf=3; 'dog'/'ant' tf=2 tie -> df breaks it:
            # 'dog' appears in doc 2 too (df=2), 'ant' only here (df=1)
            (1, "cat cat cat dog dog ant ant zz"),
            (2, "dog bird bird"),
        ],
    )
    got = {
        (r["doc_id"], r["rank"]): (r["token"], r["tf"], r["df"])
        for r in keyword_extract(df, top_k=3).collect()
    }
    assert got[(1, 1)] == ("cat", 3, 1)
    assert got[(1, 2)] == ("ant", 2, 1)  # rarer corpus-wide than 'dog'
    assert got[(1, 3)] == ("dog", 2, 2)
    assert got[(2, 1)] == ("bird", 2, 1)
    assert got[(2, 2)] == ("dog", 1, 2)
    assert (2, 3) not in got  # doc 2 has only 2 distinct tokens


def test_dedup_segments_first_occurrence_wins(spark):
    from dedup_spark.operators.curation import dedup_segments

    # window=4: doc 1 = [A|B], doc 2 = [X|A] (A repeats, aligned), doc 3 = [A]
    a, b, x = "a1 a2 a3 a4", "b1 b2 b3 b4", "x1 x2 x3 x4"
    df = _docs(spark, [(1, f"{a} {b}"), (2, f"{x} {a}"), (3, a)])
    got = {
        r["doc_id"]: r.asDict() for r in dedup_segments(df, window=4).collect()
    }
    assert got[1] == {
        "doc_id": 1, "text_clean": f"{a} {b}", "n_segs": 2, "n_dropped": 0
    }
    assert got[2] == {
        "doc_id": 2, "text_clean": x, "n_segs": 2, "n_dropped": 1
    }
    # every segment dropped -> the doc survives with empty text
    assert got[3] == {
        "doc_id": 3, "text_clean": "", "n_segs": 1, "n_dropped": 1
    }


def test_dedup_segments_partial_tail_and_empty(spark):
    from dedup_spark.operators.curation import dedup_segments

    # 6 tokens at window=4 -> segments [t1..t4], [t5 t6]; the 2-token tail is
    # a real segment and dedups only on exact match; empty docs emit no row
    df = _docs(
        spark,
        [(1, "t1 t2 t3 t4 t5 t6"), (2, "t5 t6"), (3, "t5 t6 t7"), (4, "  ")],
    )
    got = {
        r["doc_id"]: r.asDict() for r in dedup_segments(df, window=4).collect()
    }
    assert got[1]["n_segs"] == 2 and got[1]["n_dropped"] == 0
    assert got[2] == {
        "doc_id": 2, "text_clean": "", "n_segs": 1, "n_dropped": 1
    }
    assert got[3] == {
        "doc_id": 3, "text_clean": "t5 t6 t7", "n_segs": 1, "n_dropped": 0
    }
    assert 4 not in got


def test_dedup_segments_partitioning_invariant(spark):
    from dedup_spark.operators.curation import dedup_segments

    rows = [(i, f"w{i % 7} common block here pad{i}") for i in range(40)]
    df = _docs(spark, rows)
    base = sorted(
        tuple(r) for r in dedup_segments(df, window=3).collect()
    )
    shuffled = sorted(
        tuple(r)
        for r in dedup_segments(df.repartition(13), window=3).collect()
    )
    assert base == shuffled


def test_redact_pii_sequential_counts(spark):
    from dedup_spark.operators.curation import redact_pii

    rows = [
        # one of each PII type
        (1, "mail a.b+c@ex-site.co.uk ip 192.168.0.1 tel (555) 123-4567 end"),
        # phone-like digits inside an email local part must NOT double-count:
        # the email pass rewrites it first, sequential semantics pin this
        (2, "contact 555-123-4567@spam.org now"),
        # clean doc passes through untouched
        (3, "no identifiers here at all"),
        # two emails, ip glued to text without word chars still matches \b
        (4, "x@y.io,z@w.dev (10.0.0.42)"),
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in redact_pii(_docs(spark, rows)).collect()
    }
    assert got[1]["text_redacted"] == "mail <EMAIL> ip <IP> tel <PHONE> end"
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_phones"]) == (1, 1, 1)
    assert got[2]["text_redacted"] == "contact <EMAIL> now"
    assert (got[2]["n_emails"], got[2]["n_ips"], got[2]["n_phones"]) == (1, 0, 0)
    assert got[3]["text_redacted"] == rows[2][1]
    assert (got[3]["n_emails"], got[3]["n_ips"], got[3]["n_phones"]) == (0, 0, 0)
    assert got[4]["text_redacted"] == "<EMAIL>,<EMAIL> (<IP>)"
    assert got[4]["n_emails"] == 2 and got[4]["n_ips"] == 1


def test_repetition_signals_hand_values(spark):
    from dedup_spark.operators.curation import repetition_signals

    rows = [
        (1, "a b a b a"),   # 2g: ab,ba,ab,ba; 3g: aba,bab,aba
        (2, "x y"),          # one 2-gram, no 3-grams
        (3, ""),             # empty -> all zero
        (4, "solo"),         # single token -> all zero
    ]
    got = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals(_docs(spark, rows)).collect()
    }
    assert got[1] == {
        "doc_id": 1,
        "n_2grams": 4, "dup_2gram_frac": 0.5, "top_2gram_frac": 0.5,
        "n_3grams": 3, "dup_3gram_frac": 0.3333, "top_3gram_frac": 0.6667,
    }
    assert got[2] == {
        "doc_id": 2,
        "n_2grams": 1, "dup_2gram_frac": 0.0, "top_2gram_frac": 1.0,
        "n_3grams": 0, "dup_3gram_frac": 0.0, "top_3gram_frac": 0.0,
    }
    for d in (3, 4):
        assert got[d]["n_2grams"] == 0 and got[d]["n_3grams"] == 0
        assert got[d]["dup_2gram_frac"] == 0.0
        assert got[d]["top_3gram_frac"] == 0.0


def test_repetition_signals_fused_equals_relational(spark):
    """The fused numpy kernel (window-hash n-gram identity, zero shuffles)
    must be value-identical to the relational string-gram path on every
    column — the hash-vs-string equivalence pin, same contract as the
    shingle kernels. Covers repeats, short docs, empties, whitespace
    normalization and a long planted-repetition doc."""
    from dedup_spark.operators.curation import (
        repetition_signals,
        repetition_signals_relational,
    )
    from dedup_spark.testdata import make_corpus

    rows = [
        (1, "a b a b a"),
        (2, "x y"),
        (3, ""),
        (4, "solo"),
        (5, "  The   CAT sat  on the mat the cat SAT "),  # normalization
        (6, "p q r " * 50),  # heavy planted repetition
        (7, "one two three four five six seven eight nine ten"),  # all uniq
    ] + [
        (100 + i, t)
        for i, t in enumerate(make_corpus(n_rows=60, seed=9).pages["text"])
    ]
    df = _docs(spark, rows)
    fused = {
        r["doc_id"]: r.asDict() for r in repetition_signals(df).collect()
    }
    rel = {
        r["doc_id"]: r.asDict()
        for r in repetition_signals_relational(df).collect()
    }
    assert fused == rel


def test_leakage_safe_split_cluster_coherent(spark):
    from dedup_spark.operators.curation import (
        leakage_safe_split,
        split_thresholds,
    )

    # 400 docs; members clusters pairs (2k, 2k+1) under label 2k for the
    # first 200 — both halves of every cluster MUST share a split
    docs = _docs(spark, [(i, f"text {i}") for i in range(400)])
    members = spark.createDataFrame(
        [(i, (i // 2) * 2) for i in range(200)],
        "doc_id long, cluster_id long",
    )
    got = leakage_safe_split(docs, members).toPandas()
    assert len(got) == 400
    per_cluster = got.groupby("cluster_id")["split"].nunique()
    assert int(per_cluster.max()) == 1
    # unclustered docs label themselves
    solo = got[got.doc_id >= 200]
    assert (solo.cluster_id == solo.doc_id).all()
    # the residue scheme actually produces all three splits at n=400
    assert set(got["split"]) == {"train", "val", "test"}
    # thresholds are integer-derived (the c5 never-float-rates rule)
    assert split_thresholds() == (6553, 13106)
    assert split_thresholds(val_pct=0, test_pct=0) == (0, 0)


def test_token_rarity_hand_values(spark):
    """avg df on a corpus small enough to compute by hand; empty doc keeps a
    row with a null score."""
    from dedup_spark.operators.curation import token_rarity

    rows = [
        (0, "the cat"),          # the: df 3, cat: df 2 -> avg 2.5
        (1, "the cat the cat"),  # distinct {the, cat} -> avg 2.5
        (2, "the dog"),          # the 3, dog 1 -> avg 2.0
        (3, ""),                 # empty -> 0 tokens, null score
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_distinct_tokens"], r["avg_token_df"])
        for r in token_rarity(df).collect()
    }
    assert got[0] == (2, 2.5)
    assert got[1] == (2, 2.5)
    assert got[2] == (2, 2.0)
    assert got[3] == (0, None)


def test_containment_pairs_hand_values(spark):
    """A's shingle set fully inside B's -> containment 1.0 even though
    Jaccard is 4/6; C shares nothing. Threshold 0.9 keeps only (A, B)."""
    from dedup_spark.operators.curation import containment_pairs

    rows = [
        (1, [11, 12, 13, 14]),
        (2, [11, 12, 13, 14, 15, 16]),
        (3, [99]),
    ]
    df = spark.createDataFrame(rows, "id long, shingle_hashes array<long>")
    got = containment_pairs(df, threshold=0.9).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"], r["containment"]) == (1, 2, 1.0)


def test_containment_pairs_matches_brute_force_random(spark):
    """30 random int-set docs: operator output equals a Python brute force
    over all pairs (shared-element candidates are a superset of the
    containment>=t set, so recall is structural)."""
    import itertools

    import numpy as np

    from dedup_spark.operators.curation import containment_pairs

    rng = np.random.default_rng(11)
    sets = {
        i: set(rng.choice(60, size=rng.integers(1, 12), replace=False).tolist())
        for i in range(30)
    }
    t = 0.6
    expect = set()
    for a, b in itertools.combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        if inter and inter / min(len(sets[a]), len(sets[b])) >= t:
            expect.add((a, b))
    df = spark.createDataFrame(
        [(i, sorted(int(x) for x in s)) for i, s in sets.items()],
        "id long, shingle_hashes array<long>",
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in containment_pairs(df, threshold=t).collect()
    }
    assert got == expect and len(expect) > 0


def test_dedup_weights_sum_equals_cluster_count(spark):
    from dedup_spark.operators.curation import dedup_weights

    docs = _docs(
        spark,
        [(i, f"doc {i}") for i in range(8)],
    )
    # clusters: {0,1,2}, {3,4}; 5,6,7 singletons (absent from members)
    members = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3), (4, 3)],
        "doc_id long, cluster_id long",
    )
    out = dedup_weights(docs, members).toPandas().set_index("doc_id")
    assert len(out) == 8
    assert out.loc[1, "cluster_size"] == 3
    assert out.loc[1, "weight"] == 1.0 / 3
    assert out.loc[4, "cluster_size"] == 2
    assert out.loc[6, "cluster_size"] == 1 and out.loc[6, "weight"] == 1.0
    assert out.loc[6, "cluster_id"] == 6  # singleton labeled by own id
    # soft-dedup invariant: weights sum to the number of clusters
    assert abs(out["weight"].sum() - (2 + 3)) < 1e-12


def test_source_cap_sample_matches_single_window(spark):
    from dedup_spark.operators.curation import source_cap_sample

    # 3 sources with skewed sizes and heavy n_tokens ties (forces the
    # doc_id tie-break through both phases)
    rows = []
    did = 0
    for src, n in [("a", 57), ("b", 5), ("c", 1)]:
        for i in range(n):
            rows.append((did, "tok " * ((i % 4) + 1), src))
            did += 1
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = (
        source_cap_sample(df, cap=10, n_salts=4)
        .orderBy("source", "rank")
        .toPandas()
    )
    # reference: plain single-window top-K in pandas
    import pandas as pd

    ref = pd.DataFrame(rows, columns=["doc_id", "text", "source"])
    ref["n_tokens"] = ref["text"].str.split().map(len)
    ref = ref.sort_values(
        ["source", "n_tokens", "doc_id"], ascending=[True, False, True]
    )
    ref["rank"] = ref.groupby("source").cumcount() + 1
    ref = ref[ref["rank"] <= 10][["doc_id", "source", "n_tokens", "rank"]]
    ref = ref.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["doc_id", "source", "n_tokens", "rank"]].reset_index(drop=True),
        ref,
        check_dtype=False,
    )
    assert (got.groupby("source").size() <= 10).all()


def test_cross_source_dup_matrix_hand_values(spark):
    from dedup_spark.operators.curation import cross_source_dup_matrix

    # cluster 0: 2 docs from a + 3 from b -> aa 1, ab 6, bb 3 pairs
    # cluster 9: 1 a + 1 c -> ac 1 pair; singleton (cluster 20, 1 b) -> none
    members = spark.createDataFrame(
        [
            (0, 0, "a"), (1, 0, "a"),
            (2, 0, "b"), (3, 0, "b"), (4, 0, "b"),
            (9, 9, "a"), (10, 9, "c"),
            (20, 20, "b"),
        ],
        "doc_id long, cluster_id long, source string",
    )
    out = {
        (r["source_a"], r["source_b"]): (r["n_dup_pairs"], r["n_clusters"])
        for r in cross_source_dup_matrix(members).collect()
    }
    assert out == {
        ("a", "a"): (1, 1),
        ("a", "b"): (6, 1),
        ("b", "b"): (3, 1),
        ("a", "c"): (1, 1),
    }
    # total pairs across cells == sum over clusters of C(size, 2)
    assert sum(v[0] for v in out.values()) == 10 + 1


def test_balanced_shards_matches_single_window_and_balances(spark):
    """Two-phase global rank == the plain single-window ranking under heavy
    ties, and the snake placement keeps per-shard token sums within one
    max-doc of each other."""
    from pyspark.sql import Window

    from dedup_spark.operators.curation import balanced_shards

    # heavy ties: token counts drawn from a tiny set so rank order leans on
    # the id tiebreak across range-partition boundaries
    rows = [(i, "tok " * ((i * 7) % 5 + 1)) for i in range(400)]
    df = _docs(spark, rows)
    out = balanced_shards(df, n_shards=4)
    w = Window.orderBy(F.col("n_tokens").desc(), F.col("doc_id").asc())
    ref = (
        out.select("doc_id", "n_tokens")
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .collect()
    )
    got = {r.doc_id: r.rank for r in out.collect()}
    assert got == {r.doc_id: r.rank for r in ref}
    sums = {
        r.shard: r.s
        for r in out.groupBy("shard").agg(F.sum("n_tokens").alias("s")).collect()
    }
    assert set(sums) == {0, 1, 2, 3}
    assert max(sums.values()) - min(sums.values()) <= 5  # max doc = 5 tokens

    import pytest as _pytest

    with _pytest.raises(ValueError):
        balanced_shards(df, n_shards=0)


def test_seeded_shuffle_is_reproducible_permutation(spark):
    """position is a 0-based permutation equal to the single-window rank of
    the MINSTD mix; same seed replays identically under different input
    partitioning; different seeds give different orders."""
    from pyspark.sql import Window

    from dedup_spark.operators.curation import seeded_shuffle

    rows = [(i, "x") for i in range(311)]
    df = _docs(spark, rows)
    out = seeded_shuffle(df, seed=7)
    got = {r.doc_id: (r.shuffle_key, r.position) for r in out.collect()}

    # 0-based permutation
    assert sorted(p for _, p in got.values()) == list(range(311))
    # single-window identity (including the id tiebreak ordering)
    w = Window.orderBy(F.col("shuffle_key").asc(), F.col("doc_id").asc())
    mult = pow(48271, 8, 2147483647)  # minstd_shuffle_mult(7)
    ref = (
        df.selectExpr(
            "doc_id",
            f"((doc_id + 7) % 2147483647) * {mult} % 2147483647"
            " AS shuffle_key",
        )
        .withColumn("position", F.row_number().over(w).cast("long") - 1)
        .collect()
    )
    assert got == {r.doc_id: (r.shuffle_key, r.position) for r in ref}
    # partitioning-invariant replay
    again = {
        r.doc_id: (r.shuffle_key, r.position)
        for r in seeded_shuffle(df.repartition(7), seed=7).collect()
    }
    assert again == got
    # seed sensitivity: a different seed must not replay the same order
    other = {
        r.doc_id: r.position for r in seeded_shuffle(df, seed=8).collect()
    }
    assert other != {d: p for d, (_, p) in got.items()}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        seeded_shuffle(df, seed=-1)


def test_seeded_shuffle_int32_ids_match_long_ids(spark):
    """An IntegerType id column must produce the same keys/positions as the
    same ids as longs — the mix casts to long BEFORE the arithmetic, so
    32-bit Spark integer multiplication can never silently wrap."""
    from dedup_spark.operators.curation import seeded_shuffle

    ids = [0, 1, 7, 65537, 2**31 - 2]
    df32 = spark.createDataFrame(
        [(i,) for i in ids], "doc_id int"
    )
    df64 = spark.createDataFrame(
        [(i,) for i in ids], "doc_id long"
    )
    got32 = {
        r.doc_id: (r.shuffle_key, r.position)
        for r in seeded_shuffle(df32, seed=3).collect()
    }
    got64 = {
        r.doc_id: (r.shuffle_key, r.position)
        for r in seeded_shuffle(df64, seed=3).collect()
    }
    assert got32 == got64
    # keys stay inside the MINSTD field (no wrap artifacts)
    assert all(0 <= k < 2**31 - 1 for k, _ in got32.values())
