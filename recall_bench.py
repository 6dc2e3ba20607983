#!/usr/bin/env python
"""Dup-pair recall/precision evidence at scale (BASELINE.json: recall >= 0.99).

Plants a large sample of duplicate structure — exact sets plus
`--groups-per-level` independent near-dup pairs at each target Jaccard in
{0.95, 0.85, 0.75} above threshold and {0.55, 0.35} below — runs the full
pipeline at the reference config (k=5, 128 perms, 32x4 banding, theta=0.7),
and reports pair-level recall and precision against the generator's golden
clusters. Writes BENCH/recall.json and prints one JSON line.

    python recall_bench.py [--groups-per-level 60] [--rows 4000]
"""

from __future__ import annotations

import argparse
import itertools
import json
import os


def _pairs(df, id_col, cl_col):
    out = set()
    for _, grp in df.groupby(cl_col):
        out |= set(itertools.combinations(sorted(grp[id_col]), 2))
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--groups-per-level", type=int, default=60)
    ap.add_argument("--rows", type=int, default=4000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--scheme", default="classic",
                    choices=["classic", "oph"],
                    help="MinHash scheme (oph = densified one-permutation hashing; writes BENCH/recall_oph.json instead)")
    args = ap.parse_args()

    from dedup_spark.config import DedupConfig
    from dedup_spark.plans.pipeline import run_dedup
    from dedup_spark.session import build_session
    from dedup_spark.testdata import corpus_to_spark, make_corpus

    shm = "/dev/shm/recall_bench" if os.path.isdir("/dev/shm") else None
    if shm:
        os.makedirs(shm, exist_ok=True)
    config = DedupConfig(shuffle_partitions=args.cores * 2, spill_dir=shm,
                         minhash_scheme=args.scheme)
    spark = build_session(
        "recall_bench", master=f"local[{args.cores}]", config=config,
        shuffle_partitions=args.cores * 2,
        extra_conf={"spark.local.dir": shm} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    corpus = make_corpus(
        n_rows=args.rows, seed=42, near_groups_per_level=args.groups_per_level
    )
    res = run_dedup(corpus_to_spark(spark, corpus), config)
    members = res.members.toPandas()

    gold = _pairs(corpus.golden_clusters, "url", "cluster_id")
    got = _pairs(members, "url", "cluster_id")
    recall = len(gold & got) / len(gold)
    precision = len(gold & got) / len(got) if got else 1.0

    result = {
        "metric": "dup-pair recall/precision vs planted golden clusters "
        "(k=5 shingles, 128 perms, 32x4 bands, jaccard_theta=0.7)",
        "minhash_scheme": args.scheme,
        "recall": round(recall, 5),
        "precision": round(precision, 5),
        "golden_pairs": len(gold),
        "found_pairs": len(got),
        "n_docs": len(corpus.pages),
        "near_groups_per_level": args.groups_per_level,
        "passes_0.99": recall >= 0.99,
    }
    os.makedirs("BENCH", exist_ok=True)
    out = "BENCH/recall.json" if args.scheme == "classic" else "BENCH/recall_oph.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if shm:
        import shutil

        spark.stop()
        shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
