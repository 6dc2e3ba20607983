#!/usr/bin/env python
"""Hot-bucket skew stress (N10) — the 100 TB boilerplate case, re-runnable.

Corpus: `--rows` docs generated JVM-side, of which `--copies` share one
byte-identical boilerplate text (every MinHash band bucket and SimHash block
for the group is hot: naive within-bucket all-pairs would emit
copies*(copies-1)/2 pairs) and `--mid` share a second, different text sized
to land in the EXHAUSTIVE triangulated mid tier of the salted pair generator
(pair_cap_all < mid <= pair_cap_cross). Everything else is unique.

Pass criteria (asserted, not eyeballed):
  - the ultra-hot group comes back as ONE cluster of exactly `copies` docs
    (salted star + hub closure preserves the transitive closure);
  - the mid group comes back as ONE cluster of exactly `mid` docs (the
    triangulated tier is exhaustive, no hub mediation);
  - members == copies + mid (no false merges with the unique docs).

Writes BENCH/skew.json. Run: python skew_bench.py [--rows 200000]
[--copies 50000] [--mid 500]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--copies", type=int, default=50_000)
    ap.add_argument("--mid", type=int, default=500)
    ap.add_argument("--cores", type=int, default=8)
    args = ap.parse_args()

    shm = "/dev/shm/dedup_skew" if os.path.isdir("/dev/shm") else None
    if shm:
        os.makedirs(shm, exist_ok=True)
        os.environ["TMPDIR"] = shm
        import tempfile

        tempfile.tempdir = None

    from pyspark.sql import functions as F

    from dedup_spark.config import DedupConfig
    from dedup_spark.plans.pipeline import run_dedup
    from dedup_spark.session import build_session

    config = DedupConfig(shuffle_partitions=args.cores * 2, spill_dir=shm)
    spark = build_session(
        "skew_bench", master=f"local[{args.cores}]", config=config,
        shuffle_partitions=config.shuffle_partitions,
        extra_conf={"spark.local.dir": shm} if shm else None,
    )
    spark.sparkContext.setLogLevel("ERROR")

    seed, vocab = 42, 20000
    hot_end, mid_end = args.copies, args.copies + args.mid
    df = spark.range(args.rows)
    # one text per text_seed: the hot group collapses to seed 0, the mid
    # group to seed `copies`, the rest are unique
    text_seed = (
        F.when(F.col("id") < hot_end, F.lit(0))
        .when(F.col("id") < mid_end, F.lit(hot_end))
        .otherwise(F.col("id"))
    )
    n_tokens = F.pmod(F.xxhash64(F.lit(seed), text_seed), F.lit(121)) + 80
    words = F.transform(
        F.sequence(F.lit(1), n_tokens),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.lit(seed), text_seed, i), F.lit(vocab)).cast("string"),
        ),
    )
    pages = df.select(
        F.concat(F.lit("https://synth.example/p"), F.col("id")).alias("url"),
        F.timestamp_seconds(F.lit(1704067200) + F.col("id")).alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.concat_ws(" ", words).alias("text"),
        F.lit("en").alias("lang"),
        F.concat(F.lit("src"), F.pmod("id", F.lit(4)).cast("string")).alias("source"),
    )
    path = f"{shm or '/tmp'}/skew_corpus"
    pages.repartition(args.cores * 2).write.mode("overwrite").parquet(path)
    pages = spark.read.parquet(path)

    run_dedup(pages.limit(1000), config).members.count()  # untimed warmup
    t0 = time.perf_counter()
    res = run_dedup(pages, config)
    members = res.members.toPandas()
    wall = round(time.perf_counter() - t0, 3)

    sizes = members.groupby("cluster_id").size().sort_values(ascending=False)
    result = {
        "metric": "hot-bucket stress: boilerplate cliques through the tiered "
        "salted pair generator (ultra-hot star + exhaustive mid tier)",
        "corpus": {
            "n_docs": args.rows,
            "ultra_hot_copies": args.copies,
            "mid_tier_copies": args.mid,
            "unique_docs": args.rows - args.copies - args.mid,
        },
        "naive_all_pairs_would_emit": args.copies * (args.copies - 1) // 2,
        "end_to_end_sec": wall,
        "members": int(len(members)),
        "cluster_sizes_top3": [int(s) for s in sizes.head(3)],
        "cores": args.cores,
    }
    assert int(sizes.iloc[0]) == args.copies, result
    assert int(sizes.iloc[1]) == args.mid, result
    assert len(members) == args.copies + args.mid, result
    result["asserts"] = "ultra-hot clique whole, mid clique whole, no false merges"
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/skew.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()
    if shm:
        shutil.rmtree(shm, ignore_errors=True)


if __name__ == "__main__":
    main()
