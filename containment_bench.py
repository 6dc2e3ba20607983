#!/usr/bin/env python
"""Containment channel (n12) at size: 600k synthetic pages + 1,000 planted
SUPERSET docs (original text + 40 junk tokens appended), threshold 0.9.

Appending tokens keeps every one of the original's k-windows inside the
superset, so each planted (original, superset) pair has containment exactly
1.0 — while its Jaccard is ~|A|/(|A|+44), i.e. ~0.65-0.8: the band the
symmetric channels may legitimately miss. The audit checks every planted
pair is found and times the full channel (shingle UDF + salted candidate
generation + exact intersect verify).

    taskset -c 0-7 python containment_bench.py [--rows 600000] [--pairs 1000]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=600_000)
    ap.add_argument("--pairs", type=int, default=1_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.9)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dedup_spark.config import DedupConfig
    from dedup_spark.functions.signatures import shingle_hashes_udf, token_hashes
    from dedup_spark.operators.curation import containment_pairs
    from dedup_spark.plans.pipeline import spill
    from dedup_spark.session import build_session
    from dedup_spark.testdata import synth_pages_spark

    spark = build_session(
        "containment_bench", master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")
    cfg = DedupConfig(shuffle_partitions=2 * args.cores)

    n, npairs = args.rows, args.pairs
    base = synth_pages_spark(spark, n).select(
        F.regexp_extract("url", r"(\d+)$", 1).cast("long").alias("id"), "text"
    )
    # only UNIQUE-text docs host planted supersets (id % 100 >= 8 in the
    # generator), so the planted pair is the sole containment>=0.9 relation
    # its endpoints participate in
    hosts = base.filter((F.pmod("id", F.lit(100)) >= 8) & (F.col("id") < npairs * 200))
    hosts = hosts.orderBy("id").limit(npairs)
    junk = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), F.lit(40)),
            lambda i: F.concat(F.lit("zq"), F.conv(F.xxhash64(F.col("id"), i), 10, 16)),
        ),
    )
    supersets = hosts.select(
        (F.col("id") + n).alias("id"),
        F.concat("text", F.lit(" "), junk).alias("text"),
    )
    docs = base.unionByName(supersets)

    t0 = time.time()
    sh = spill(
        docs.select(
            "id", shingle_hashes_udf(cfg)(token_hashes("text")).alias("shingle_hashes")
        ),
        cfg,
        "cont_feats",
    )
    pairs = containment_pairs(
        sh, threshold=args.threshold, id_col="id", config=cfg
    )
    got = {
        (r["id_a"], r["id_b"])
        for r in pairs.filter(
            (F.col("id_a") < npairs * 200) & (F.col("id_b") >= n)
        ).collect()
    }
    wall = time.time() - t0
    planted = {
        (r["id"], r["id"] + n) for r in hosts.select("id").collect()
    }
    found = len(planted & got)
    print(json.dumps({
        "rows": n + npairs, "planted_pairs": npairs,
        "planted_found": found, "recall": round(found / npairs, 6),
        "threshold": args.threshold, "wall_s": round(wall, 1),
        "docs_per_sec": round((n + npairs) / wall, 1), "cores": args.cores,
    }))


if __name__ == "__main__":
    main()
