#!/usr/bin/env python
"""Semantic dedup (SemDeDup) at size: 1M dim-64 vectors, 10,000 planted
near-twin pairs (cosine ~0.994), 32 random prototypes, threshold 0.95.

Twins sit 0.02-noise apart, so a twin pair is a true near-dup but its two
ends can legitimately land in DIFFERENT domains when the base vector's top-2
prototype cosines are within the noise (SemDeDup's contract: cross-domain
redundancy is kept). The honest metrics are therefore:
  - same_domain_frac: planted pairs whose ends share a domain (semantics)
  - recall_within_domain: of those, the fraction merged into one cluster
    (the engine property — must be ~1.0)

    taskset -c 0-7 python semdedup_bench.py [--rows 1000000] [--cores 8]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--pairs", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--k", type=int, default=32)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    import numpy as np
    from pyspark.sql import functions as F

    from dedup_spark.config import DedupConfig
    from dedup_spark.operators.embedding import semantic_dedup
    from dedup_spark.session import build_session

    spark = build_session(
        "semdedup_bench", master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n, dim, n_pairs = args.rows, args.dim, args.pairs
    half = n // 2

    # distributed deterministic corpus: id i < half -> base vector seeded by
    # i; i in [half, half+pairs) -> 0.02-noise twin of base (i - half)
    def gen(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].to_numpy()
            X = np.empty((len(ids), dim))
            for j, i in enumerate(ids):
                b = int(i) if i < half else int(i - half)
                v = np.random.default_rng(b).standard_normal(dim)
                if i >= half and (i - half) < n_pairs:
                    v = v + 0.02 * np.random.default_rng(int(i) + 7).standard_normal(dim)
                X[j] = v / np.linalg.norm(v)
            yield pd.DataFrame({"id": ids, "v": list(X)})

    vecs = (
        spark.range(n, numPartitions=4 * args.cores)
        .withColumnRenamed("id", "id")
        .mapInPandas(gen, "id long, v array<double>")
    )
    from dedup_spark.plans.pipeline import spill

    cfg = DedupConfig(shuffle_partitions=2 * args.cores)
    vecs = spill(vecs, cfg, "semb_vecs")  # corpus on disk: the input, not the op

    protos = np.vstack(
        [np.random.default_rng(10_000_000 + i).standard_normal(dim) for i in range(args.k)]
    )
    t0 = time.time()
    out = semantic_dedup(
        vecs, protos, threshold=args.threshold, dim=dim, config=cfg,
        id_col="id", vec_col="v", expected_n=n,
    )
    res = (
        out.filter((F.col("id") < n_pairs) | ((F.col("id") >= half) & (F.col("id") < half + n_pairs)))
        .select("id", "domain_id", "rep_id")
        .toPandas()
    )
    wall = time.time() - t0
    m = {int(r.id): (int(r.domain_id), int(r.rep_id)) for r in res.itertuples()}
    same_dom = sum(1 for i in range(n_pairs) if m[i][0] == m[i + half][0])
    merged = sum(
        1 for i in range(n_pairs)
        if m[i][0] == m[i + half][0] and m[i][1] == m[i + half][1]
    )
    rec = {
        "rows": n, "dim": dim, "k": args.k, "threshold": args.threshold,
        "planted_pairs": n_pairs,
        "same_domain_frac": round(same_dom / n_pairs, 4),
        "recall_within_domain": round(merged / max(same_dom, 1), 6),
        "wall_s": round(wall, 1),
        "vecs_per_sec": round(n / wall, 1),
        "cores": args.cores,
    }
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
