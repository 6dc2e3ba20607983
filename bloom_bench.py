#!/usr/bin/env python
"""Bloom-sidecar incremental dedup (c16 / operators/bloom.py) at size:
1M-page standing corpus + 100k-page incoming batch (a tenth of it exact
copies of base pages, plus whatever dups the generator plants naturally).

Audits that the bloom path returns EXACTLY the text-equality anti-join
(dup count + canonical parity against a directly-computed truth join) and
times it against the plain anti-join it replaces. The wall-clock contest on
one box understates the design: the anti-join shuffles every base text,
the bloom path shuffles 8-byte delta hashes and broadcasts only the hit
subset (base never shuffles — plan-pinned in tests/test_plans.py), which
is the property that matters when "base" is a 10^12-row standing corpus.

    taskset -c 0-7 python bloom_bench.py [--base 1000000] [--delta 100000]
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=1_000_000)
    ap.add_argument("--delta", type=int, default=100_000)
    ap.add_argument("--dup-frac", type=float, default=0.1)
    ap.add_argument("--cores", type=int, default=8)
    # ~16 bits/key at the default 1M base: 64 slices x 2^18 bits
    ap.add_argument("--n-slices", type=int, default=64)
    ap.add_argument("--bits-per-slice", type=int, default=1 << 18)
    ap.add_argument(
        "--near", action="store_true",
        help="also A/B the near-dup candidate join (incremental_near_dups) "
        "with and without the shingle-hash bloom pre-filter",
    )
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from dedup_spark.operators.bloom import bloom_delta_new, bloom_probe, bloom_sidecar
    from dedup_spark.plans.pipeline import spill_path
    from dedup_spark.session import build_session
    from dedup_spark.testdata import synth_pages_spark

    spark = build_session(
        "bloom_bench", master=f"local[{args.cores}]",
        shuffle_partitions=2 * args.cores,
    )
    spark.sparkContext.setLogLevel("ERROR")

    n, m = args.base, args.delta
    n_planted = int(m * args.dup_frac)
    ids = F.regexp_extract("url", r"(\d+)$", 1).cast("long")
    pages = synth_pages_spark(spark, n + m).select(ids.alias("doc_id"), "text")
    base = spill_path(pages.filter(F.col("doc_id") < n), "bloom_bench_base")
    fresh = pages.filter(F.col("doc_id") >= n)
    planted = base.filter(F.pmod("doc_id", F.lit(97)) == 0).limit(n_planted).select(
        (F.col("doc_id") + 10 * (n + m)).alias("doc_id"), "text"
    )
    delta = spill_path(fresh.unionByName(planted), "bloom_bench_delta")
    geo = dict(n_slices=args.n_slices, bits_per_slice=args.bits_per_slice)

    # --- bloom path (timed end-to-end: sidecar build + probe + verify) ---
    t0 = time.perf_counter()
    out = bloom_delta_new(base, delta, **geo).persist()
    n_dup_bloom = out.filter("status = 'dup'").count()
    n_rows = out.count()
    t_bloom = time.perf_counter() - t0

    # --- the plain anti-join it replaces (same semantics, timed) ---
    t0 = time.perf_counter()
    canon = base.groupBy("text").agg(F.min("doc_id").alias("canonical_doc_id"))
    truth = spill_path(
        delta.join(canon, "text", "left").select(
            "doc_id", F.col("canonical_doc_id")
        ),
        "bloom_bench_truth",
    )
    n_dup_truth = truth.filter(F.col("canonical_doc_id").isNotNull()).count()
    t_anti = time.perf_counter() - t0

    # --- exact parity: same dup set AND same canonical attribution ---
    n_diff = (
        out.join(
            truth.withColumnRenamed("canonical_doc_id", "_truth_canonical"),
            "doc_id",
        )
        .filter(~F.col("canonical_doc_id").eqNullSafe(F.col("_truth_canonical")))
        .count()
    )

    # --- probe selectivity: how much of the batch skipped the join ---
    h = F.xxhash64(F.coalesce("text", F.lit("")))
    side = bloom_sidecar(base.select(h.alias("h")), **geo)
    probed = bloom_probe(delta.select("doc_id", h.alias("h")), side, **geo)
    n_maybe = probed.filter("maybe").count()

    result = {
        "metric": "bloom-sidecar incremental dedup vs plain anti-join",
        "base_rows": n, "delta_rows": n_rows, "cores": args.cores,
        "planted_dups": n_planted, "dups_found": n_dup_bloom,
        "dups_truth": n_dup_truth, "canonical_mismatches": n_diff,
        "bloom_hits": n_maybe,
        "prune_frac": round(1 - n_maybe / max(n_rows, 1), 4),
        "bloom_sec": round(t_bloom, 1), "anti_join_sec": round(t_anti, 1),
        "geometry": {**geo, "bits_per_key": round(
            args.n_slices * args.bits_per_slice / n, 1)},
    }
    assert n_dup_bloom == n_dup_truth and n_diff == 0, result

    if args.near:
        # Near-dup incremental path: the bloom pre-filter must shrink the
        # candidate-join input on a mostly-novel batch and change nothing.
        from dedup_spark.config import DedupConfig
        from dedup_spark.functions.signatures import (
            shingle_hashes_udf,
            token_hashes,
        )

        sh = shingle_hashes_udf(DedupConfig())
        feats_b = spill_path(
            base.select(
                "doc_id", sh(token_hashes("text")).alias("shingle_hashes")
            ),
            "bloom_bench_featsb",
        )
        feats_d = spill_path(
            delta.select(
                "doc_id", sh(token_hashes("text")).alias("shingle_hashes")
            ),
            "bloom_bench_featsd",
        )
        from dedup_spark.operators.curation import incremental_near_dups

        # shingle-count-aware geometry: ~16 bits per distinct base shingle
        n_base_sh = (
            feats_b.select(F.explode("shingle_hashes").alias("h"))
            .distinct()
            .count()
        )
        import math

        slice_bits = 1 << max(
            13, math.ceil(math.log2(16 * n_base_sh / args.n_slices))
        )
        near_geo = dict(n_slices=args.n_slices, bits_per_slice=slice_bits)

        # one-time sidecar build over the standing corpus, spilled like a
        # production job would publish it — every incoming batch reuses it
        from dedup_spark.operators.bloom import bloom_probe as _probe
        from dedup_spark.operators.bloom import bloom_sidecar as _side

        ex_b = feats_b.select(F.explode("shingle_hashes").alias("h"))
        t0 = time.perf_counter()
        side = spill_path(_side(ex_b, **near_geo), "bloom_bench_sidecar")
        side.count()
        t_build = round(time.perf_counter() - t0, 1)

        def run_near(bloom):
            t0 = time.perf_counter()
            out = incremental_near_dups(
                feats_d, feats_b, threshold=0.7, id_col="doc_id", bloom=bloom
            )
            dups = out.filter("status = 'dup'").count()
            return dups, round(time.perf_counter() - t0, 1)

        dups_plain, t_plain = run_near(None)
        dups_bloom, t_bloom_near = run_near({"sidecar": side, **near_geo})
        # join-input reduction: delta shingle rows surviving the probe
        ex_d = feats_d.select("doc_id", F.explode("shingle_hashes").alias("h"))
        kept = _probe(ex_d, side, **near_geo).filter("maybe").count()
        total = ex_d.count()
        result["near"] = {
            "base_distinct_shingles": n_base_sh,
            "delta_shingle_rows": total,
            "rows_into_candidate_join": kept,
            "join_input_reduction": round(1 - kept / max(total, 1), 4),
            "dups_plain": dups_plain, "dups_bloom": dups_bloom,
            "sidecar_build_sec": t_build,
            "plain_batch_sec": t_plain,
            "bloom_batch_sec": t_bloom_near,
            "geometry": near_geo,
        }
        assert dups_plain == dups_bloom, result

    with open("BENCH/bloom_delta.json", "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
