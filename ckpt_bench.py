#!/usr/bin/env python
"""At-size checkpoint/resume audit: does a one-partition edit resume without
re-signing the corpus?

The checkpointed plan computes the per-doc signature features (simhash +
band keys — the dominant per-doc cost) inside the per-partition `prepared`
stage. This harness measures, at real size (default 600k docs / 8 source
partitions, pinned local[8], tmpfs spill — the scale_bench.py protocol):

    cold     : empty root, everything computes
    warm     : unchanged input, everything replays
    touch1   : ONE partition's text edited -> that partition re-signs,
               the global suffix (pair gen + verify + CC) recomputes

Each phase runs in a FRESH subprocess/JVM against the same on-disk root.
The claim to verify: touch1 << cold by ~the signature+ingest cost of the
7 untouched partitions (before r4e, the global stage re-ran the signature
UDF over the whole corpus, so touch1 ~= cold).

Writes BENCH/ckpt_resume.json and prints one JSON line. Run:
    python ckpt_bench.py [--rows 600000] [--cores 8] [--parts 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

_GEN = r"""
import sys
n_rows, n_parts, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
from dedup_spark.session import build_session
from dedup_spark.testdata import synth_pages_spark
spark = build_session("ckpt_gen", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
synth_pages_spark(spark, n_rows, n_sources=n_parts).repartition(64) \
    .write.mode("overwrite").parquet(path)
print("generated", spark.read.parquet(path).count())
spark.stop()
"""

_PHASE = r"""
import json, os, sys, time
cores, path, root, phase, shm, suffix = (
    int(sys.argv[1]), sys.argv[2], sys.argv[3], sys.argv[4], sys.argv[5],
    sys.argv[6] == "1")
from pyspark.sql import functions as F
from dedup_spark.config import DedupConfig
from dedup_spark.session import build_session
from dedup_spark.plans.checkpoint import CheckpointedRun, run_dedup_checkpointed
config = DedupConfig(shuffle_partitions=cores * 2, spill_dir=shm,
                     suffix_enabled=suffix)
spark = build_session("ckpt_bench", master=f"local[{cores}]", config=config,
                      shuffle_partitions=cores * 2,
                      extra_conf={"spark.local.dir": shm})
spark.sparkContext.setLogLevel("ERROR")
pages = spark.read.parquet(path)
if phase == "touch1":
    pages = pages.withColumn(
        "text",
        F.when(F.col("source") == "src0",
               F.concat(F.col("text"), F.lit(" edited"))).otherwise(F.col("text")))
elif phase == "touch4":
    # relative to the touch1 root state this changes FOUR partitions (src0
    # gets a different edit, src1-3 a first edit): the incremental-vs-delta
    # scaling point
    pages = pages.withColumn(
        "text",
        F.when(F.col("source").isin("src0", "src1", "src2", "src3"),
               F.concat(F.col("text"), F.lit(" edited4"))).otherwise(F.col("text")))
# untimed Python-worker/codegen warmup (scale_bench protocol)
from dedup_spark.plans.pipeline import run_dedup
run_dedup(pages.limit(1000), config).members.count()
run = CheckpointedRun(spark, root, config)
t0 = time.perf_counter()
n = run_dedup_checkpointed(pages, config, root, run=run).count()
dt = time.perf_counter() - t0
print(json.dumps({"phase": phase, "sec": round(dt, 3), "members": n,
                  "computed": sorted(run.computed),
                  "pairs_mode": run.pairs_mode,
                  "n_replayed": len(run.replayed)}))
spark.stop()
"""


def run_child(args: list[str], env: dict) -> dict:
    out = subprocess.run(
        args, capture_output=True, text=True, env=env, check=True
    ).stdout
    return json.loads(out.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=600_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--parts", type=int, default=8)
    ap.add_argument("--keep", action="store_true", help="keep corpus + root")
    ap.add_argument("--suffix", action="store_true",
                    help="suffix channel ON (r5: winnow fps stored per "
                         "partition, suffix pairs resume incrementally); "
                         "writes BENCH/ckpt_resume_suffix.json")
    args = ap.parse_args()

    env = dict(os.environ)
    base = "/dev/shm/dedup_ckpt_bench"
    corpus = f"{base}/corpus"
    root = f"{base}/root"
    shm = f"{base}/spill"
    shutil.rmtree(base, ignore_errors=True)
    os.makedirs(shm, exist_ok=True)

    subprocess.run(
        [sys.executable, "-c", _GEN, str(args.rows), str(args.parts), corpus],
        check=True, env=env,
    )

    pin = ["taskset", "-c", f"0-{args.cores - 1}"]
    results = {}
    for phase in ("cold", "warm", "touch1", "touch4"):
        r = run_child(
            pin + [sys.executable, "-c", _PHASE, str(args.cores), corpus,
                   root, phase, shm, "1" if args.suffix else "0"],
            env,
        )
        results[phase] = r
        print(json.dumps(r), flush=True)

    summary = {
        "rows": args.rows, "cores": args.cores, "parts": args.parts,
        "suffix_enabled": args.suffix,
        "cold_s": results["cold"]["sec"],
        "warm_s": results["warm"]["sec"],
        "touch1_s": results["touch1"]["sec"],
        "touch1_computed": results["touch1"]["computed"],
        "touch1_pairs_mode": results["touch1"]["pairs_mode"],
        "touch1_over_cold": round(
            results["touch1"]["sec"] / results["cold"]["sec"], 3
        ),
        "touch4_s": results["touch4"]["sec"],
        "touch4_pairs_mode": results["touch4"]["pairs_mode"],
        "touch4_over_cold": round(
            results["touch4"]["sec"] / results["cold"]["sec"], 3
        ),
    }
    os.makedirs("BENCH", exist_ok=True)
    out_name = "BENCH/ckpt_resume_suffix.json" if args.suffix else "BENCH/ckpt_resume.json"
    with open(out_name, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if not args.keep:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
