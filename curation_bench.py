#!/usr/bin/env python
"""At-size measurement for the round-4 curation operators (c8/c9/c10,
c14/c15/n13).

The driver's sf0.1 table (5,000 docs) measures fixed cost only; these three
operators move token/segment streams, so their scale behavior is measured at
real size on the deterministic JVM-generated corpus (synth_pages_spark — the
same input the scaling campaigns use). Protocol per CLAUDE.md: fresh JVM per
leg, CPU-pinned local[8] (taskset 0-7), shuffle+spill on /dev/shm, results
consumed through a parquet write so no aggregate expression can be pruned.

Writes BENCH/curation_at_size.json and prints one JSON line. Run:
    python curation_bench.py [--rows 600000] [--repeat 2]
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
n_rows, path = int(sys.argv[1]), sys.argv[2]
from dedup_spark.session import build_session
from dedup_spark.testdata import synth_pages_spark
spark = build_session("curation_gen", master="local[32]", shuffle_partitions=64)
spark.sparkContext.setLogLevel("ERROR")
synth_pages_spark(spark, n_rows).repartition(64).write.mode("overwrite").parquet(path)
print("generated", spark.read.parquet(path).count())
spark.stop()
"""

_CHILD = r"""
import json, os, shutil, sys, time
op, cores, path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
from pyspark.sql import functions as F
from dedup_spark.config import DedupConfig
from dedup_spark.session import build_session
from dedup_spark.operators.curation import (
    cross_source_dup_matrix, dedup_segments, dedup_weights, redact_pii,
    repetition_signals, source_cap_sample,
)
shm = f"/dev/shm/curation_bench_{op}"
os.makedirs(shm, exist_ok=True)
config = DedupConfig(shuffle_partitions=cores * 2, spill_dir=shm)
spark = build_session("curation_bench", master=f"local[{cores}]", config=config,
                      shuffle_partitions=cores * 2,
                      extra_conf={"spark.local.dir": shm})
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(path).select(
    F.xxhash64("url").alias("doc_id"), "text", "source")
n_docs = docs.count()  # warms the scan, outside the timed window


def _members(d):
    # synthetic cluster labels for the members-consuming ops: 20% of the
    # corpus, ~4 docs per cluster (deterministic pmod grouping) — measures
    # the OPERATOR's window/join cost, not the upstream pipeline's
    return d.filter(F.pmod("doc_id", F.lit(5)) == 0).select(
        "doc_id",
        F.pmod("doc_id", F.lit(max(n_docs // 20, 1))).alias("cluster_id"),
        "source",
    )


OPS = {
    "c8_segment_dedup": lambda d: dedup_segments(d),
    "c9_pii_redact": lambda d: redact_pii(d),
    "c10_repetition_signals": lambda d: repetition_signals(d),
    "c10_relational": lambda d: repetition_signals(d, fused=False),
    "c14_dedup_weights": lambda d: dedup_weights(d, _members(d)),
    "c15_source_cap_sample": lambda d: source_cap_sample(d, cap=1000),
    "n13_cross_source_dup_matrix": lambda d: cross_source_dup_matrix(
        _members(d)),
}
out = f"{shm}/out"
# tiny untimed warmup: JIT + codegen + shuffle service spin-up
OPS[op](docs.limit(2000)).write.mode("overwrite").parquet(out)
t0 = time.perf_counter()
OPS[op](docs).write.mode("overwrite").parquet(out)
dt = time.perf_counter() - t0
rows = spark.read.parquet(out).count()
print(json.dumps({"op": op, "cores": cores, "sec": round(dt, 3),
                  "docs_per_sec": round(n_docs / dt, 2),
                  "n_docs": n_docs, "out_rows": rows}))
spark.stop()
shutil.rmtree(shm, ignore_errors=True)
"""


def _run(code: str, *argv: str, cpus: int | None = None) -> str:
    cmd = [sys.executable, "-c", code, *argv]
    if cpus is not None and shutil.which("taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return out.stdout.strip().splitlines()[-1]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=600_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--corpus", default="/tmp/dedup_scale_corpus")
    ap.add_argument("--repeat", type=int, default=2, help="runs per op; best kept")
    ap.add_argument("--ops", default="c8_segment_dedup,c9_pii_redact,c10_repetition_signals")
    args = ap.parse_args()

    marker = f"{args.corpus}/_ROWS_{args.rows}"
    if not os.path.exists(marker):
        print(_run(_GEN, str(args.rows), args.corpus), file=sys.stderr)
        open(marker, "w").write("ok")

    ops = args.ops.split(",")
    runs: dict[str, list[dict]] = {op: [] for op in ops}
    # interleave rounds (host drifts 2-3x between windows; CLAUDE.md)
    for _ in range(args.repeat):
        for op in ops:
            r = json.loads(_run(_CHILD, op, str(args.cores), args.corpus,
                                cpus=args.cores))
            print(r, file=sys.stderr)
            runs[op].append(r)
    result = {
        "metric": f"curation ops at {args.rows} docs / local[{args.cores}] pinned",
        "best": {op: min(rs, key=lambda r: r["sec"]) for op, rs in runs.items()},
        "all_runs": [r for rs in runs.values() for r in rs],
    }
    os.makedirs("BENCH", exist_ok=True)
    out_path = "BENCH/curation_at_size.json"
    if os.path.exists(out_path):  # merge: keep other ops' results
        prev = json.load(open(out_path))
        merged_best = {**prev.get("best", {}), **result["best"]}
        result["best"] = merged_best
        result["all_runs"] = prev.get("all_runs", []) + result["all_runs"]
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
