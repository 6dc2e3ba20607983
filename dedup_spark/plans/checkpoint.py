"""Checkpoint/resume + lineage + metrics (N9 in SURVEY.md §2.7).

The reference re-checks file mtimes before destructive actions
(/root/reference/src/deal_with_duplicates.cpp:69-74,183-189) — its whole
"resume story" is "don't act on stale state". At cluster scale the analogue
is per-partition, per-stage checkpointing: every pipeline stage writes its
output atomically (staging dir + rename; an Iceberg snapshot commit in prod)
together with a marker recording the input lineage fingerprint, row count,
and wall time. A resumed job replays only stages whose marker is missing or
whose recorded lineage no longer matches the current input.

Layout under the checkpoint root:
    stage=<name>/...parquet          stage output
    _markers/<name>.json             {fingerprint, rows, wall_s, ...}
    _markers/<name>/<partition>.json per-partition markers (partitioned stages)
    metrics.jsonl                    one row per completed (stage, partition)

Fingerprints are content-based: bit_xor of xxhash64 over the key columns plus
the row count — cheap (one agg over the input), order-independent, overflow-
free under ANSI mode, and enough to catch the "input advanced underneath me"
case the reference guards against.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
import uuid
from concurrent.futures import ThreadPoolExecutor
from dataclasses import asdict, dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dedup_spark.config import DedupConfig


def lineage_fingerprint(df: DataFrame, cols: list[str] | None = None) -> str:
    """Order-independent content fingerprint of df over `cols` (default all)."""
    cs = cols or df.columns
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in cs])).alias("h"),
    ).collect()[0]
    return f"n={agg['n']},h={agg['h']}"


@dataclass
class StageRecord:
    stage: str
    partition: str  # "" for unpartitioned stages
    rows: int
    wall_s: float
    fingerprint: str
    finished_ts: float


class CheckpointedRun:
    """Stage-graph checkpointer over a local/posix checkpoint root.

    On Iceberg the same contract holds via snapshot commits + a manifest
    table; this shim keeps identical semantics on plain parquet
    (SURVEY.md §1.3 sandbox constraint).
    """

    def __init__(self, spark: SparkSession, root: str, config: DedupConfig):
        self.spark = spark
        self.root = root
        self.config = config
        os.makedirs(os.path.join(root, "_markers"), exist_ok=True)
        self.replayed: list[str] = []  # stages served from checkpoint
        self.computed: list[str] = []  # stages actually executed
        self._lock = threading.Lock()  # metrics.jsonl + state lists

    # -- marker plumbing ----------------------------------------------------
    def _stage_path(self, name: str) -> str:
        return os.path.join(self.root, f"stage={name}")

    def _marker_path(self, name: str, partition: str = "") -> str:
        if partition:
            return os.path.join(self.root, "_markers", name, f"{partition}.json")
        return os.path.join(self.root, "_markers", f"{name}.json")

    def _read_marker(self, name: str, partition: str = "") -> dict | None:
        p = self._marker_path(name, partition)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def _write_marker(self, rec: StageRecord) -> None:
        p = self._marker_path(rec.stage, rec.partition)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        tmp = p + f".tmp{uuid.uuid4().hex[:6]}"
        with open(tmp, "w") as f:
            json.dump(asdict(rec), f)
        os.replace(tmp, p)
        # metrics.jsonl is append-shared across concurrently-finishing
        # partitions (row ORDER is completion order; the table is read back
        # order-free as a DataFrame)
        with self._lock, open(os.path.join(self.root, "metrics.jsonl"), "a") as f:
            row = asdict(rec)
            row["docs_per_sec"] = round(rec.rows / rec.wall_s, 2) if rec.wall_s else None
            f.write(json.dumps(row) + "\n")

    def _atomic_write(self, df: DataFrame, path: str, partition_by: str | None = None) -> None:
        # underscore prefix: Spark readers ignore leftover staging dirs from
        # crashed runs, so a resume never mistakes one for a data partition
        staging = os.path.join(
            os.path.dirname(path),
            f"_staging_{os.path.basename(path)}_{uuid.uuid4().hex[:8]}",
        )
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(partition_by)
        w.parquet(staging)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.replace(staging, path)

    # -- public API ----------------------------------------------------------
    def stage(
        self,
        name: str,
        build,  # () -> DataFrame
        input_fingerprint: str,
    ) -> DataFrame:
        """Run (or replay) a whole stage. Replays iff a marker exists AND its
        recorded lineage fingerprint equals `input_fingerprint`."""
        marker = self._read_marker(name)
        path = self._stage_path(name)
        if marker and marker["fingerprint"] == input_fingerprint and os.path.exists(path):
            self.replayed.append(name)
            return self.spark.read.parquet(path)
        t0 = time.perf_counter()
        df = build()
        self._atomic_write(df, path)
        out = self.spark.read.parquet(path)
        rows = out.count()
        self._write_marker(
            StageRecord(name, "", rows, round(time.perf_counter() - t0, 3),
                        input_fingerprint, time.time())
        )
        self.computed.append(name)
        return out

    def partitioned_stage(
        self,
        name: str,
        partitions: list[str],
        build,  # (partition_value) -> DataFrame
        input_fingerprints: dict[str, str],
        max_parallel: int = 8,
    ) -> DataFrame:
        """Per-partition resumable stage: each partition is computed, written,
        and marked independently; a resumed run replays finished partitions
        and computes only the missing/stale ones (the north rule's
        per-Iceberg-partition checkpoint unit).

        Partitions REMOVED from the input since a previous run are pruned
        (data dir + marker deleted) before the stage root is read — otherwise
        a resumed job would resurrect deleted input rows from the stale
        part= dir ("input advanced underneath me" also covers retreat)."""
        base = self._stage_path(name)
        os.makedirs(base, exist_ok=True)
        keep_dirs = {f"part={p}" for p in partitions}
        for entry in os.listdir(base):
            if entry.startswith("part=") and entry not in keep_dirs:
                shutil.rmtree(os.path.join(base, entry), ignore_errors=True)
                self.replayed = [
                    r for r in self.replayed if r != f"{name}/{entry[5:]}"
                ]
        marker_dir = os.path.join(self.root, "_markers", name)
        if os.path.isdir(marker_dir):
            keep_markers = {f"{p}.json" for p in partitions}
            for mfile in os.listdir(marker_dir):
                if mfile.endswith(".json") and mfile not in keep_markers:
                    os.remove(os.path.join(marker_dir, mfile))
        todo: list[str] = []
        for part in partitions:
            fp = input_fingerprints[part]
            marker = self._read_marker(name, part)
            part_path = os.path.join(base, f"part={part}")
            if marker and marker["fingerprint"] == fp and os.path.exists(part_path):
                self.replayed.append(f"{name}/{part}")
                continue
            todo.append(part)

        def _compute(part: str) -> None:
            fp = input_fingerprints[part]
            part_path = os.path.join(base, f"part={part}")
            t0 = time.perf_counter()
            df = build(part)
            self._atomic_write(df, part_path)
            rows = self.spark.read.parquet(part_path).count()
            self._write_marker(
                StageRecord(name, part, rows, round(time.perf_counter() - t0, 3),
                            fp, time.time())
            )

        # stale/missing partitions compute CONCURRENTLY (bounded pool): each
        # partition's job is small relative to the cluster, so serial
        # submission leaves executors idle — at O(1000) input partitions this
        # is the difference between a full cluster and a one-job trickle.
        # Spark schedules concurrent actions on one session natively; markers
        # stay per-partition atomic, so a failure still preserves every
        # completed partition for resume. Raises the first failure.
        if todo:
            with ThreadPoolExecutor(
                max_workers=min(max_parallel, len(todo))
            ) as pool:
                list(pool.map(_compute, todo))
            self.computed.extend(f"{name}/{p}" for p in todo)
        # read the stage root: part= dirs are discovered as a partition
        # column, _staging_* leftovers are ignored by the reader
        return self.spark.read.parquet(base).drop("part")

    def assert_stable(self, df: DataFrame, recorded: str, cols: list[str] | None = None) -> None:
        """Reference's pre-destructive-action stability re-check
        (deal_with_duplicates.cpp:69-74): abort if the input moved."""
        now = lineage_fingerprint(df, cols)
        if now != recorded:
            raise RuntimeError(
                f"input advanced since scan (was {recorded}, now {now}); "
                "refusing destructive write"
            )

    def metrics(self) -> DataFrame:
        """The lineage/throughput metrics table (stage, partition, rows,
        wall_s, docs_per_sec, fingerprint, finished_ts)."""
        p = os.path.join(self.root, "metrics.jsonl")
        return self.spark.read.json(p)


def run_dedup_checkpointed(
    pages: DataFrame,
    config: DedupConfig,
    root: str,
    partition_col: str = "source",
    run: "CheckpointedRun | None" = None,
) -> DataFrame:
    """Checkpoint-resumable end-to-end dedup.

    Stage graph: ingest+signatures are per-`partition_col` resumable (the
    embarrassingly-parallel 90% of the work at 100 TB); pair generation, CC,
    and representative selection are global stages checkpointed whole. Rerun
    with the same root and unchanged input -> every stage replays; change one
    input partition -> that partition's signatures plus the global suffix
    recompute.
    """
    from dedup_spark.functions.signatures import doc_signature_udf, token_hashes
    from dedup_spark.functions.text import normalize_text
    from dedup_spark.operators.scan import ingest_pages

    spark = pages.sparkSession
    if run is None:
        run = CheckpointedRun(spark, root, config)
    # pass a pre-built CheckpointedRun to inspect run.replayed/run.computed
    # afterwards (replay-vs-recompute evidence)

    # content-based, as the module docstring promises: include the text so a
    # document edited in place under the same (url, warc_ts) recomputes its
    # partition instead of replaying stale signatures. ALL partition
    # fingerprints come from ONE groupBy scan (same n=/h= formula as
    # lineage_fingerprint, so existing markers stay valid) — the per-partition
    # filtered-agg alternative is P full scans of the input when the source
    # table isn't physically partitioned on partition_col, and P jobs even
    # when it is; at the north rule's scale P is O(1000).
    fp_rows = (
        pages.groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.bit_xor(F.xxhash64("url", "warc_ts", "text")).alias("h"),
        )
        .collect()
    )
    # sorted at creation: collect() order is nondeterministic across runs,
    # and stage processing / progress-log order should be stable
    parts = sorted(r[0] for r in fp_rows)
    # "v2|": stage-format version. The prepared parquet now carries the
    # per-doc signature features (simhash, bands); versioning the fingerprint
    # invalidates pre-v2 checkpoints exactly once instead of replaying a
    # schema the global stage can no longer consume.
    fps = {r[0]: f"v2|n={r['n']},h={r['h']}" for r in fp_rows}

    # Per-doc signature features are computed HERE, inside the per-partition
    # resumable stage, not in the global dedup: the fused signature UDF is
    # the single most expensive per-doc stage (~25% of e2e at 600k), and it
    # is embarrassingly parallel per document — so a resume after one changed
    # Iceberg partition re-signs ONE partition, never the corpus. Docs that
    # tokenize to nothing get null features (same set the pipeline's
    # size(_tok) > 0 filter drops); the two-step select pins ONE UDF eval.
    sig_udf = doc_signature_udf(
        config, include_signature=False, include_shingles=False
    )

    def _build(p: str) -> DataFrame:
        ing = ingest_pages(pages.filter(F.col(partition_col) == p), config)
        has_tok = F.size("_tok") > 0
        return (
            ing.select(
                "url", "warc_ts", "text", "lang",
                F.lit(p).alias("source"),
                F.xxhash64(normalize_text("text")).alias("content_hash"),
                token_hashes("text").alias("_tok"),
            )
            .select(
                "url", "warc_ts", "text", "lang", "source", "content_hash",
                "_tok", sig_udf(F.col("_tok")).alias("_s"),
            )
            .select(
                "url", "warc_ts", "text", "lang", "source", "content_hash",
                F.when(has_tok, F.col("_s.simhash")).alias("simhash"),
                F.when(has_tok, F.col("_s.bands")).alias("bands"),
            )
        )

    prepared = run.partitioned_stage("prepared", parts, _build, fps)

    combined_fp = "|".join(f"{p}:{fps[p]}" for p in parts)
    members = run.stage(
        "members",
        lambda: _global_dedup(prepared, config),
        combined_fp,
    )
    return members


def _global_dedup(prepared: DataFrame, config: DedupConfig) -> DataFrame:
    from dedup_spark.plans.pipeline import run_dedup

    # simhash/bands ride through: run_dedup detects the precomputed features
    # and skips the signature UDF entirely (the global suffix is then pair
    # generation + verify + CC — the only genuinely cross-partition work)
    pages = prepared.select(
        "url", "warc_ts", F.lit(None).cast("binary").alias("html"),
        "text", "lang", "source", "simhash", "bands",
    )
    return run_dedup(pages, config).members
