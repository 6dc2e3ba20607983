"""N9: checkpoint/resume, lineage stability, metrics (SURVEY.md §5.2 #3)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from dedup_spark.plans.checkpoint import (
    CheckpointedRun,
    lineage_fingerprint,
    run_dedup_checkpointed,
)


@pytest.fixture()
def root(tmp_path):
    return str(tmp_path / "ckpt")


def test_resume_replays_and_matches(spark, pages, config, root):
    first = run_dedup_checkpointed(pages, config, root).toPandas()
    # second run: everything replays, nothing recomputes, identical output
    run2 = CheckpointedRun(spark, root, config)  # fresh manager for inspection
    second = run_dedup_checkpointed(pages, config, root).toPandas()
    a = sorted(map(tuple, first[["url", "cluster_id"]].values))
    b = sorted(map(tuple, second[["url", "cluster_id"]].values))
    assert a == b
    # markers exist for every stage
    markers = os.listdir(os.path.join(root, "_markers"))
    assert "members.json" in markers and "prepared" in markers


def test_resume_skips_done_partitions(spark, pages, config, root):
    run_dedup_checkpointed(pages, config, root)
    # metrics before rerun
    n_metrics = sum(1 for _ in open(os.path.join(root, "metrics.jsonl")))
    run_dedup_checkpointed(pages, config, root)
    # replay appends no new metrics rows (nothing recomputed)
    assert sum(1 for _ in open(os.path.join(root, "metrics.jsonl"))) == n_metrics


def test_stale_partition_recomputes(spark, pages, config, root):
    run_dedup_checkpointed(pages, config, root)
    # invalidate one partition's marker -> that partition + global suffix rerun
    part_markers = os.listdir(os.path.join(root, "_markers", "prepared"))
    victim = os.path.join(root, "_markers", "prepared", part_markers[0])
    rec = json.load(open(victim))
    rec["fingerprint"] = "n=0,h=0"
    json.dump(rec, open(victim, "w"))
    n_before = sum(1 for _ in open(os.path.join(root, "metrics.jsonl")))
    out = run_dedup_checkpointed(pages, config, root).toPandas()
    n_after = sum(1 for _ in open(os.path.join(root, "metrics.jsonl")))
    # exactly the stale partition recomputes; the global members stage sees
    # an unchanged input lineage fingerprint and correctly replays
    assert n_after == n_before + 1
    assert len(out) > 0


def test_removed_partition_not_resurrected(spark, pages, config, root):
    """A partition dropped from the input must vanish from a resumed run's
    output — stale part= dirs and markers are pruned, not silently re-read."""
    run_dedup_checkpointed(pages, config, root)
    victims = [r[0] for r in pages.select("source").distinct().collect()][:1]
    shrunk = pages.filter(~F.col("source").isin(victims))
    out = run_dedup_checkpointed(shrunk, config, root)
    # no url from the removed partition appears in the resumed output
    gone_urls = {
        r[0] for r in pages.filter(F.col("source").isin(victims)).select("url").collect()
    }
    assert not gone_urls & {r[0] for r in out.select("url").collect()}
    # the stale part dir and marker are physically gone
    part_dirs = os.listdir(os.path.join(root, "stage=prepared"))
    assert f"part={victims[0]}" not in part_dirs
    markers = os.listdir(os.path.join(root, "_markers", "prepared"))
    assert f"{victims[0]}.json" not in markers


def test_text_change_recomputes_partition(spark, pages, config, root):
    """Lineage fingerprints are content-based: editing a doc's text under the
    same (url, warc_ts) must recompute its partition on resume."""
    run_dedup_checkpointed(pages, config, root)
    n_before = sum(1 for _ in open(os.path.join(root, "metrics.jsonl")))
    one_src = [r[0] for r in pages.select("source").distinct().limit(1).collect()][0]
    edited = pages.withColumn(
        "text",
        F.when(
            F.col("source") == one_src, F.concat(F.col("text"), F.lit(" EDITED"))
        ).otherwise(F.col("text")),
    )
    run_dedup_checkpointed(edited, config, root)
    n_after = sum(1 for _ in open(os.path.join(root, "metrics.jsonl")))
    # the edited partition AND the global members stage recompute
    assert n_after >= n_before + 2


def test_lineage_fingerprint_order_independent(spark):
    df1 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, v string")
    df2 = spark.createDataFrame([(3, "c"), (1, "a"), (2, "b")], "id int, v string")
    assert lineage_fingerprint(df1) == lineage_fingerprint(df2)
    df3 = spark.createDataFrame([(1, "a"), (2, "b"), (3, "X")], "id int, v string")
    assert lineage_fingerprint(df1) != lineage_fingerprint(df3)


def test_assert_stable_aborts_on_drift(spark, pages, config, root):
    run = CheckpointedRun(spark, root, config)
    fp = lineage_fingerprint(pages, ["url", "warc_ts"])
    run.assert_stable(pages, fp, ["url", "warc_ts"])  # unchanged -> ok
    drifted = pages.limit(5)
    with pytest.raises(RuntimeError, match="refusing destructive write"):
        run.assert_stable(drifted, fp, ["url", "warc_ts"])


def test_prepared_stage_carries_signature_features(spark, pages, config, root):
    """The per-partition prepared parquet must carry the per-doc signature
    features (simhash, bands): at 100 TB the fused signature UDF is the
    dominant per-doc cost, and computing it inside the per-partition stage is
    what makes a one-partition edit resume WITHOUT re-signing the corpus.
    Also pins the null-for-empty semantics (a doc with no tokens gets null
    features — the set the pipeline's size(_tok) > 0 filter drops)."""
    run_dedup_checkpointed(pages, config, root)
    prep = spark.read.parquet(os.path.join(root, "stage=prepared"))
    assert {"simhash", "bands"} <= set(prep.columns)
    n = prep.count()
    with_feats = prep.filter(F.col("simhash").isNotNull())
    assert with_feats.count() == n  # test corpus: every ingested doc tokenizes
    # features must MATCH the pipeline's own UDF output bit-for-bit
    from dedup_spark.functions.signatures import doc_signature_udf, token_hashes

    recomputed = (
        prep.select("url", token_hashes("text").alias("_tok"))
        .select(
            "url",
            doc_signature_udf(config, include_signature=False, include_shingles=False)(
                F.col("_tok")
            ).alias("_s"),
        )
        .select("url", F.col("_s.simhash").alias("sim2"), F.col("_s.bands").alias("b2"))
    )
    joined = prep.join(recomputed, "url")
    mismatch = joined.filter(
        (F.col("simhash") != F.col("sim2")) | (F.col("bands") != F.col("b2"))
    ).count()
    assert mismatch == 0


def test_precomputed_features_path_identical_to_udf_path(spark, pages, config, root):
    """run_dedup with precomputed simhash/bands on the input (the resume
    path) must produce exactly the clusters the in-pipeline UDF path does."""
    from dedup_spark.plans.pipeline import run_dedup

    direct = run_dedup(pages, config).members.toPandas()
    ckpt = run_dedup_checkpointed(pages, config, root).toPandas()
    a = sorted(map(tuple, direct[["url", "cluster_id", "is_representative"]].values))
    b = sorted(map(tuple, ckpt[["url", "cluster_id", "is_representative"]].values))
    assert a == b


def test_metrics_table(spark, pages, config, root):
    run_dedup_checkpointed(pages, config, root)
    run = CheckpointedRun(spark, root, config)
    m = run.metrics().toPandas()
    assert {"stage", "partition", "rows", "wall_s", "docs_per_sec"} <= set(m.columns)
    assert (m.rows > 0).any()
    assert "members" in set(m.stage)


def test_atomic_write_reclaims_crashed_staging_orphans(spark, config, tmp_path):
    """A crash between the staging write and the rename leaves an orphan
    _staging_<target>_* dir; the next write of the same target must reclaim
    it (repeated crashes on a long-lived checkpoint root must not
    accumulate unbounded dead parquet)."""
    root = str(tmp_path / "ck")
    os.makedirs(os.path.join(root, "stage=pairs"), exist_ok=True)
    run = CheckpointedRun(spark, root, config)
    target = os.path.join(root, "stage=pairs", "v_abc")
    orphan = os.path.join(root, "stage=pairs", "_staging_v_abc_deadbeef")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "w") as f:
        f.write("junk")
    run._atomic_write(spark.range(3).toDF("id"), target)
    entries = os.listdir(os.path.join(root, "stage=pairs"))
    assert "v_abc" in entries
    assert not any(e.startswith("_staging_") for e in entries), entries
    assert spark.read.parquet(target).count() == 3
