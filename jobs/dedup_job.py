#!/usr/bin/env python
"""spark-submit entry point for the dedup pipeline (north rule packaging).

Usage (cluster):
    zip -r dedup_spark.zip dedup_spark
    spark-submit --py-files dedup_spark.zip jobs/dedup_job.py \
        --input <pages table/path> --output <dir> \
        --checkpoint-dir <dir> --action summarize \
        [--channels exact,minhash,simhash,suffix] [--partition-col source]

Sandbox (local[N]): --input may be a parquet path of the input_hint schema
(url, warc_ts, html, text, lang[, source]); with --synthetic N a deterministic
corpus is generated instead (no external data).

Actions mirror the reference's sink selector
(/root/reference/src/utilities.h:10-14 Action enum): `list` writes the full
member table, `summarize` prints the S5 aggregate, `canonicalize` writes the
kept-set plus a redirects(url, canonical_url) table — the Iceberg-era analogue
of delete/hardlink sinks (SURVEY.md §2.1 S4-S7). `plan` + `apply` are the
batch two-step analogue of the reference's interactive prompt sink (S8):
`plan` writes a reviewable keeper table (keep pre-filled by the O2 policy,
editable), `apply` validates exactly-one-keeper-per-cluster (the
get_valid_number re-prompt loop, batchified as reject-with-error-table) and
emits kept/redirects from the plan's decisions without recomputing.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

# runnable from a checkout without --py-files: add the repo root
_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)


def main(argv: list[str] | None = None, spark=None) -> None:
    ap = argparse.ArgumentParser(description="PySpark near-dup detection job")
    ap.add_argument("--input", help="pages parquet path or Iceberg table")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate a deterministic synthetic corpus of N rows")
    ap.add_argument("--where", action="append", default=[],
                    help="input-selection predicate (SQL boolean expr); "
                         "repeatable, ANDed; predicates on partition columns "
                         "prune partitions at the scan (S2)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint-dir", default=None,
                    help="enable per-partition checkpoint/resume under this dir")
    ap.add_argument("--action", default="summarize",
                    help="'hot-buckets' is the N10 skew preflight: report "
                         "LSH buckets above the exhaustive pair cap "
                         "without running the pipeline",
                    choices=["list", "summarize", "canonicalize", "plan",
                             "apply", "hot-buckets"])
    ap.add_argument("--plan", default=None,
                    help="plan table path for --action apply (written by "
                         "--action plan, optionally edited)")
    ap.add_argument("--input-format", default="table",
                    choices=["table", "warc", "jsonl"],
                    help="'table' (Iceberg name or parquet path, default), "
                         "'warc' (Common Crawl archives), or 'jsonl' "
                         "(one page object per line)")
    ap.add_argument("--extractor", default="simple",
                    choices=["simple", "boilerplate"],
                    help="WARC text extraction: 'simple' (tag-stripping "
                         "regex heuristic, default) or 'boilerplate' "
                         "(tag-aware chrome-subtree + link-density "
                         "stripper, sources/extract.py)")
    ap.add_argument("--channels", default="exact,minhash,simhash")
    ap.add_argument("--partition-col", default="source")
    ap.add_argument("--master", default=None)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--jaccard-threshold", type=float, default=0.7)
    ap.add_argument("--minhash-scheme", default="classic",
                    choices=["classic", "oph"],
                    help="'classic' (128 independent permutations, the "
                         "reference config) or 'oph' (densified one-"
                         "permutation hashing — num_perm-independent "
                         "signature kernel for wide-signature or "
                         "10^12-doc runs)")
    args = ap.parse_args(argv)

    from dedup_spark.catalog import Catalog
    from dedup_spark.config import DedupConfig
    from dedup_spark.plans.pipeline import run_dedup
    from dedup_spark.session import build_session

    channels = tuple(c.strip() for c in args.channels.split(",") if c.strip())
    config = DedupConfig(
        jaccard_threshold=args.jaccard_threshold,
        minhash_scheme=args.minhash_scheme,
        suffix_enabled="suffix" in channels,
        **({"shuffle_partitions": args.shuffle_partitions}
           if args.shuffle_partitions else {}),
    )
    owns_session = spark is None
    if owns_session:
        spark = build_session("dedup_job", master=args.master, config=config)
        spark.sparkContext.setLogLevel("WARN")

    if args.action == "apply":
        # S8 batch analogue, step 2: no pipeline run — the (possibly
        # human-edited) plan written by --action plan is the decision of
        # record. Validation replaces the reference's interactive re-prompt
        # loop: an invalid plan is rejected with a reviewable error table.
        from dedup_spark.operators.representatives import (
            apply_keep_plan,
            validate_keep_plan,
        )

        if not args.plan:
            ap.error("--action apply requires --plan")
        plan = spark.read.parquet(args.plan)
        bad = validate_keep_plan(plan)
        bad_rows = bad.limit(20).collect()
        if bad_rows:
            for r in bad_rows:
                print(
                    f"# invalid plan: cluster {r['cluster_id']} keeps "
                    f"{r['n_kept']} members (must keep exactly 1)",
                    file=sys.stderr,
                )
            sys.exit(2)
        kept, redirects = apply_keep_plan(plan)
        cat = Catalog(spark, args.output)
        cat.write(kept, "kept")
        cat.write(redirects, "redirects")
        n = cat.read("redirects").count()
        print(f"# dedup_job: applied plan, {n} redirects", file=sys.stderr)
        if owns_session:
            spark.stop()
        return

    if args.synthetic:
        from dedup_spark.testdata import corpus_to_spark, make_corpus

        pages = corpus_to_spark(spark, make_corpus(args.synthetic, seed=42))
    else:
        if not args.input:
            ap.error("--input or --synthetic required")
        if args.input_format == "warc":
            from dedup_spark.sources.warc import read_warc_pages

            extractor = None
            if args.extractor == "boilerplate":
                from dedup_spark.sources.extract import extract_text

                extractor = extract_text
            pages = read_warc_pages(spark, args.input, extractor=extractor)
        elif args.input_format == "jsonl":
            from dedup_spark.sources.jsonl import read_jsonl_pages

            pages = read_jsonl_pages(spark, args.input)
        else:
            pages = (
                spark.read.format("iceberg").load(args.input)
                if "." in args.input and "/" not in args.input
                else spark.read.parquet(args.input)
            )
    if args.where:
        from dedup_spark.operators.scan import select_input

        pages = select_input(pages, args.where)

    if args.action == "hot-buckets":
        # N10 audit surface, operator-visible: report every MinHash-LSH
        # bucket above the exhaustive pair cap BEFORE committing to a run —
        # the boilerplate-skew preflight a 100 TB operator wants. Signatures
        # only; no pair generation, no shuffle beyond one count agg.
        from pyspark.sql import functions as F

        from dedup_spark.functions.signatures import (
            doc_signature_udf,
            token_hashes,
        )
        from dedup_spark.operators.lsh import hot_buckets
        from dedup_spark.operators.scan import ingest_pages

        udf = doc_signature_udf(
            config, include_signature=False, include_shingles=False
        )
        banded = (
            ingest_pages(pages, config)
            .select(
                F.col("url").alias("id"),
                token_hashes("text").alias("_tok"),
            )
            .filter(F.size("_tok") > 0)
            .select("id", udf(F.col("_tok")).alias("_s"))
            .select("id", F.col("_s.bands").alias("band_keys"))
        )
        hb = hot_buckets(banded, config)
        cat = Catalog(spark, args.output)
        cat.write(hb, "hot_buckets")
        # read the WRITTEN table for the report: collecting from `hb` would
        # re-run the whole ingest+signature lineage (the signature UDF is
        # the most expensive per-doc stage) a second time
        written = cat.read("hot_buckets")
        for r in written.orderBy(F.desc("n_members")).limit(20).collect():
            print(
                f"# hot bucket band={r['band_idx']} key={r['band_key']} "
                f"members={r['n_members']}",
                file=sys.stderr,
            )
        print(f"# dedup_job: {written.count()} hot buckets above the "
              "all-pairs cap", file=sys.stderr)
        if owns_session:
            spark.stop()
        return

    t0 = time.perf_counter()
    if args.checkpoint_dir:
        from dedup_spark.plans.checkpoint import run_dedup_checkpointed

        members = run_dedup_checkpointed(
            pages, config, args.checkpoint_dir, partition_col=args.partition_col
        )
        summary = None
    else:
        res = run_dedup(pages, config, channels=channels)
        members, summary = res.members, res.summary

    cat = Catalog(spark, args.output)
    if args.action == "list":
        cat.write(members, "members")
    elif args.action == "summarize":
        from dedup_spark.operators.summarize import format_bytes, summarize_clusters

        s = summary if summary is not None else summarize_clusters(members)
        row = s.collect()[0].asDict()
        print(json.dumps(row))
        if row.get("bytes_reclaimable") is not None:
            # reference report formatting (src/deal_with_duplicates.cpp:273-306)
            print(
                f"# {row['n_duplicate_docs']} duplicate docs in "
                f"{row['n_duplicate_sets']} sets, "
                f"{format_bytes(row['bytes_reclaimable'])} reclaimable",
                file=sys.stderr,
            )
        cat.write(s, "summary")
    elif args.action == "plan":
        # S8 batch analogue, step 1: write a reviewable keeper plan —
        # (cluster_id, url, keep, source_rank, warc_ts, doc_bytes) with
        # keep pre-filled by the O2 keep policy. A human (or policy job)
        # may flip `keep` bits before `apply`; this replaces the
        # reference's per-cluster interactive selection
        # (/root/reference/src/deal_with_duplicates.cpp:104-162) with a
        # reviewed-artifact two-step that works at batch scale.
        from pyspark.sql import functions as F

        plan = members.select(
            "cluster_id",
            "url",
            F.col("is_representative").alias("keep"),
            *[c for c in ("source_rank", "warc_ts", "doc_bytes")
              if c in members.columns],
        )
        cat.write(plan, "plan")
    else:  # canonicalize: kept set + redirects table (S6/S7 analogue)
        from pyspark.sql import functions as F

        cat.write(members.filter("is_representative").select("url"), "kept")
        reps = members.filter("is_representative").select(
            "cluster_id", F.col("url").alias("canonical_url")
        )
        redirects = (
            members.filter(~F.col("is_representative"))
            .join(reps, "cluster_id")
            .select("url", "canonical_url")
        )
        cat.write(redirects, "redirects")

    n = members.count()
    dt = time.perf_counter() - t0
    print(f"# dedup_job: {n} member rows in {dt:.1f}s", file=sys.stderr)
    if owns_session:
        spark.stop()


if __name__ == "__main__":
    main()
