"""S2 input selection + spark-submit CLI smoke (SURVEY.md §2.1 S2/S4).

The reference canonicalizes CLI paths, rejects bad ones and warns on
duplicates (/root/reference/src/parse.cpp:28-66); the cluster analogue is a
validated predicate list whose partition-column predicates reach the parquet
scan as PartitionFilters (metadata-only pruning, no data read for excluded
partitions).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.scan import select_input, validate_predicates


def test_validate_predicates_dedup_and_strip(capsys):
    got = validate_predicates(["source = 'src1'", "  source   =  'src1' ", "", "lang='en'"])
    assert got == ["source = 'src1'", "lang='en'"]
    assert "duplicate predicate" in capsys.readouterr().err


@pytest.mark.parametrize("bad", ["source = 'src1", "f(x", 'lang = "en'])
def test_validate_predicates_rejects_unbalanced(bad):
    with pytest.raises(ValueError, match="unbalanced"):
        validate_predicates([bad])


@pytest.fixture(scope="module")
def partitioned_pages(spark, pages, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("pages_part") / "pages")
    pages.write.partitionBy("source").mode("overwrite").parquet(path)
    return path


def test_partition_predicate_prunes_scan(spark, partitioned_pages):
    df = spark.read.parquet(partitioned_pages)
    pruned = select_input(df, ["source = 'src1'"])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "src1" in plan
    # pruning is metadata-only: the non-partition data filters list stays empty
    srcs = [r[0] for r in pruned.select("source").distinct().collect()]
    assert srcs == ["src1"]


def test_format_bytes_reference_parity():
    """Exact semantics of /root/reference/src/utilities.cpp:203-222: divide
    while strictly > 1024, fixed two decimals, kibi..pebi prefixes."""
    from dedup_spark.operators.summarize import format_bytes

    assert format_bytes(0) == "0.00 bytes"
    assert format_bytes(1024) == "1024.00 bytes"  # ref loop is > 1024
    assert format_bytes(1025) == "1.00 kibibytes"
    assert format_bytes(5 * 1024**2) == "5.00 mebibytes"
    assert format_bytes(int(2.5 * 1024**3)) == "2.50 gibibytes"
    assert format_bytes(1024**5 + 1) == "1.00 pebibytes"


def test_cli_where_end_to_end(spark, partitioned_pages, tmp_path):
    from jobs.dedup_job import main

    out = str(tmp_path / "out")
    main(
        [
            "--input", partitioned_pages,
            "--output", out,
            "--action", "list",
            "--channels", "exact",
            "--where", "source = 'src1'",
        ],
        spark=spark,
    )
    members = spark.read.parquet(os.path.join(out, "members"))
    assert members.count() > 0
    urls = members.select("url")
    full = spark.read.parquet(partitioned_pages)
    joined = urls.join(full, "url").select("source").distinct().collect()
    assert [r[0] for r in joined] == ["src1"]


def test_cli_plan_apply_roundtrip(spark, partitioned_pages, tmp_path):
    """S8 batch analogue: plan -> (edit) -> apply honors the edited keeper."""
    from jobs.dedup_job import main

    out = str(tmp_path / "plan_out")
    main(
        ["--input", partitioned_pages, "--output", out,
         "--action", "plan", "--channels", "exact"],
        spark=spark,
    )
    plan_path = os.path.join(out, "plan")
    plan = spark.read.parquet(plan_path)
    assert set(["cluster_id", "url", "keep"]) <= set(plan.columns)
    per = plan.groupBy("cluster_id").agg(
        F.sum(F.col("keep").cast("int")).alias("k")
    )
    assert per.filter("k != 1").count() == 0

    # flip the keeper in one cluster (the human-edit step)
    pdf = plan.toPandas().sort_values(["cluster_id", "url"]).reset_index(drop=True)
    cid = pdf.cluster_id.iloc[0]
    grp = pdf[pdf.cluster_id == cid]
    pdf.loc[grp.index, "keep"] = ~grp.keep.values
    edited_path = str(tmp_path / "edited_plan")
    spark.createDataFrame(pdf, schema=plan.schema).write.parquet(edited_path)

    out2 = str(tmp_path / "apply_out")
    main(
        ["--output", out2, "--action", "apply", "--plan", edited_path],
        spark=spark,
    )
    redirects = spark.read.parquet(os.path.join(out2, "redirects"))
    kept = spark.read.parquet(os.path.join(out2, "kept"))
    # the flipped cluster's new keeper is kept and its old keeper redirects
    new_keeper = grp[~grp.keep].url.iloc[0]  # was False, now True
    old_keeper = grp[grp.keep].url.iloc[0]
    assert kept.filter(F.col("url") == new_keeper).count() == 1
    assert redirects.filter(
        (F.col("url") == old_keeper) & (F.col("canonical_url") == new_keeper)
    ).count() == 1


def test_cli_apply_rejects_invalid_plan(spark, tmp_path):
    from jobs.dedup_job import main

    bad = spark.createDataFrame(
        [("c1", "u1", True), ("c1", "u2", True), ("c2", "u3", False)],
        ["cluster_id", "url", "keep"],
    )
    bad_path = str(tmp_path / "bad_plan")
    bad.write.parquet(bad_path)
    with pytest.raises(SystemExit) as ei:
        main(["--output", str(tmp_path / "o"), "--action", "apply",
              "--plan", bad_path], spark=spark)
    assert ei.value.code == 2


def test_spark_submit_py_files_packaging(tmp_path):
    """North-rule packaging smoke: the job runs under REAL spark-submit with
    the package shipped ONLY via --py-files (the entry script is copied out
    of the checkout and PYTHONPATH is scrubbed, so `import dedup_spark` can
    resolve through the zip alone)."""
    import shutil
    import subprocess
    import sys
    import zipfile

    spark_submit = shutil.which("spark-submit")
    if spark_submit is None:
        pytest.skip("spark-submit not on PATH")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = tmp_path / "dedup_spark.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "dedup_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    entry = tmp_path / "dedup_job.py"
    shutil.copy(os.path.join(repo, "jobs", "dedup_job.py"), entry)

    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(
        [spark_submit, "--master", "local[2]", "--py-files", str(zpath),
         str(entry), "--synthetic", "300", "--output", str(tmp_path / "out"),
         "--action", "summarize", "--shuffle-partitions", "4"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    assert "n_duplicate" in out.stdout + out.stderr, (out.stdout, out.stderr[-1500:])


def _cli_warc_record(url: str, date: str, html: str) -> bytes:
    body = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html.encode()
    )
    headers = [
        b"WARC/1.0",
        b"WARC-Type: response",
        b"WARC-Target-URI: " + url.encode(),
        b"WARC-Date: " + date.encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    return b"\r\n".join(headers) + b"\r\n\r\n" + body + b"\r\n\r\n"


def test_cli_warc_roundtrip_end_to_end(spark, tmp_path):
    """VERDICT r3 #9: raw Common Crawl archives -> full pipeline ->
    canonicalize sinks through the ONE CLI entry point (--input-format warc).
    The pieces (WARC parse, dedup, sinks) each have their own tests; this
    pins the composition a user actually runs."""
    import gzip as _gzip

    from jobs.dedup_job import main

    dup_html = "<html><body><p>shared boilerplate page body</p></body></html>"
    arch = tmp_path / "archives"
    arch.mkdir()
    (arch / "seg0.warc").write_bytes(
        _cli_warc_record("https://a.example/1", "2024-01-02T03:04:05Z", dup_html)
        + _cli_warc_record(
            "https://a.example/unique", "2024-01-02T03:04:06Z",
            "<html><body>totally different text lives here</body></html>",
        )
    )
    (arch / "seg1.warc.gz").write_bytes(
        _gzip.compress(
            _cli_warc_record(
                "https://b.example/2", "2024-01-03T00:00:00Z", dup_html
            )
        )
    )

    out = str(tmp_path / "out")
    main(
        [
            "--input", str(arch),
            "--input-format", "warc",
            "--output", out,
            "--action", "canonicalize",
            "--channels", "exact,minhash,simhash",
            "--shuffle-partitions", "4",
        ],
        spark=spark,
    )
    kept = {r[0] for r in spark.read.parquet(os.path.join(out, "kept")).collect()}
    redirects = {
        (r["url"], r["canonical_url"])
        for r in spark.read.parquet(os.path.join(out, "redirects")).collect()
    }
    # the two byte-identical pages collapse to one keeper + one redirect;
    # the unique page is in no duplicate cluster, so it appears in NEITHER
    # sink (kept/redirects describe duplicate sets, the reference's S6/S7)
    assert "https://a.example/unique" not in kept
    dup_urls = {"https://a.example/1", "https://b.example/2"}
    assert len(dup_urls & kept) == 1
    (loser,) = dup_urls - kept
    (winner,) = dup_urls & kept
    assert (loser, winner) in redirects
    assert not any(u == "https://a.example/unique" for u, _ in redirects)


def test_cli_hot_buckets_preflight(spark, tmp_path):
    """--action hot-buckets: the N10 skew audit through the CLI — report
    LSH buckets above the exhaustive pair cap BEFORE running the pipeline
    (signatures + one count agg only; no pair generation)."""
    from pyspark.sql import functions as F

    from jobs.dedup_job import main

    boiler = "identical boilerplate page body repeated across the crawl " * 4
    rows = [
        (f"https://h/dup{i}", "2024-01-01 00:00:00", boiler, "en", "s0")
        for i in range(70)  # one content class > PAIR_CAP_ALL(64)
    ] + [
        (f"https://h/u{i}", "2024-01-01 00:00:00",
         f"wholly unique page number {i} with its own words {i * 17}", "en", "s0")
        for i in range(10)
    ]
    src = str(tmp_path / "pages")
    (
        spark.createDataFrame(
            rows, "url string, warc_ts string, text string, lang string, source string"
        )
        .withColumn("warc_ts", F.to_timestamp("warc_ts"))
        .withColumn("html", F.lit(None).cast("binary"))
        .write.parquet(src)
    )
    out = str(tmp_path / "out")
    main(
        [
            "--input", src,
            "--output", out,
            "--action", "hot-buckets",
            "--shuffle-partitions", "4",
        ],
        spark=spark,
    )
    hb = spark.read.parquet(os.path.join(out, "hot_buckets"))
    got = hb.collect()
    # identical texts share every band: all 32 band buckets are hot with
    # exactly the 70-member content class
    assert len(got) > 0
    assert all(r["n_members"] == 70 for r in got)
    # no members/summary artifacts: the preflight must not run the pipeline
    assert not os.path.exists(os.path.join(out, "members"))
    assert not os.path.exists(os.path.join(out, "summary"))


def test_cli_warc_boilerplate_extractor(spark, tmp_path):
    """--extractor boilerplate swaps the WARC text seam to the tag-aware
    stripper: two crawls of the same article differing only in site chrome
    must become EXACT duplicates under it (the real-crawl payoff the regex
    seam can't deliver — there they stay distinct)."""
    from jobs.dedup_job import main

    body = "<main><p>the one true article body with enough words to keep"
    body += " and dedup on</p></main>"
    page_a = (
        "<html><body><nav><a href='/'>Home</a> <a href='/a'>About</a></nav>"
        + body + "<footer><a href='/tos'>Terms</a></footer></body></html>"
    )
    page_b = (
        "<html><body><nav><a href='/x'>Start</a> <a href='/y'>Docs</a></nav>"
        + body + "<footer><a href='/p'>Privacy</a> © 2024</footer></body></html>"
    )
    arch = tmp_path / "arch"
    arch.mkdir()
    (arch / "seg.warc").write_bytes(
        _cli_warc_record("https://x.example/a", "2024-01-02T03:04:05Z", page_a)
        + _cli_warc_record("https://x.example/b", "2024-01-02T03:04:06Z", page_b)
    )

    def run(extractor, tag):
        out = str(tmp_path / f"out_{tag}")
        main(
            [
                "--input", str(arch),
                "--input-format", "warc",
                "--extractor", extractor,
                "--output", out,
                "--action", "plan",
                "--channels", "exact",
                "--shuffle-partitions", "4",
            ],
            spark=spark,
        )
        return spark.read.parquet(os.path.join(out, "plan")).collect()

    from dedup_spark.sources.extract import extract_text

    plan = run("boilerplate", "b")
    # chrome stripped -> byte-identical text -> one 2-member exact cluster
    assert len(plan) == 2
    assert {r["url"] for r in plan} == {"https://x.example/a", "https://x.example/b"}
    assert all(r["doc_bytes"] == len(extract_text(page_a)) for r in plan)
    # the regex seam keeps differing nav/footer text: no duplicates
    assert run("simple", "s") == []
