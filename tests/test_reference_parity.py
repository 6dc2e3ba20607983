"""Direct parity with the reference binary (/root/reference, built on the
fly): our exact channel must produce the reference's duplicate groups on the
same content.

This is the strongest form of the §2.8 contract check: not a reimplemented
oracle but the actual C++ tool — each synthetic page's text dumped to a file,
`dedup -l` run over the directory, its blank-line-separated cluster listing
parsed back, and compared 1:1 against `exact_dup_members` cluster sets.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from dedup_spark.operators.exact import exact_dup_members
from dedup_spark.operators.scan import ingest_pages

REF_SRC = Path("/root/reference/src")
BIN = Path("/tmp/refbuild/dedup")


@pytest.fixture(scope="module")
def ref_binary():
    if BIN.exists():
        return str(BIN)
    if not shutil.which("g++") or not REF_SRC.exists():
        pytest.skip("reference sources or g++ unavailable")
    BIN.parent.mkdir(parents=True, exist_ok=True)
    srcs = [
        "main.cpp", "parse.cpp", "utilities.cpp", "find_duplicates_base.cpp",
        "find_duplicates_map.cpp", "find_duplicates_map_two.cpp",
        "find_duplicates_vector.cpp", "find_duplicates_vector_no_hash.cpp",
        "deal_with_duplicates.cpp",
    ]
    cmd = (
        ["g++", "-std=c++17", "-O2", "-I/root/reference/third_party",
         f"-I{REF_SRC}"] + [str(REF_SRC / s) for s in srcs] + ["-o", str(BIN)]
    )
    subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    return str(BIN)


def _parse_clusters(stdout: str) -> list[set[str]]:
    """Blank-line separated groups of file paths after the summary block."""
    lines = stdout.splitlines()
    # cluster listing = lines that are absolute paths, grouped by blank lines
    clusters, cur = [], set()
    for ln in lines:
        if ln.startswith("/"):
            cur.add(Path(ln).name)
        elif cur:
            clusters.append(cur)
            cur = set()
    if cur:
        clusters.append(cur)
    return clusters


@pytest.fixture(scope="module")
def parity_setup(spark, pages, config, ref_binary, tmp_path_factory):
    docs_dir = tmp_path_factory.mktemp("ref_docs")
    ingested = ingest_pages(pages, config)
    rows = ingested.select("url", "text").collect()
    url_of = {}
    for i, r in enumerate(rows):
        name = f"doc{i:05d}.txt"
        (docs_dir / name).write_bytes(r.text.encode("utf-8"))
        url_of[name] = r.url
    out = subprocess.run(
        [ref_binary, "-l", str(docs_dir)],
        capture_output=True, text=True, timeout=300, check=True,
    )
    ref_clusters = {
        frozenset(url_of[n] for n in c) for c in _parse_clusters(out.stdout)
    }
    ours = exact_dup_members(ingested, "url", "text", config).toPandas()
    our_clusters = {
        frozenset(g.id) for _, g in ours.groupby("exact_cluster_id")
    }
    return ref_clusters, our_clusters, out.stdout, len(ours)


def test_exact_clusters_match_reference_binary(parity_setup):
    ref_clusters, our_clusters, _, _ = parity_setup
    assert ref_clusters == our_clusters


def test_summary_counts_match_reference(parity_setup):
    ref_clusters, _, stdout, n_members = parity_setup
    import re

    m = re.search(r"Found (\d+) duplicate files in (\d+) sets?\.", stdout)
    assert m, stdout[-500:]
    n_dup_files, n_sets = int(m.group(1)), int(m.group(2))
    assert n_sets == len(ref_clusters)
    # reference counts sum(n-1) duplicates; our member table has all n
    assert n_dup_files == n_members - n_sets
