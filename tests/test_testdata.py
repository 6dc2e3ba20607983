"""Synthetic corpora: determinism + schema contracts (input_hint invariant)."""

from __future__ import annotations

import pandas as pd

from dedup_spark.testdata import make_corpus, synth_pages_spark


def test_make_corpus_deterministic():
    a = make_corpus(300, seed=42)
    b = make_corpus(300, seed=42)
    pd.testing.assert_frame_equal(a.pages, b.pages)
    pd.testing.assert_frame_equal(a.golden_clusters, b.golden_clusters)
    c = make_corpus(300, seed=43)
    assert not a.pages.text.equals(c.pages.text)


def test_synth_pages_spark_schema_and_determinism(spark):
    df = synth_pages_spark(spark, 500)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang", "source",
    ]
    a = df.orderBy("url").select("url", "text").toPandas()
    b = (
        synth_pages_spark(spark, 500)
        .repartition(13)  # different physical plan, same bytes
        .orderBy("url")
        .select("url", "text")
        .toPandas()
    )
    pd.testing.assert_frame_equal(a, b)


def test_synth_pages_planted_dups(spark):
    from pyspark.sql import functions as F

    df = synth_pages_spark(spark, 1000)
    groups = (
        df.groupBy("text").count().filter(F.col("count") >= 2).toPandas()
    )
    # ids with id%100 < 8 duplicate within their 4-block: 2 groups per 100 ids
    assert len(groups) == 20
    assert set(groups["count"]) == {4}
