from __future__ import annotations

import pytest

from dedup_spark.config import DedupConfig
from dedup_spark.session import build_session
from dedup_spark.testdata import corpus_to_spark, make_corpus


@pytest.fixture(scope="session")
def spark():
    s = build_session("dedup_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def config():
    return DedupConfig(shuffle_partitions=8)


@pytest.fixture(scope="session")
def corpus():
    return make_corpus(n_rows=600, seed=42)


@pytest.fixture(scope="session")
def pages(spark, corpus):
    df = corpus_to_spark(spark, corpus)
    df.persist().count()
    return df
