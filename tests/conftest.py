"""Shared fixtures: one session-scoped SparkSession, a small synthetic
corpus with planted duplicate classes (mirrors the reference's fixture
strategy, /root/reference/tests/conftest.py:15-138)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from epstein_pipeline_spark.session import get_spark  # noqa: E402
from epstein_pipeline_spark.synth import generate_corpus, pages_to_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", cores=4, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate_corpus(n_pages=400, seed=42, mega_cluster_size=25)


@pytest.fixture(scope="session")
def pages(spark, corpus):
    df = pages_to_spark(spark, corpus, partitions=8)
    df.cache().count()
    return df
