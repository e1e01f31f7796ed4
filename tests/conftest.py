from __future__ import annotations

import pytest

from sift_kg_spark import DedupConfig, get_spark
from sift_kg_spark.fixtures import generate_corpus


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="sift_kg_spark_tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> DedupConfig:
    return DedupConfig()


@pytest.fixture(scope="session")
def corpus():
    """(pages_pdf incl. true_text, expected_pairs, expected_clusters,
    expected_flagged) — 400 deterministic pages."""
    return generate_corpus(400, seed=42)


@pytest.fixture(scope="session")
def pages_df(spark, corpus):
    pages_pdf = corpus[0].drop(columns=["true_text"])
    return spark.createDataFrame(pages_pdf)


@pytest.fixture(scope="session")
def dedup_result(spark, pages_df, cfg):
    from sift_kg_spark.pipeline import run_dedup

    return run_dedup(spark, pages_df, cfg)
