"""Shared pytest fixtures: one SparkSession per test run, corpora on tmp."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from eugl_spark.corpus import write_pages_parquet  # noqa: E402
from eugl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("eugl_spark_tests", cores=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory) -> str:
    path = str(tmp_path_factory.mktemp("corpus") / "pages.parquet")
    return write_pages_parquet(path, n_rows=1200, seed=42)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
