"""Tier-3: the driver contract — every queries() entry vs its DuckDB
oracle at sf0.01 (row count + columns + order-insensitive values)."""

from __future__ import annotations

import pytest

from eugl_spark.plans.compare import duck_connection, run_one
from eugl_spark.plans.queries import REGISTRY


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duck_connection(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_vs_oracle(spark, con, sf_dir, name):
    res = run_one(spark, con, name, sf_dir)
    assert res["rows_match"], res
    assert res["cols_match"], res
    if REGISTRY[name].sql is not None:
        assert res["values_match"], res["diff"]


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
