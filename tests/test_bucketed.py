"""Bucketed-layout gates: the shuffle that bucketing claims to remove
must actually be absent from the executed plan, and the results must
be byte-identical to the shuffling plan they replace.

Each test pins one leg of the scale story in bucketed.py's docstring:
a host-bucketed corpus makes host aggregations and host joins
Exchange-free, an unbucketed control still shuffles (so the gate is
meaningful, not vacuously green), and the layout survives a catalog
restart via attach_bucketed.
"""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F

from eugl_spark.sources.bucketed import (
    attach_bucketed,
    drop_table,
    schema_ddl,
    with_host,
    write_bucketed,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@contextlib.contextmanager
def _no_broadcast(spark):
    """Force the sort-merge path so the no-Exchange assertion tests
    bucketing, not the broadcast planner picking the small fixture."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


@pytest.fixture(scope="module")
def hosted(spark, pages_path):
    """The pages corpus (input_hint schema: url is the key) with the
    canonical host column."""
    pages = spark.read.parquet(pages_path)
    return with_host(pages.select("url", "lang", "text"))


@pytest.fixture(scope="module")
def bucketed_pair(spark, hosted, tmp_path_factory):
    """Two host-bucketed tables with the same bucket count — the
    corpus and a host-keyed stats table derived from it."""
    root = tmp_path_factory.mktemp("bucketed")
    write_bucketed(
        hosted, "bkt_docs", str(root / "docs"), n_buckets=8, sort_cols=("url",)
    )
    stats = hosted.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    write_bucketed(stats, "bkt_stats", str(root / "stats"), n_buckets=8)
    yield "bkt_docs", "bkt_stats", str(root)
    drop_table(spark, "bkt_docs")
    drop_table(spark, "bkt_stats")


def test_bucketed_roundtrip_equals_input(spark, hosted, bucketed_pair):
    docs_tbl, _, _ = bucketed_pair
    got = sorted(spark.table(docs_tbl).collect())
    want = sorted(hosted.collect())
    assert got == want


def test_host_rollup_no_exchange_on_bucketed(spark, bucketed_pair):
    """groupBy(host) over the bucketed corpus: zero Exchange — the
    aggregation runs at scan parallelism inside each bucket."""
    docs_tbl, _, _ = bucketed_pair
    agg = spark.table(docs_tbl).groupBy("host").agg(
        F.count(F.lit(1)).alias("n")
    )
    p = _plan(agg)
    assert "Exchange" not in p, p


def test_host_rollup_control_shuffles(spark, hosted):
    """The SAME rollup over the plain parquet read must shuffle —
    proves the gate above measures bucketing, not a planner accident."""
    agg = hosted.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    assert "Exchange" in _plan(agg)


def test_host_join_no_exchange_when_both_bucketed(spark, bucketed_pair):
    docs_tbl, stats_tbl, _ = bucketed_pair
    with _no_broadcast(spark):
        j = spark.table(docs_tbl).join(spark.table(stats_tbl), "host")
        p = _plan(j)
        assert "SortMergeJoin" in p, p
        assert "Exchange" not in p, p


def test_host_join_control_shuffles(spark, hosted):
    stats = hosted.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    with _no_broadcast(spark):
        p = _plan(hosted.join(stats, "host"))
        assert "Exchange" in p


def test_bucketed_join_matches_shuffle_join(spark, hosted, bucketed_pair):
    """Plan changes, answers don't: the bucketed join returns exactly
    the rows of the shuffling join over the same inputs."""
    docs_tbl, stats_tbl, _ = bucketed_pair
    with _no_broadcast(spark):
        got = sorted(
            spark.table(docs_tbl)
            .join(spark.table(stats_tbl), "host")
            .select("url", "host", "n_docs", "n_chars")
            .collect()
        )
    stats = hosted.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("n_chars"),
    )
    want = sorted(
        hosted.join(stats, "host")
        .select("url", "host", "n_docs", "n_chars")
        .collect()
    )
    assert got == want


def test_attach_after_catalog_loss(spark, hosted, bucketed_pair):
    """Dropping the catalog entry loses nothing: attach_bucketed
    re-registers the same files with the same bucket spec and the
    shuffle-free plan comes back."""
    docs_tbl, _, root = bucketed_pair
    ddl = schema_ddl(spark.table(docs_tbl))
    drop_table(spark, docs_tbl)
    attach_bucketed(
        spark,
        docs_tbl,
        f"{root}/docs",
        ddl,
        n_buckets=8,
        sort_cols=("url",),
    )
    agg = spark.table(docs_tbl).groupBy("host").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert "Exchange" not in _plan(agg)
    assert spark.table(docs_tbl).count() == hosted.count()
