"""Driver contract for the spark-graft builder (PySpark target).

entry()      → flagship query (per-source keep-rate over documents,
               the A1/A2 per-class-distribution analog of the
               reference's fmask metadata histogram,
               /root/reference/eugl/metadata.py:115-155).
queries()    → every implemented operator from SURVEY.md §2 plus the
               training-data-pipeline suite (dedup, similarity,
               text analysis, UDF model stages).
oracle_sql() → DuckDB-equivalent SQL for each SQL-expressible query.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from eugl_spark.plans.queries import REGISTRY

    return REGISTRY["qf_keep_rate_by_source"].spark(
        spark, "/root/testdata/sf0.001"
    )


_SHIPPED: set[int] = set()


def _wrap(fn: Callable) -> Callable:
    """Ship the package to Python workers once per session: the driver
    may run queries on its own vanilla SparkSession, and the pandas-UDF
    queries need eugl_spark importable on workers (--py-files analog)."""

    def inner(spark: SparkSession, sf_dir: str) -> DataFrame:
        if id(spark) not in _SHIPPED:
            try:
                from eugl_spark.session import _ship_package

                _ship_package(spark)
            except Exception:
                pass
            _SHIPPED.add(id(spark))
        return fn(spark, sf_dir)

    return inner


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from eugl_spark.plans.queries import REGISTRY

    return {name: _wrap(qry.spark) for name, qry in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from eugl_spark.plans.queries import (
        REGISTRY,
        ensure_entry_corpus,
        ensure_link_corpus,
        ensure_robots_corpus,
        ensure_warc_blobs,
    )

    # the end-to-end corpus, web-graph, WARC and robots oracles read
    # deterministic fixture files; materialize them here too in case
    # the driver runs SQL before Spark
    ensure_entry_corpus()
    ensure_link_corpus()
    ensure_warc_blobs()
    ensure_robots_corpus()
    return {
        name: qry.sql for name, qry in REGISTRY.items() if qry.sql is not None
    }
