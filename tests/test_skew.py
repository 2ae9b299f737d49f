"""Skew-handling evidence (north_rule): with Zipf hosts, hashing on
host alone concentrates the hottest host in one partition; adding the
url salt splits it across SALT_FACTOR partitions. Measured on the
synthetic corpus's Zipf host distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from eugl_spark import constants as C
from eugl_spark.pipeline import host, salt


def _max_partition_fraction(df) -> float:
    sizes = (
        df.groupBy(F.spark_partition_id().alias("p"))
        .count()
        .collect()
    )
    total = sum(r["count"] for r in sizes)
    return max(r["count"] for r in sizes) / total


def test_salting_splits_hot_host(spark, pages_path):
    pages = spark.read.parquet(pages_path).drop("_case")
    n_part = 16

    unsalted = pages.repartition(n_part, host(F.col("url")))
    salted = pages.repartition(n_part, host(F.col("url")), salt(F.col("url")))

    f_unsalted = _max_partition_fraction(unsalted)
    f_salted = _max_partition_fraction(salted)

    # the hottest host is ~17% of rows (Zipf); unsalted puts it (plus
    # hash collisions) in one partition
    assert f_unsalted > 0.15, f_unsalted
    # salting must materially flatten the hottest partition (small
    # corpus → residual collisions keep it above the 1/16 ideal)
    assert f_salted < f_unsalted * 0.85, (f_salted, f_unsalted)
    assert f_salted < 0.25, f_salted


def test_hot_host_spans_many_partitions(spark, pages_path):
    pages = spark.read.parquet(pages_path).drop("_case")
    hot = (
        pages.groupBy(host(F.col("url")).alias("h"))
        .count()
        .orderBy(F.desc("count"))
        .first()["h"]
    )
    n_part = 32
    salted = pages.repartition(n_part, host(F.col("url")), salt(F.col("url")))
    spread = (
        salted.filter(host(F.col("url")) == hot)
        .select(F.spark_partition_id().alias("p"))
        .distinct()
        .count()
    )
    # SALT_FACTOR salt keys spread the hot host across up to
    # min(SALT_FACTOR, n_partitions) partitions (minus hash collisions)
    expected = min(C.SALT_FACTOR, n_part)
    assert spread >= expected // 2, (spread, expected)
