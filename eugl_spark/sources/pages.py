"""Input connectors for the pages table (S1/S2 in SURVEY.md §2.1).

The reference abstracts its archive layouts behind FileArchive
(zip/tar/dir, /root/reference/eugl/fmask.py:477-554); ours abstracts
the table source: Iceberg catalog table in production (snapshot
isolation, partition-level overwrite for resume), partitioned parquet
locally, and a binaryFile scan for raw WARC-ish drops. Iceberg jars
are not in this environment, so that path is import-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from eugl_spark.streaming.stream import PAGES_SCHEMA


def iceberg_available(spark: SparkSession) -> bool:
    try:
        # Class.forName: py4j package attribute access is lazy and
        # never raises, so it can't be used as an existence probe
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.catalog.Catalog"
        )
        return True
    except Exception:
        return False


def read_pages(spark: SparkSession, source: str) -> DataFrame:
    """Load the pages table from an Iceberg table name or a parquet path.

    `catalog.db.tbl` (no slash) → Iceberg table read (predicate and
    partition pruning via table metadata); anything path-like →
    schema-pinned parquet (no inference at 10^12 rows).
    """
    if "/" not in source and iceberg_available(spark):
        return spark.read.format("iceberg").load(source)
    return spark.read.schema(PAGES_SCHEMA).parquet(source)


def read_raw_drops(spark: SparkSession, path: str, pattern: str = "*.warc") -> DataFrame:
    """Raw-file scan (S1 analog of the archive scan): one row per file,
    content as binary + path metadata; the glob filter is the
    fnmatch-extract pattern of FileArchive.extract_file
    (/root/reference/eugl/fmask.py:508-554)."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .load(path)
        .select(
            F.col("path"),
            F.col("modificationTime").alias("mtime"),
            F.col("length").alias("n_bytes"),
            F.col("content"),
        )
    )


def write_pages(df: DataFrame, target: str) -> None:
    """Partitioned write: Iceberg overwrite-partitions when the target
    is a table, dynamic-overwrite parquet otherwise (same semantics the
    lineage runner relies on)."""
    if "/" not in target and iceberg_available(df.sparkSession):
        df.writeTo(target).overwritePartitions()
        return
    (
        df.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bucket")
        .parquet(target)
    )
