"""Archive-member extraction contract (S2/F11) + bucket compaction (K4).

Mirrors the reference's five extract_file cases
(/root/reference/eugl/test_fmask.py:45-81: exact hit, glob hit,
content intact, no match → error, multiple match → error) and its
finalize/compaction step (/root/reference/eugl/fmask.py:695-756:
rewrite, content unchanged)."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eugl_spark.sources.pages import compact_bucket, extract_single


@pytest.fixture(scope="module")
def drop_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("drops")
    (d / "a.warc").write_bytes(b"WARC/1.0 alpha")
    (d / "b.warc").write_bytes(b"WARC/1.0 beta")
    (d / "c.txt").write_bytes(b"not a warc")
    return str(d)


def test_extract_exact_name(spark, drop_dir):
    df = extract_single(spark, drop_dir, "a.warc")
    assert df.count() == 1


def test_extract_glob_single(spark, drop_dir):
    df = extract_single(spark, drop_dir, "*.txt")
    assert df.count() == 1


def test_extract_content_intact(spark, drop_dir):
    row = extract_single(spark, drop_dir, "a.warc").collect()[0]
    assert bytes(row["content"]) == b"WARC/1.0 alpha"


def test_extract_no_match_raises(spark, drop_dir):
    with pytest.raises(FileNotFoundError, match="no member matches"):
        extract_single(spark, drop_dir, "*.zip")


def test_extract_multi_match_raises(spark, drop_dir):
    with pytest.raises(ValueError, match="matches multiple members"):
        extract_single(spark, drop_dir, "*.warc")


def test_compact_bucket_reduces_files_and_preserves_content(spark, tmp_path):
    out = str(tmp_path / "out")
    df = spark.range(2000).select(
        F.col("id"),
        F.lit(3).alias("bucket"),
        F.concat(F.lit("row"), F.col("id")).alias("payload"),
    )
    (
        df.repartition(6)
        .write.partitionBy("bucket")
        .parquet(os.path.join(out, "pages_out"))
    )
    bdir = os.path.join(out, "pages_out", "bucket=3")
    before_rows = (
        spark.read.parquet(bdir).toPandas().sort_values("id").reset_index(drop=True)
    )
    n_before, n_after = compact_bucket(spark, out, 3)
    assert n_before == 6 and n_after == 1
    after_rows = (
        spark.read.parquet(bdir).toPandas().sort_values("id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        before_rows[sorted(before_rows.columns)],
        after_rows[sorted(after_rows.columns)],
    )
    # the partitioned root still reads cleanly with the bucket column
    root = spark.read.parquet(os.path.join(out, "pages_out"))
    assert root.filter(F.col("bucket") == 3).count() == 2000


def test_compact_noop_when_already_compact(spark, tmp_path):
    out = str(tmp_path / "out2")
    df = spark.range(10).select(F.col("id"), F.lit(0).alias("bucket"))
    df.coalesce(1).write.partitionBy("bucket").parquet(
        os.path.join(out, "pages_out")
    )
    n_before, n_after = compact_bucket(spark, out, 0)
    assert n_before == n_after == 1


def test_compact_all_buckets(spark, tmp_path):
    from eugl_spark.sources.pages import compact_all

    out = str(tmp_path / "outall")
    df = spark.range(4000).select(
        F.col("id"), (F.col("id") % 3).cast("int").alias("bucket")
    )
    (
        df.repartition(5)
        .write.partitionBy("bucket")
        .parquet(os.path.join(out, "pages_out"))
    )
    results = compact_all(spark, out, target_bytes=1 << 30)
    assert set(results) == {0, 1, 2}
    assert all(after == 1 and before > 1 for before, after in results.values())
    back = spark.read.parquet(os.path.join(out, "pages_out"))
    assert back.count() == 4000
