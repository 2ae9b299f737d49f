"""Checkpoint/resume semantics (K5/K6: luigi target-existence recast).

Failure-injection: run → fail part-way → lineage records 'failed' rows
(always-write pattern) → resume same run_id → final table identical to
a single clean run (the reference's golden-diff requirement applied to
our own restart path)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from eugl_spark import constants as C
from eugl_spark.lineage import done_buckets, read_lineage, run_with_resume


@pytest.fixture()
def pages(spark, pages_path):
    return spark.read.parquet(pages_path).drop("_case")


def _read_out(spark, out_dir) -> pd.DataFrame:
    df = (
        spark.read.parquet(f"{out_dir}/pages_out")
        .select("url", "keep", "drop_reason", "scrubbed_text", "bucket")
        .toPandas()
    )
    return df.sort_values("url").reset_index(drop=True)


def test_clean_run_writes_all_buckets(spark, pages, tmp_path):
    out = str(tmp_path / "clean")
    res = run_with_resume(spark, pages, out, run_id="r1")
    assert res["failed"] == 0
    assert done_buckets(spark, out, "r1") == set(range(C.N_BUCKETS))
    lin = read_lineage(spark, out)
    totals = lin.agg(F.sum("n_input")).collect()[0][0]
    assert totals == pages.count()


def test_fail_then_resume_is_byte_identical(spark, pages, tmp_path):
    clean, broken = str(tmp_path / "c"), str(tmp_path / "b")
    run_with_resume(spark, pages, clean, run_id="r1")

    with pytest.raises(RuntimeError, match="injected failure"):
        run_with_resume(
            spark, pages, broken, run_id="r2",
            buckets_per_batch=16, fail_on_bucket=40,
        )
    lin = read_lineage(spark, broken).toPandas()
    assert (lin.status == "failed").any()
    assert lin[lin.status == "failed"].error.str.contains("injected").all()
    done_before = done_buckets(spark, broken, "r2")
    assert 0 < len(done_before) < C.N_BUCKETS

    res = run_with_resume(spark, pages, broken, run_id="r2")
    assert res["skipped"] == len(done_before)
    assert done_buckets(spark, broken, "r2") == set(range(C.N_BUCKETS))

    a, b = _read_out(spark, clean), _read_out(spark, broken)
    pd.testing.assert_frame_equal(a, b)


def test_rerun_is_noop(spark, pages, tmp_path):
    out = str(tmp_path / "noop")
    run_with_resume(spark, pages, out, run_id="r1")
    res = run_with_resume(spark, pages, out, run_id="r1")
    assert res == {"written": 0, "skipped": C.N_BUCKETS, "failed": 0}
