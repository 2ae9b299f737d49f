"""checkpoint_df: reliable persisted-table-per-round when a checkpoint
dir is configured (the cluster path), localCheckpoint otherwise.

The configured-dir arm runs in a subprocess: setCheckpointDir is
SparkContext-global and cannot be unset, so exercising it in the shared
test session would silently flip every later iterative test onto the
reliable path.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

from eugl_spark.operators.checkpoint import checkpoint_df


def test_local_mode_falls_back_to_localcheckpoint(spark, tmp_path):
    df = checkpoint_df(spark.range(10))
    assert df.count() == 10
    # lineage truncated: the plan is a materialized-RDD scan, not Range
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan and "Range" not in plan
    # and nothing was written anywhere (no checkpoint dir configured)
    assert spark.sparkContext.getCheckpointDir() is None


def test_configured_dir_writes_reliable_checkpoint(tmp_path):
    script = textwrap.dedent(
        f"""
        import glob, os, sys
        sys.path.insert(0, {str(sys.path[0] or ".")!r})
        sys.path.insert(0, "/root/repo")
        from eugl_spark.session import get_spark
        from eugl_spark.operators.checkpoint import checkpoint_df

        spark = get_spark("ckpt-test", cores=2)
        ckpt = {str(tmp_path / "ckpt")!r}
        spark.sparkContext.setCheckpointDir(ckpt)
        df = checkpoint_df(spark.range(100))
        assert df.count() == 100
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan and "Range" not in plan
        files = [
            f for f in glob.glob(os.path.join(ckpt, "**"), recursive=True)
            if os.path.isfile(f)
        ]
        assert files, "checkpoint dir must contain round-table files"
        spark.stop()
        print("CKPT_OK")
        """
    )
    res = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "CKPT_OK" in res.stdout
