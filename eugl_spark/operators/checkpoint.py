"""Lineage-truncating materialization for iterative operators.

Iterative plans (connected components, Lloyd's k-means, multi-consumer
candidate frames) grow their logical plan per round; without truncation
the optimizer re-analyzes an exponentially deeper tree each superstep
and a lost executor replays the whole chain. The reference's analog is
luigi writing each task's output to a file before the next task reads
it (/root/reference/eugl/gqa/tasks.py:108-109 — target-existence is the
checkpoint).

``checkpoint_df`` picks the strongest truncation available:

* a cluster checkpoint dir is configured
  (``spark.sparkContext.setCheckpointDir`` — HDFS/S3 on a real
  cluster) → reliable ``df.checkpoint()``: the round table is a
  persisted file, recomputable-from-disk after executor loss. This is
  the "persisted table per round" the 10^12-doc plan requires.
* otherwise → ``df.localCheckpoint()``: executor-local blocks, right
  for local mode and tests (no distributed FS in this sandbox).

Both are eager and both cut lineage; only the failure-recovery story
differs, which is exactly the local-vs-cluster distinction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint_df(df: DataFrame) -> DataFrame:
    """Materialize ``df`` and truncate its lineage (see module doc)."""
    sc = df.sparkSession.sparkContext
    # getCheckpointDir() returns None when unset — it does not raise.
    # No blanket except here: swallowing a real JVM error would
    # silently downgrade every superstep of a cluster run to
    # executor-local blocks, forfeiting exactly the failure-recovery
    # property a configured checkpoint dir asked for.
    ckpt_dir = sc.getCheckpointDir()
    if ckpt_dir:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
