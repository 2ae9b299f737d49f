"""applyInPandasWithState: per-host running QA counters across
micro-batches — state persists between two AvailableNow runs via the
checkpoint (memory sink can't recover checkpoints → foreachBatch)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eugl_spark.corpus import write_pages_parquet
from eugl_spark.pipeline import apply_pipeline
from eugl_spark.streaming.stateful import host_quality_state
from eugl_spark.streaming.stream import PAGES_SCHEMA


def _run(spark, drop_dir, ckpt, out):
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)
    agg = host_quality_state(apply_pipeline(src, repartition_to=0))

    def sink(df, _epoch):
        df.write.mode("append").parquet(out)

    q = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_stateful_host_counters(spark, tmp_path):
    drops = tmp_path / "drops"
    drops.mkdir()
    ckpt = str(tmp_path / "ckpt")
    write_pages_parquet(os.path.join(drops, "d0.parquet"), 250, seed=31)

    _run(spark, str(drops), ckpt, str(tmp_path / "out1"))
    r1 = {
        r["host"]: r
        for r in spark.read.parquet(str(tmp_path / "out1")).collect()
    }
    total1 = sum(r["n_docs"] for r in r1.values())
    assert total1 == 250
    assert all(0 <= r["n_kept"] <= r["n_docs"] for r in r1.values())

    # second drop: state carries over — per-host totals are cumulative
    write_pages_parquet(os.path.join(drops, "d1.parquet"), 150, seed=32)
    _run(spark, str(drops), ckpt, str(tmp_path / "out2"))
    r2 = {
        r["host"]: r
        for r in spark.read.parquet(str(tmp_path / "out2")).collect()
    }
    assert r2  # only hosts touched by batch 2, with cumulative counts
    grew = [h for h in r2 if h in r1 and r2[h]["n_docs"] > r1[h]["n_docs"]]
    assert grew, "expected cumulative per-host counters to grow"

    batch = apply_pipeline(
        spark.read.schema(PAGES_SCHEMA).parquet(str(drops)),
        repartition_to=0,
    )
    want = {
        r["host"]: r["n"]
        for r in batch.groupBy(
            F.try_parse_url("url", F.lit("HOST")).alias("host")
        ).agg(F.count("*").alias("n")).collect()
    }
    for h, r in r2.items():
        assert r["n_docs"] == want[h], (h, r["n_docs"], want[h])
