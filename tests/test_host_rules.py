"""Host-rules policy overlay: broadcast equi-join on url-host (J5/J2
analog) with deny → top-precedence drop_reason."""

from __future__ import annotations

from pyspark.sql import functions as F

from eugl_spark.pipeline import apply_pipeline


def test_host_deny_overrides(spark, pages_path):
    pages = spark.read.parquet(pages_path).drop("_case")
    hosts = [
        r["h"]
        for r in pages.select(
            F.try_parse_url("url", F.lit("HOST")).alias("h")
        )
        .groupBy("h")
        .count()
        .orderBy(F.desc("count"))
        .limit(2)
        .collect()
    ]
    rules = spark.createDataFrame(
        [(hosts[0], "deny"), (hosts[1], "allow")], ["host", "action"]
    )
    out = apply_pipeline(pages, host_rules=rules, repartition_to=0)
    denied = out.filter(
        F.try_parse_url("url", F.lit("HOST")) == hosts[0]
    )
    n_denied = denied.count()
    assert n_denied > 0
    assert denied.filter(F.col("drop_reason") == "host_deny").count() == n_denied

    # allow + unlisted hosts: verdicts identical to the no-rules run
    base = apply_pipeline(pages, repartition_to=0)
    a = {
        r["url"]: r["drop_reason"]
        for r in base.filter(
            F.try_parse_url("url", F.lit("HOST")) != hosts[0]
        ).select("url", "drop_reason").collect()
    }
    b = {
        r["url"]: r["drop_reason"]
        for r in out.filter(
            F.try_parse_url("url", F.lit("HOST")) != hosts[0]
        ).select("url", "drop_reason").collect()
    }
    assert a == b

    # broadcast hint survives to the physical plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
