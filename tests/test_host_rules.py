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


def test_host_sample_action(spark, pages_path):
    """'sample:NN' keeps a deterministic NN% of a host's urls; the
    rest drop with reason host_sampled. Hash-of-url → replayable."""
    pages = spark.read.parquet(pages_path).drop("_case")
    hot = (
        pages.select(F.try_parse_url("url", F.lit("HOST")).alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).first()["h"]
    )
    rules = spark.createDataFrame([(hot, "sample:50")], ["host", "action"])
    out = apply_pipeline(pages, host_rules=rules, repartition_to=0)
    host_rows = out.filter(F.try_parse_url("url", F.lit("HOST")) == hot)
    n = host_rows.count()
    n_sampled = host_rows.filter(F.col("drop_reason") == "host_sampled").count()
    assert 0 < n_sampled < n  # roughly half, deterministic hash split
    assert abs(n_sampled / n - 0.5) < 0.25
    # other hosts never get the reason
    assert (
        out.filter(F.try_parse_url("url", F.lit("HOST")) != hot)
        .filter(F.col("drop_reason") == "host_sampled")
        .count()
        == 0
    )
    # deterministic: same urls sampled out on a rerun
    again = apply_pipeline(pages, host_rules=rules, repartition_to=0)
    s1 = {r["url"] for r in out.filter(F.col("drop_reason") == "host_sampled").collect()}
    s2 = {r["url"] for r in again.filter(F.col("drop_reason") == "host_sampled").collect()}
    assert s1 == s2

    # sample:100 keeps everything; sample:0 drops the whole host
    keep_all = apply_pipeline(
        pages,
        host_rules=spark.createDataFrame([(hot, "sample:100")], ["host", "action"]),
        repartition_to=0,
    )
    assert keep_all.filter(F.col("drop_reason") == "host_sampled").count() == 0
    drop_all = apply_pipeline(
        pages,
        host_rules=spark.createDataFrame([(hot, "sample:0")], ["host", "action"]),
        repartition_to=0,
    )
    dropped = drop_all.filter(F.try_parse_url("url", F.lit("HOST")) == hot)
    assert dropped.filter(F.col("drop_reason") == "host_sampled").count() == dropped.count()


def test_malformed_sample_action_fails_open(spark, pages_path):
    """'sample:' / 'sample:abc' must NOT abort the job under ANSI
    (try_cast → null rate → documented fail-open), and verdicts equal
    the no-rules run."""
    pages = spark.read.parquet(pages_path).drop("_case")
    hot = (
        pages.select(F.try_parse_url("url", F.lit("HOST")).alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).first()["h"]
    )
    rules = spark.createDataFrame(
        [(hot, "sample:"), ("other.example", "sample:abc")],
        ["host", "action"],
    )
    out = apply_pipeline(pages, host_rules=rules, repartition_to=0)
    base = apply_pipeline(pages, repartition_to=0)
    a = {r["url"]: r["drop_reason"] for r in base.select("url", "drop_reason").collect()}
    b = {r["url"]: r["drop_reason"] for r in out.select("url", "drop_reason").collect()}
    assert a == b  # no crash, no behavior change


def test_out_of_range_sample_rate_fails_open(spark, pages_path):
    """'sample:-5' / 'sample:150' are malformed and must fail OPEN like
    the non-castable rates — pre-fix, pmod(url) >= -5 silently dropped
    the WHOLE host as host_sampled (fail-closed)."""
    pages = spark.read.parquet(pages_path).drop("_case")
    hot = (
        pages.select(F.try_parse_url("url", F.lit("HOST")).alias("h"))
        .groupBy("h").count().orderBy(F.desc("count")).first()["h"]
    )
    rules = spark.createDataFrame(
        [(hot, "sample:-5"), ("other.example", "sample:150")],
        ["host", "action"],
    )
    out = apply_pipeline(pages, host_rules=rules, repartition_to=0)
    base = apply_pipeline(pages, repartition_to=0)
    a = {r["url"]: r["drop_reason"] for r in base.select("url", "drop_reason").collect()}
    b = {r["url"]: r["drop_reason"] for r in out.select("url", "drop_reason").collect()}
    assert a == b
