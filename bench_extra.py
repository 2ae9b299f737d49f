"""Round-7 optimization harness (guide §1): per-query isolation.

NOT the driver bench — bench.py is frozen for measurement. This file
exists so each query can be timed and re-timed in isolation while
optimizing, with the SAME full-evaluation sink as bench.py (_force),
plus `.explain("formatted")` capture for the plans/r07/ evidence files.

Usage:
  python bench_extra.py --queries corpus_build_train,qf_scrub \
      [--rounds 3] [--explain plans/r07 --tag before] [--noop]

Composite bench jobs that are not registry queries (qf_pipeline_full,
qf_pipeline_boiler, the *_scaled rows) are replicated here by name with
the same inputs bench.py uses.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench import (  # noqa: E402
    CPUS,
    SF_DIR,
    _force,
    _sf_of,
    _scaled_fixture,
    _shard_dir,
    capstone_sf1_dir,
    corpus_path,
    link_scaled_path,
    run_pipeline_once,
)


def _jobs(spark):
    """name → zero-arg callable, mirroring bench.py's job list for the
    names used during this optimization round."""
    from pyspark.sql import functions as F

    from eugl_spark.plans.queries import REGISTRY

    sf = _sf_of(SF_DIR)
    jobs = {}

    for name in REGISTRY:
        jobs[name] = lambda q=REGISTRY[name].spark: _force(q(spark, SF_DIR))

    pages = corpus_path(sf)
    jobs["qf_pipeline_full"] = lambda: run_pipeline_once(spark, pages)

    def _pipeline_boiler():
        from eugl_spark.pipeline import apply_pipeline

        out = apply_pipeline(
            spark.read.parquet(pages).drop("_case"), boilerplate=True
        )
        return int(
            out.agg(
                F.count("*").alias("n"),
                F.sum(F.col("keep").cast("long")).alias("kept"),
                F.sum(F.length("scrubbed_text")).alias("bytes"),
            ).collect()[0]["n"]
        )

    jobs["qf_pipeline_boiler"] = _pipeline_boiler

    def _para_scaled():
        from eugl_spark.plans.queries import dedup_paragraphs_from

        pg = (
            spark.read.parquet(pages)
            .filter(F.col("text").isNotNull())
            .select("url", "text")
        )
        return _force(dedup_paragraphs_from(pg))

    jobs["dedup_paragraphs_scaled"] = _para_scaled

    link_scaled = _shard_dir(link_scaled_path(int(40_000 * sf / 0.1)))

    def _webgraph_scaled():
        from eugl_spark.operators.graph import pagerank
        from eugl_spark.plans.queries import link_host_edges

        pg = spark.read.parquet(link_scaled)
        edges = link_host_edges(pg).withColumnRenamed("n_links", "w")
        return _force(pagerank(edges, iters=3))

    jobs["webgraph_pagerank_scaled"] = _webgraph_scaled

    def _crawl_capstone_scaled():
        from eugl_spark.plans.queries import crawl_corpus_from

        pg = spark.read.parquet(link_scaled)
        return _force(crawl_corpus_from(pg, repartition_to=CPUS))

    jobs["crawl_capstone_scaled"] = _crawl_capstone_scaled

    for mult, nm in ((3, "corpus_build_train_sf03"), (10, "corpus_build_train_sf1")):
        cap = capstone_sf1_dir(mult=mult)
        jobs[nm] = (
            lambda c=cap: _force(REGISTRY["corpus_build_train"].spark(spark, c))
        )

    def _scaled_registry(nm, ensure_name, stem, writer, n, seed):
        path = _shard_dir(_scaled_fixture(stem, writer, int(n * sf / 0.1), seed))

        def run():
            import eugl_spark.plans.queries as Q

            orig = getattr(Q, ensure_name)
            setattr(Q, ensure_name, lambda: path)
            try:
                return _force(REGISTRY[nm].spark(spark, ""))
            finally:
                setattr(Q, ensure_name, orig)

        return run

    jobs["boiler_blocks_scaled"] = _scaled_registry(
        "qf_boilerplate_blocks", "ensure_boiler_docs", "boiler",
        "write_boiler_docs_parquet", 20_000, 47)
    jobs["clean_corpus_scaled"] = _scaled_registry(
        "qf_clean_corpus", "ensure_boiler_docs", "boiler",
        "write_boiler_docs_parquet", 20_000, 47)
    jobs["normalize_unicode_scaled"] = _scaled_registry(
        "qf_normalize_unicode", "ensure_unicode_docs", "unicode",
        "write_unicode_docs_parquet", 60_000, 53)
    jobs["c4_filter_scaled"] = _scaled_registry(
        "qf_c4_line_filter", "ensure_c4_docs", "c4",
        "write_c4_docs_parquet", 40_000, 41)
    jobs["revisit_resolution_scaled"] = _scaled_registry(
        "crawl_revisit_resolution", "ensure_revisit_blobs", "revisit",
        "write_revisit_parquet", 100_000, 43)

    def _cdx_plan_scaled():
        from eugl_spark.sources.cdx import fetch_plan, latest_captures, parse_cdxj

        cdx = _shard_dir(_scaled_fixture(
            "cdxj", "write_cdxj_parquet", int(200_000 * sf / 0.1), seed=19))
        sel = latest_captures(parse_cdxj(spark.read.parquet(cdx)))
        return _force(fetch_plan(sel))

    jobs["cdx_plan_scaled"] = _cdx_plan_scaled

    def _wat_edges_scaled():
        from eugl_spark.sources.wat import parse_wat_records, wat_host_edges

        wat = _shard_dir(_scaled_fixture(
            "wat", "write_wat_parquet", int(40_000 * sf / 0.1), seed=23))
        return _force(
            wat_host_edges(parse_wat_records(spark.read.parquet(wat)))
        )

    jobs["wat_edges_scaled"] = _wat_edges_scaled

    def _snapshot_collapse_scaled():
        pg = spark.read.parquet(link_scaled)
        return _force(
            pg.groupBy("url").agg(
                F.max("warc_ts").alias("last_ts"),
                F.count("*").alias("n_snapshots"),
                F.max_by(
                    F.length(F.col("html").cast("string")), "warc_ts"
                ).alias("last_html_len"),
            )
        )

    jobs["snapshot_collapse_scaled"] = _snapshot_collapse_scaled
    return jobs


def _plan_df(spark, name):
    """The DataFrame whose plan we capture for plans/r07 (registry
    queries only; composite jobs capture their main frame)."""
    from eugl_spark.plans.queries import REGISTRY

    if name in REGISTRY:
        return REGISTRY[name].spark(spark, SF_DIR)
    if name == "qf_pipeline_boiler":
        from eugl_spark.pipeline import apply_pipeline

        pages = corpus_path(_sf_of(SF_DIR))
        return apply_pipeline(
            spark.read.parquet(pages).drop("_case"), boilerplate=True
        )
    if name == "qf_pipeline_full":
        from eugl_spark.pipeline import apply_pipeline

        pages = corpus_path(_sf_of(SF_DIR))
        return apply_pipeline(spark.read.parquet(pages).drop("_case"))
    if name == "dedup_paragraphs_scaled":
        from pyspark.sql import functions as F

        from eugl_spark.plans.queries import dedup_paragraphs_from

        pages = corpus_path(_sf_of(SF_DIR))
        pg = (
            spark.read.parquet(pages)
            .filter(F.col("text").isNotNull())
            .select("url", "text")
        )
        return dedup_paragraphs_from(pg)
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", required=True)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--explain", default=None, help="dir for plan files")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--noop", action="store_true",
                    help="use the noop sink instead of _force")
    args = ap.parse_args()

    from eugl_spark.session import get_spark

    spark = get_spark("bench_extra", cores=CPUS, shuffle_partitions=CPUS)
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    jobs = _jobs(spark)

    # warm the JVM/Arrow path once so the first timed query isn't
    # paying session spin-up (bench.py warms with the full pipeline)
    run_pipeline_once(spark, corpus_path(_sf_of(SF_DIR)))

    if args.explain:
        os.makedirs(args.explain, exist_ok=True)
        for n in names:
            df = _plan_df(spark, n)
            if df is None:
                continue
            with open(os.path.join(args.explain, f"{n}_{args.tag}.txt"), "w") as f:
                f.write(df._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode
                    .fromString("formatted")))

    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(args.rounds):
        for n in names:
            fn = jobs[n]
            spark.sparkContext.setJobDescription(f"bench_extra:{n}")
            if args.noop and n in jobs and _plan_df(spark, n) is not None:
                df = _plan_df(spark, n)
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                samples[n].append(time.time() - t0)
            else:
                t0 = time.time()
                fn()
                samples[n].append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)
    out = {
        "min": {n: round(min(s), 3) for n, s in samples.items()},
        "samples": {n: [round(x, 3) for x in s] for n, s in samples.items()},
        "sink": "noop" if args.noop else "_force",
        "rounds": args.rounds,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
