"""spark-submit entry point for the quality-filter pipeline.

Cluster launch (the reference ships code by PYTHONPATH-prepend,
/root/reference/testing/README.md:20-21; Spark's equivalent):

    zip -r eugl_spark.zip eugl_spark
    spark-submit --py-files eugl_spark.zip \
        --conf spark.sql.session.timeZone=UTC \
        --conf spark.sql.adaptive.enabled=true \
        scripts/run_pipeline.py \
        --input  s3://bucket/pages/   (or an Iceberg table name) \
        --output /data/out \
        --run-id 2026-08-16 \
        [--resume] [--buckets-per-batch 8]

Local smoke (no cluster): python scripts/run_pipeline.py --demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="pages parquet path or Iceberg table")
    ap.add_argument("--output", help="output root (pages_out + _lineage)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--buckets-per-batch", type=int, default=0)
    ap.add_argument("--demo", action="store_true",
                    help="synthesize a small corpus and run end-to-end")
    ap.add_argument("--compact", action="store_true",
                    help="finalize: compact every bucket's small files")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from eugl_spark.lineage import read_lineage, run_with_resume
    from eugl_spark.sources.pages import read_pages

    spark = SparkSession.builder.getOrCreate()
    if spark.sparkContext.master.startswith("local"):
        # dev convenience: full session defaults + package shipping
        spark.stop()
        from eugl_spark.session import get_spark

        spark = get_spark("eugl_pipeline")

    if args.demo:
        import tempfile

        from eugl_spark.corpus import write_pages_parquet

        tmp = tempfile.mkdtemp(prefix="eugl_demo_")
        args.input = write_pages_parquet(f"{tmp}/pages.parquet", 5000)
        args.output = f"{tmp}/out"
        print(f"demo corpus: {args.input}\ndemo output: {args.output}")

    if not args.input or not args.output:
        ap.error("--input and --output required (or --demo)")

    pages = read_pages(spark, args.input)
    if "_case" in pages.columns:
        pages = pages.drop("_case")
    res = run_with_resume(
        spark,
        pages,
        args.output,
        run_id=args.run_id,
        buckets_per_batch=args.buckets_per_batch,
    )
    print(f"run {args.run_id}: {res}")
    if args.compact:
        from eugl_spark.sources.pages import compact_all

        compacted = compact_all(spark, args.output)
        print(f"compacted {len(compacted)} buckets: {compacted}")
    lin = read_lineage(spark, args.output)
    lin.groupBy("status").count().show()
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
