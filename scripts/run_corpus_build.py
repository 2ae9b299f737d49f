"""spark-submit entry point for the end-to-end training-corpus build.

Composes the training-data pipeline over a documents table (doc_id,
lang, source, text): heuristic quality keep → near-dup keeper
selection (MinHash-banded clustering) → eval-set 5-gram
decontamination → leakage-safe train split → per-source token budget —
the same plan the oracle-gated `corpus_build_train` registry query
runs, exposed with knobs.

Cluster launch (same --py-files shipping as run_pipeline.py):

    zip -r eugl_spark.zip eugl_spark
    spark-submit --py-files eugl_spark.zip scripts/run_corpus_build.py \
        --input  /data/documents_dir   (dir holding documents.parquet) \
        --output /data/train_corpus \
        [--token-budget 2000000000]

Local smoke (no cluster): python scripts/run_corpus_build.py --demo
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="dir containing documents.parquet")
    ap.add_argument("--output", help="output parquet dir (doc_id, source, cum_tokens)")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="per-source token cap (default: library constant)")
    ap.add_argument("--demo", action="store_true",
                    help="run on the sf0.001 test documents table")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = SparkSession.builder.getOrCreate()
    if spark.sparkContext.master.startswith("local"):
        spark.stop()
        from eugl_spark.session import get_spark

        spark = get_spark("eugl_corpus_build")

    if args.demo:
        import tempfile

        args.input = "/root/testdata/sf0.001"
        args.output = os.path.join(
            tempfile.mkdtemp(prefix="eugl_corpus_"), "train"
        )
        print(f"demo input: {args.input}\ndemo output: {args.output}")
    if not args.input or not args.output:
        ap.error("--input and --output required (or --demo)")

    from eugl_spark.plans.queries import build_training_corpus

    out = build_training_corpus(
        spark, args.input, token_budget=args.token_budget
    )
    out.write.mode("overwrite").partitionBy("source").parquet(args.output)
    summary = (
        spark.read.parquet(args.output)
        .groupBy("source")
        .agg(
            F.count("*").alias("docs"),
            F.max("cum_tokens").alias("tokens"),
        )
        .orderBy("source")
    )
    summary.show(50, truncate=False)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
