"""spark-submit entry point for the training-data tail: curated corpus
→ packed sequences → epoch-shuffled shards on disk.

Composes the library surfaces end-to-end: `build_training_corpus`
(quality verdict → near-dup keepers → decontamination → train split →
token budget, optional exact-substring span gate) selects the docs,
then `export_training_shards` packs them into fixed-length sequences,
deals a deterministic epoch shuffle, and publishes one atomically-
renamed file per shard with a sha256 manifest.

Cluster launch (same shipping recipe as run_pipeline.py):

    zip -r eugl_spark.zip eugl_spark
    spark-submit --py-files eugl_spark.zip scripts/export_corpus.py \
        --sf-dir /data/tables --output /data/shards \
        [--token-budget 2000000] [--span-drop-threshold 0.5] \
        [--seq-len 512] [--n-shards 1024] [--epoch-salt shuf1:]

Local smoke (no cluster): python scripts/export_corpus.py --demo
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", help="directory holding documents.parquet")
    ap.add_argument("--output", help="shard output directory")
    ap.add_argument("--token-budget", type=int, default=None)
    ap.add_argument("--span-drop-threshold", type=float, default=None)
    ap.add_argument("--seq-len", type=int, default=None)
    ap.add_argument("--n-shards", type=int, default=None)
    ap.add_argument("--epoch-salt", default="shuf1:")
    ap.add_argument("--demo", action="store_true",
                    help="run against the test tables into a temp dir")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from eugl_spark.plans.queries import build_training_corpus
    from eugl_spark.sources.shards import export_training_shards

    spark = SparkSession.builder.getOrCreate()
    if spark.sparkContext.master.startswith("local"):
        spark.stop()
        from eugl_spark.session import get_spark

        spark = get_spark("eugl_export")

    if args.demo:
        import tempfile

        args.sf_dir = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
        )
        args.output = tempfile.mkdtemp(prefix="eugl_shards_")
    if not args.sf_dir or not args.output:
        ap.error("--sf-dir and --output are required (or --demo)")

    surviving = build_training_corpus(
        spark,
        args.sf_dir,
        token_budget=args.token_budget,
        span_drop_threshold=args.span_drop_threshold,
    ).select("doc_id")
    docs = (
        spark.read.parquet(f"{args.sf_dir}/documents.parquet")
        .join(surviving, "doc_id")
        .select("doc_id", "text")
    )
    manifest = export_training_shards(
        docs,
        args.output,
        seq_len=args.seq_len,
        n_shards=args.n_shards,
        salt=args.epoch_salt,
    ).collect()
    summary = {
        "out_dir": args.output,
        "n_shards": len(manifest),
        "n_seqs": int(sum(r["n_seqs"] for r in manifest)),
        "shards": {
            int(r["shard"]): {"n_seqs": int(r["n_seqs"]), "sha256": r["sha256"]}
            for r in manifest
        },
    }
    print(json.dumps(summary, sort_keys=True))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
