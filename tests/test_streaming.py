"""Structured Streaming: AvailableNow incremental pipeline + watermarked
windowed rollup (§2.11 extension beyond the batch-only reference)."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from eugl_spark.corpus import write_pages_parquet
from eugl_spark.pipeline import apply_pipeline
from eugl_spark.streaming.stream import (
    PAGES_SCHEMA,
    stream_pipeline,
    windowed_verdict_counts,
)


@pytest.fixture()
def drop_dir(tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    return str(d)


def _drop(drop_dir: str, name: str, n: int, seed: int) -> None:
    write_pages_parquet(os.path.join(drop_dir, name), n_rows=n, seed=seed)


def test_available_now_incremental(spark, drop_dir, tmp_path):
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    _drop(drop_dir, "part-000.parquet", 300, seed=1)

    q = stream_pipeline(spark, drop_dir, out, ckpt)
    q.awaitTermination(300)
    got1 = spark.read.parquet(out).count()
    assert got1 == 300

    # second drop: only the new file is processed (checkpointed offsets)
    _drop(drop_dir, "part-001.parquet", 200, seed=2)
    q = stream_pipeline(spark, drop_dir, out, ckpt)
    q.awaitTermination(300)
    got2 = spark.read.parquet(out).count()
    assert got2 == 500

    # verdicts identical to the batch pipeline over the same input
    # urls can collide across the two seeds → compare multisets
    batch = apply_pipeline(
        spark.read.schema(PAGES_SCHEMA).parquet(drop_dir), repartition_to=0
    )
    b = sorted(
        (r["url"], r["drop_reason"] or "")
        for r in batch.select("url", "drop_reason").collect()
    )
    s = sorted(
        (r["url"], r["drop_reason"] or "")
        for r in spark.read.parquet(out).select("url", "drop_reason").collect()
    )
    assert b == s


def test_stream_dedup_first_seen_wins(spark, drop_dir, tmp_path):
    """Re-crawled urls within the watermark are dropped — including
    across separate AvailableNow runs (checkpointed dedup state)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from eugl_spark.streaming.stream import stream_dedup_pages

    def drop(name, urls, minute):
        pq.write_table(
            pa.table(
                {
                    "url": pa.array(urls, pa.string()),
                    "warc_ts": pa.array(
                        [datetime(2024, 1, 1, 0, minute)] * len(urls),
                        pa.timestamp("us"),
                    ),
                    "html": pa.array([None] * len(urls), pa.binary()),
                    "text": pa.array(["t"] * len(urls), pa.string()),
                    "lang": pa.array(["en"] * len(urls), pa.string()),
                }
            ),
            os.path.join(drop_dir, name),
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    drop("d0.parquet", ["u1", "u2", "u2", "u3"], minute=0)
    q = stream_dedup_pages(spark, drop_dir, out, ckpt)
    q.awaitTermination(300)
    assert spark.read.parquet(out).count() == 3  # u2 deduped in-batch

    drop("d1.parquet", ["u2", "u4"], minute=5)  # u2 re-crawled
    q = stream_dedup_pages(spark, drop_dir, out, ckpt)
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 4  # only u4 is new
    assert {r["url"] for r in got.select("url").collect()} == {
        "u1", "u2", "u3", "u4",
    }


def test_stream_dedup_damaged_records_do_not_poison_watermark(
    spark, drop_dir, tmp_path
):
    """A damaged record (null warc_ts) must neither be dropped as late
    NOR advance the watermark past the historical crawl (backfilling
    with wall-clock time would silently discard every later 2024-era
    record)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime

    from eugl_spark.streaming.stream import stream_dedup_pages

    def drop(name, rows):  # rows: [(url, ts-or-None)]
        pq.write_table(
            pa.table(
                {
                    "url": pa.array([u for u, _ in rows], pa.string()),
                    "warc_ts": pa.array(
                        [t for _, t in rows], pa.timestamp("us")
                    ),
                    "html": pa.array([None] * len(rows), pa.binary()),
                    "text": pa.array(["t"] * len(rows), pa.string()),
                    "lang": pa.array(["en"] * len(rows), pa.string()),
                }
            ),
            os.path.join(drop_dir, name),
        )

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    t0 = datetime(2024, 1, 1)
    # run 1: a damaged record arrives first
    drop("d0.parquet", [("bad1", None)])
    stream_dedup_pages(spark, drop_dir, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == 1
    # run 2: historical records must still be accepted afterwards
    drop("d1.parquet", [("u1", t0), ("u2", t0)])
    stream_dedup_pages(spark, drop_dir, out, ckpt).awaitTermination(300)
    assert spark.read.parquet(out).count() == 3
    # run 3: damaged url re-arrives (dedup on the time-free path);
    # a new historical url is still accepted
    drop("d2.parquet", [("bad1", None), ("u3", t0)])
    stream_dedup_pages(spark, drop_dir, out, ckpt).awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert {r["url"] for r in got.select("url").collect()} == {
        "bad1", "u1", "u2", "u3",
    }


def test_sessionized_host_activity(spark, drop_dir):
    """Gap-based session windows: events <30min apart merge into one
    session; a >30min gap starts a new one."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    from eugl_spark.streaming.stream import sessionized_host_activity

    t0 = datetime(2024, 1, 1, 10, 0, 0)
    rows = [
        ("https://a.example/1", t0),
        ("https://a.example/2", t0 + timedelta(minutes=10)),  # same session
        ("https://a.example/3", t0 + timedelta(minutes=70)),  # new session
        ("https://b.example/1", t0 + timedelta(minutes=5)),
    ]
    pq.write_table(
        pa.table(
            {
                "url": pa.array([r[0] for r in rows], pa.string()),
                "warc_ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "html": pa.array([None] * len(rows), pa.binary()),
                "text": pa.array(["t"] * len(rows), pa.string()),
                "lang": pa.array(["en"] * len(rows), pa.string()),
            }
        ),
        os.path.join(drop_dir, "d0.parquet"),
    )
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)
    q = (
        sessionized_host_activity(src)
        .writeStream.format("memory")
        .queryName("sha")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["host"], r["n_pages"])
        for r in spark.sql("SELECT * FROM sha").collect()
    }
    assert got == {("a.example", 2), ("a.example", 1), ("b.example", 1)}


def test_windowed_verdict_counts(spark, drop_dir, tmp_path):
    _drop(drop_dir, "part-000.parquet", 400, seed=3)
    src = spark.readStream.schema(PAGES_SCHEMA).parquet(drop_dir)
    agg = windowed_verdict_counts(apply_pipeline(src, repartition_to=0))
    q = (
        agg.writeStream.format("memory")
        .queryName("wvc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    res = spark.sql("SELECT * FROM wvc")
    total = res.agg(F.sum("n")).collect()[0][0]
    assert total == 400
    reasons = {r["reason"] for r in res.select("reason").distinct().collect()}
    assert "KEEP" in reasons and len(reasons) > 3


def test_streaming_equals_oracle_gated_batch(spark, sf_dir, tmp_path):
    """Oracle-CLASS evidence for streaming (VERDICT r3 "Next round" #5):
    the AvailableNow stream over the sf0.01 documents corpus must equal,
    row for row, the batch `pipeline_docs_verdict` result — which is
    itself hash-gated against an independent all-SQL DuckDB oracle in
    test_entry.py. Equality transfers that oracle to the streaming path."""
    from eugl_spark.plans.queries import REGISTRY

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    pages = docs.select(
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/d/"), F.col("doc_id")
        ).alias("url"),
        F.lit(None).cast("timestamp").alias("warc_ts"),
        F.lit(None).cast("binary").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    drop = str(tmp_path / "docs_as_pages")
    # several files so the file-stream source actually batches
    pages.repartition(4).write.parquet(drop)

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = stream_pipeline(spark, drop, out, ckpt)
    q.awaitTermination(300)

    got = (
        spark.read.parquet(out)
        .select(
            F.element_at(F.split(F.col("url"), "/"), -1)
            .cast("long")
            .alias("doc_id"),
            F.coalesce(F.col("drop_reason"), F.lit("KEEP")).alias("reason"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        REGISTRY["pipeline_docs_verdict"]
        .spark(spark, sf_dir)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(got) == len(want) > 0
    assert got["doc_id"].tolist() == want["doc_id"].tolist()
    assert got["reason"].tolist() == want["reason"].tolist()


def test_stream_warc_drops_incremental_and_batch_parity(spark, tmp_path):
    """stream_warc_drops drains raw .warc/.warc.gz drops through the
    FULL ingestion+pipeline chain: (1) output rows equal the batch
    chain on the same files, (2) a second run after a new drop
    processes ONLY the new file (checkpointed offsets)."""
    import gzip

    from eugl_spark.pipeline import apply_pipeline
    from eugl_spark.sources.pages import read_raw_drops
    from eugl_spark.sources.warc import (
        parse_crawl_records,
        split_warc_records_exact,
    )
    from eugl_spark.streaming.stream import stream_warc_drops

    words = ("the of and to in is was he for it with as his on be "
             "at by had").split()

    def rec(i: int) -> bytes:
        body = " ".join(
            words[(i + k) % len(words)] for k in range(110)
        ).encode()
        return (
            f"WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Target-URI: https://sw{i % 3}.example/p/{i}\r\n"
            f"WARC-Date: 2024-03-01T12:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body

    drop = tmp_path / "drop"
    drop.mkdir()
    (drop / "a.warc").write_bytes(
        b"\r\n\r\n".join(rec(i) for i in range(8)) + b"\r\n\r\n"
    )
    (drop / "b.warc.gz").write_bytes(
        b"".join(gzip.compress(rec(i) + b"\r\n\r\n") for i in range(8, 14))
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = stream_warc_drops(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 14

    batch = apply_pipeline(
        parse_crawl_records(
            split_warc_records_exact(
                read_raw_drops(spark, str(drop), "*.warc*")
            )
        ),
        repartition_to=0,
    )
    b = {
        r["url"]: (r["keep"], r["drop_reason"], r["scrubbed_text"])
        for r in batch.collect()
    }
    s = {
        r["url"]: (r["keep"], r["drop_reason"], r["scrubbed_text"])
        for r in got.collect()
    }
    assert s == b

    # incremental: a new drop file → only its records are appended
    (drop / "c.warc").write_bytes(
        b"\r\n\r\n".join(rec(i) for i in range(14, 19)) + b"\r\n\r\n"
    )
    q2 = stream_warc_drops(spark, str(drop), out, ckpt)
    q2.awaitTermination(120)
    got2 = spark.read.parquet(out)
    assert got2.count() == 19
    new_urls = {
        r["url"] for r in got2.collect()
    } - set(s)
    assert new_urls == {f"https://sw{i % 3}.example/p/{i}" for i in range(14, 19)}


def test_stream_policy_dims_gate_incrementally(spark, drop_dir, tmp_path):
    """host_rules + path_rules pass through the streaming front as
    stream-STATIC broadcast joins: a path-denied url carries
    drop_reason=robots_path in the SINK output, a denied host carries
    host_deny, and batch parity holds row-for-row with the same dims."""
    from eugl_spark.functions.robots import parse_robots_path_rules

    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    # deterministic page set over two hosts with gated paths
    import pyarrow as pa
    import pyarrow.parquet as pq

    import numpy as np

    from eugl_spark.corpus import _chain

    _rng = np.random.RandomState(9)
    rows = [
        {
            "url": u,
            "warc_ts": None,
            "html": None,
            "text": " ".join(_chain("en", 60, _rng)),
            "lang": "en",
        }
        for u in (
            "https://gated.example/private/a",
            "https://gated.example/private/pub/ok",
            "https://gated.example/open/b",
            "https://denied.example/x",
        )
    ]
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        os.path.join(drop_dir, "part-000.parquet"),
    )
    robots = spark.createDataFrame(
        [
            (
                "gated.example",
                "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n",
            )
        ],
        "host string, body string",
    )
    host_rules = spark.createDataFrame(
        [("denied.example", "deny")], ["host", "action"]
    )
    path_rules = parse_robots_path_rules(robots)

    q = stream_pipeline(
        spark, drop_dir, out, ckpt,
        host_rules=host_rules, path_rules=path_rules,
    )
    q.awaitTermination(300)
    got = {
        r["url"]: r["drop_reason"]
        for r in spark.read.parquet(out)
        .select("url", "drop_reason")
        .collect()
    }
    assert got["https://gated.example/private/a"] == "robots_path"
    assert got["https://gated.example/private/pub/ok"] is None
    assert got["https://gated.example/open/b"] is None
    assert got["https://denied.example/x"] == "host_deny"

    # batch parity with the same dims
    batch = apply_pipeline(
        spark.read.schema(PAGES_SCHEMA).parquet(drop_dir),
        repartition_to=0,
        host_rules=host_rules,
        path_rules=path_rules,
    )
    b = sorted(
        (r["url"], r["drop_reason"] or "")
        for r in batch.select("url", "drop_reason").collect()
    )
    s = sorted((u, dr or "") for u, dr in got.items())
    assert b == s


def test_stream_cdx_ingest_incremental_and_batch_parity(spark, tmp_path):
    """stream_cdx_ingest drains arriving CDXJ index shards through
    selection → fetch plan → ranged reads → pipeline: (1) output rows
    equal the batch chain on the same index lines, (2) a second run
    after a new index shard lands processes ONLY that shard."""
    from eugl_spark.corpus import write_warc_archive_with_index
    from eugl_spark.pipeline import apply_pipeline
    from eugl_spark.sources.cdx import (
        latest_captures,
        parse_cdxj,
        read_ranged_records,
    )
    from eugl_spark.sources.warc import parse_crawl_records
    from eugl_spark.streaming.stream import stream_cdx_ingest

    arch, idx = write_warc_archive_with_index(str(tmp_path))
    lines = [
        r["line"] for r in spark.read.parquet(idx).collect()
    ]
    half = len(lines) // 2
    drop = tmp_path / "idx_drop"
    drop.mkdir()
    (drop / "shard-0.cdxj").write_text("\n".join(lines[:half]) + "\n")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = stream_cdx_ingest(spark, str(drop), arch, out, ckpt)
    q.awaitTermination(180)
    first = spark.read.parquet(out).count()
    assert first > 0

    def batch_over(ls):
        df = spark.createDataFrame([(x,) for x in ls], "line string")
        sel = latest_captures(parse_cdxj(df))
        return apply_pipeline(
            parse_crawl_records(read_ranged_records(spark, sel, arch)),
            repartition_to=0,
        )

    b1 = {
        r["url"]: (r["keep"], r["drop_reason"])
        for r in batch_over(lines[:half]).collect()
    }
    s1 = {
        r["url"]: (r["keep"], r["drop_reason"])
        for r in spark.read.parquet(out).collect()
    }
    assert s1 == b1 and first == len(b1)

    # second index shard lands: rerun processes only the new lines
    (drop / "shard-1.cdxj").write_text("\n".join(lines[half:]) + "\n")
    q2 = stream_cdx_ingest(spark, str(drop), arch, out, ckpt)
    q2.awaitTermination(180)
    total = spark.read.parquet(out).count()
    b2 = batch_over(lines[half:])
    assert total == first + b2.count()


def test_stream_clean_corpus_incremental_and_batch_parity(spark, tmp_path):
    """The round-6 text-hygiene chain as a PURE streaming plan (no
    foreachBatch — every stage is stateless per-row): drop 1 drains,
    matches the batch chain row-for-row; drop 2 arrives, only the new
    docs are processed (exactly-once), and the final sink equals the
    batch run over both drops."""
    import pandas as pd

    from eugl_spark.corpus import generate_boiler_docs
    from eugl_spark.plans.queries import clean_corpus_from
    from eugl_spark.streaming.stream import stream_clean_corpus

    docs = generate_boiler_docs(120, seed=77)
    in_dir = tmp_path / "drops"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    in_dir.mkdir()

    def _write(df: pd.DataFrame, name: str) -> None:
        import pyarrow as pa
        import pyarrow.parquet as pq

        pq.write_table(
            pa.Table.from_pandas(
                df,
                schema=pa.schema(
                    [("doc_id", pa.int64()), ("url", pa.string()),
                     ("html", pa.string())]
                ),
                preserve_index=False,
            ),
            str(in_dir / name),
        )

    _write(docs.iloc[:70], "drop1.parquet")
    stream_clean_corpus(spark, str(in_dir), out_dir, ckpt).awaitTermination()
    got1 = spark.read.parquet(out_dir).toPandas()
    assert sorted(got1.doc_id) == sorted(docs.doc_id[:70])

    batch1 = clean_corpus_from(
        spark.createDataFrame(docs.iloc[:70])
    ).toPandas()
    a = got1.sort_values("doc_id").reset_index(drop=True)
    b = batch1.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns])

    _write(docs.iloc[70:], "drop2.parquet")
    stream_clean_corpus(spark, str(in_dir), out_dir, ckpt).awaitTermination()
    got2 = spark.read.parquet(out_dir).toPandas()
    # exactly-once: every doc exactly one row, both drops present
    assert sorted(got2.doc_id) == sorted(docs.doc_id)
    batch_all = clean_corpus_from(spark.createDataFrame(docs)).toPandas()
    a2 = got2.sort_values("doc_id").reset_index(drop=True)
    b2 = batch_all.sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a2, b2[a2.columns])
