"""WET export (sources/wet.py): record assembly + shard writing, and
the ROUND TRIP through the engine's own ingestion chain — the export
must re-ingest byte-for-byte."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eugl_spark.sources.wet import wet_records, write_wet_shards


def _pages(spark):
    rows = [
        ("https://ex.example/a", "2024-03-01 12:00:00",
         "first page text with several words here."),
        ("https://ex.example/b", "2024-03-02 13:30:00",
         "zweite Seite — unicode: café, 日本語, emoji 🎉."),
        ("https://ex.example/null-ts", None, "null ts renders as epoch."),
        (None, "2024-03-03 00:00:00", "null url: not exportable"),
        ("https://ex.example/null-text", "2024-03-04 00:00:00", None),
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts string, text string"
    ).withColumn("warc_ts", F.col("warc_ts").cast("timestamp"))


def test_wet_records_framing(spark):
    recs = {
        bytes(r["content"]).split(b"WARC-Target-URI: ", 1)[1]
        .split(b"\r\n", 1)[0]: bytes(r["content"])
        for r in wet_records(_pages(spark)).collect()
    }
    assert set(recs) == {
        b"https://ex.example/a",
        b"https://ex.example/b",
        b"https://ex.example/null-ts",
    }
    rec = recs[b"https://ex.example/b"]
    head, payload = rec.split(b"\r\n\r\n", 1)
    # Content-Length counts utf-8 OCTETS of the payload
    cl = int(head.split(b"Content-Length: ", 1)[1].split(b"\r\n", 1)[0])
    assert cl == len(payload) > len(payload.decode("utf-8"))
    assert b"WARC-Date: 2024-03-02T13:30:00Z" in head
    assert b"WARC-Date: 1970-01-01T00:00:00Z" in recs[
        b"https://ex.example/null-ts"
    ]


def test_wet_export_round_trip(spark, tmp_path):
    """Export shards, re-ingest with THE engine's own splitter+parse:
    same urls, byte-identical text, framing intact."""
    from eugl_spark.sources.pages import read_raw_drops
    from eugl_spark.sources.warc import (
        parse_crawl_records,
        split_warc_records_exact,
    )

    out = str(tmp_path / "wet_out")
    n = write_wet_shards(wet_records(_pages(spark)), out)
    assert n >= 1
    assert all(not f.startswith("_tmp.") for f in os.listdir(out))
    back = parse_crawl_records(
        split_warc_records_exact(read_raw_drops(spark, out, "*.wet"))
    )
    got = {r["url"]: r["text"] for r in back.collect()}
    want = {
        r["url"]: r["text"]
        for r in _pages(spark)
        .filter(F.col("url").isNotNull() & F.col("text").isNotNull())
        .collect()
    }
    assert got == want
