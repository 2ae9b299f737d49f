"""Source connectors (SURVEY §2.1): schema-pinned parquet read, raw
binaryFile scan with glob filter (the FileArchive extract pattern),
Iceberg gate fallback."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from eugl_spark.corpus import write_pages_parquet
from eugl_spark.sources.pages import iceberg_available, read_pages, read_raw_drops


def test_read_pages_parquet(spark, tmp_path):
    p = str(tmp_path / "pages.parquet")
    write_pages_parquet(p, 50, seed=9)
    df = read_pages(spark, str(tmp_path))
    assert df.count() == 50
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]


def test_read_raw_drops_glob(spark, tmp_path):
    d = tmp_path / "drops"
    d.mkdir()
    (d / "a.warc").write_bytes(b"WARC/1.0\r\npayload-a")
    (d / "b.warc").write_bytes(b"WARC/1.0\r\npayload-b" * 10)
    (d / "ignore.txt").write_bytes(b"nope")
    df = read_raw_drops(spark, str(d), "*.warc")
    rows = {os.path.basename(r["path"]): r for r in df.collect()}
    assert set(rows) == {"a.warc", "b.warc"}
    assert rows["a.warc"]["n_bytes"] == 19
    assert bytes(rows["a.warc"]["content"]).startswith(b"WARC/1.0")


def test_iceberg_gate(spark):
    # jars absent in this environment: the gate must say so, and
    # read_pages must fall through to parquet semantics for paths
    assert iceberg_available(spark) is False


def test_write_pages_partitioned(spark, tmp_path):
    from eugl_spark.pipeline import apply_pipeline
    from eugl_spark.sources.pages import write_pages

    p = str(tmp_path / "in.parquet")
    write_pages_parquet(p, 80, seed=13)
    labeled = apply_pipeline(
        spark.read.parquet(p).drop("_case"), repartition_to=4
    )
    out = str(tmp_path / "out")
    write_pages(labeled, out)
    back = spark.read.parquet(out)
    assert back.count() == 80
    assert "bucket" in back.columns  # partition column round-trips
    # dynamic overwrite: second write replaces, not duplicates
    write_pages(labeled, out)
    assert spark.read.parquet(out).count() == 80


def test_write_pages_routes_to_iceberg_when_available(spark, monkeypatch):
    """No Iceberg jars in this environment, so the real overwrite path
    can't execute — pin the ROUTING contract instead: a table name goes
    to writeTo().overwritePartitions(), a path goes to parquet."""
    import eugl_spark.sources.pages as P

    calls = {}

    class _FakeV2:
        def __init__(self, target):
            calls["target"] = target

        def overwritePartitions(self):
            calls["overwrite"] = True

    df = spark.range(3).withColumn("bucket", F.lit(0))
    monkeypatch.setattr(P, "iceberg_available", lambda s: True)
    monkeypatch.setattr(
        type(df), "writeTo", lambda self, t: _FakeV2(t), raising=True
    )
    P.write_pages(df, "catalog.db.pages")
    assert calls == {"target": "catalog.db.pages", "overwrite": True}


def test_read_pages_parquet_path_pins_schema(spark, pages_path, tmp_path):
    import shutil

    import eugl_spark.sources.pages as P

    # read_pages on a path must use the pinned schema (no inference)
    d = str(tmp_path / "pages_dir")
    import os
    os.makedirs(d)
    shutil.copy(pages_path, os.path.join(d, "part-0.parquet"))
    df = P.read_pages(spark, d)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang",
    ]
