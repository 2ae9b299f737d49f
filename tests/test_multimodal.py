"""Multimodal binary-column plumbing: schema, mapInPandas batch shape,
per-row fault isolation. Codec work is stubbed (fake_decode) — the
libraries aren't in this environment; the real hook raises cleanly."""

from __future__ import annotations

from pyspark.sql import functions as F

from eugl_spark.multimodal import (
    FEATURE_DIM,
    MEDIA_SCHEMA,
    extract_features,
    fake_decode,
    real_decode,
    resize_images,
    synthesize_media,
)


def test_extract_features_fake_path(spark):
    media = synthesize_media(spark, 60)
    feats = extract_features(media, decode=fake_decode).collect()
    assert len(feats) == 60
    ok = [r for r in feats if r["error"] is None]
    assert len(ok) == 60
    assert all(len(r["feature"]) == FEATURE_DIM for r in ok)
    # deterministic: same synth → same features
    again = extract_features(
        synthesize_media(spark, 60), decode=fake_decode
    ).collect()
    assert {r["media_id"]: r["feature"] for r in feats} == {
        r["media_id"]: r["feature"] for r in again
    }


def test_extract_features_real_hook_isolates_errors(spark):
    media = synthesize_media(spark, 9)
    rows = extract_features(media, decode=real_decode).collect()
    assert len(rows) == 9  # no task failure — per-row capture (M7)
    assert all(r["feature"] is None for r in rows)
    assert all("NotImplementedError" in r["error"] for r in rows)


def test_null_payload_isolated(spark):
    media = synthesize_media(spark, 5).withColumn(
        "payload",
        F.when(F.col("media_id") == 2, F.lit(None)).otherwise(F.col("payload")),
    )
    rows = {r["media_id"]: r for r in extract_features(media, decode=fake_decode).collect()}
    assert rows[2]["error"] is not None and rows[2]["feature"] is None
    assert rows[1]["error"] is None


def test_resize_images(spark):
    media = synthesize_media(spark, 30)
    out = resize_images(media, 8, 6, decode=fake_decode).collect()
    n_images = media.filter(F.col("kind") == "image").count()
    assert len(out) == n_images
    assert all(len(r["payload"]) == 48 for r in out if r["error"] is None)


def test_media_schema_roundtrip(spark, tmp_path):
    media = synthesize_media(spark, 20)
    p = str(tmp_path / "media")
    media.write.parquet(p)
    back = spark.read.parquet(p)
    # parquet roundtrip relaxes nullability; compare names and types
    assert [(f.name, f.dataType) for f in back.schema.fields] == [
        (f.name, f.dataType) for f in MEDIA_SCHEMA.fields
    ]
    assert back.count() == 20
