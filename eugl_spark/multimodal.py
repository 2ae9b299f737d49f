"""Multimodal column plumbing: image/audio/video as opaque binary.

Media payloads are `binary` columns with a typed metadata struct; the
Spark-side plumbing (schema, partition strategy, mapInPandas batch
shape, Arrow transfer) is real and tested. The actual codec work is
STUBBED: the image/audio libraries are not in this environment, so
`decode=...` hooks either raise NotImplementedError (real mode) or
run a deterministic fake (test mode) — the same pattern as the
reference's subprocessed GDAL tools, which eugl treats as opaque
kernels behind a uniform runner (/root/reference/eugl/fmask.py:108-156).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                    T.StructField("codec", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 8

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def synthesize_media(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (no real codecs involved)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (
            1 + rng.randint(4)
        )
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                (
                    int(rng.randint(64, 1920)) if kind == "image" else None,
                    int(rng.randint(64, 1080)) if kind == "image" else None,
                    int(rng.randint(1000, 600000)) if kind != "image" else None,
                    {"image": "png", "audio": "opus", "video": "av1"}[kind],
                ),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def real_decode(kind: str, payload: bytes, meta) -> np.ndarray:
    """Hook for a real decoder (PIL/torchaudio/pyav) — not available
    in this environment."""
    raise NotImplementedError(
        f"no {kind} codec libraries in this environment; "
        "pass decode=fake_decode for the deterministic test path"
    )


def fake_decode(kind: str, payload: bytes, meta) -> np.ndarray:
    """Deterministic stand-in: derives a fixed-size 'signal' from the
    payload bytes so the distributed plumbing is fully testable."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float32)
    if arr.size == 0:
        raise ValueError("empty payload")
    return arr


def extract_features(media: DataFrame, decode=real_decode) -> DataFrame:
    """Per-media feature extraction via mapInPandas.

    mapInPandas (not a scalar UDF): the decode step is batch-level
    and may need per-partition state (codec contexts); errors are
    captured per row (M7 fault-isolation — a corrupt payload must
    never fail the task, /root/reference/eugl/gqa/tasks.py:209-233).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(
                    lambda b: len(b) if b is not None else None
                ),
                "feature": None,
                "error": None,
            }
            feats, errs = [], []
            for kind, payload, meta in zip(
                pdf["kind"], pdf["payload"], pdf["meta"]
            ):
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    sig = decode(kind, bytes(payload), meta)
                    # fixed-length pooled feature: FEATURE_DIM bucket means
                    k = max(1, sig.size // FEATURE_DIM)
                    pooled = [
                        float(sig[j * k : (j + 1) * k].mean())
                        for j in range(FEATURE_DIM)
                    ]
                    feats.append(pooled)
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    feats.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            res = pd.DataFrame(out)
            res["feature"] = feats
            res["error"] = errs
            yield res

    return media.mapInPandas(run, FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int,
                  decode=real_decode) -> DataFrame:
    """Image resize plumbing: filter → mapInPandas → binary out.

    Real resampling needs an image library (stubbed); the fake path
    re-buckets the decoded byte signal to width*height bytes so batch
    shape and schema are exercised end-to-end."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            payloads, errs = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    sig = decode("image", bytes(payload), meta)
                    idx = (np.arange(target) * sig.size // target).clip(
                        0, sig.size - 1
                    )
                    payloads.append(bytearray(sig[idx].astype(np.uint8).tobytes()))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001
                    payloads.append(None)
                    errs.append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "error": errs}
            )

    return media.filter(F.col("kind") == "image").mapInPandas(run, out_schema)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("ts_ms", T.IntegerType(), True),
        T.StructField("frame", T.BinaryType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)


def sample_frames(
    media: DataFrame, n_frames: int, decode=real_decode
) -> DataFrame:
    """Video frame sampling: one input row → n_frames output rows.

    Exercises the 1→N mapInPandas shape (decode/feature are 1→1).
    Frame timestamps are evenly spaced over meta.duration_ms —
    deterministic, so downstream training-data joins are replayable.
    Real frame extraction needs pyav (stubbed); the fake path slices
    the decoded byte signal into n_frames equal chunks. Per-row fault
    isolation: a corrupt video yields n_frames error rows, never a
    task failure (M7)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {
                "media_id": [], "frame_idx": [], "ts_ms": [],
                "frame": [], "error": [],
            }
            for mid, payload, meta in zip(
                pdf["media_id"], pdf["payload"], pdf["meta"]
            ):
                dur = meta["duration_ms"] if meta is not None else None
                try:
                    if payload is None:
                        raise ValueError("null payload")
                    sig = decode("video", bytes(payload), meta)
                    if sig.size < n_frames:
                        # would yield empty frames with error=None —
                        # flag instead (M7: bad media is an error row)
                        raise ValueError(
                            f"signal of {sig.size} samples < {n_frames} frames"
                        )
                    k = max(1, sig.size // n_frames)
                    for j in range(n_frames):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(j)
                        rows["ts_ms"].append(
                            int(dur * j // n_frames) if dur else None
                        )
                        chunk = sig[j * k : (j + 1) * k]
                        rows["frame"].append(
                            bytearray(chunk.astype(np.uint8).tobytes())
                        )
                        rows["error"].append(None)
                except Exception as e:  # noqa: BLE001 — per-row isolation
                    for j in range(n_frames):
                        rows["media_id"].append(mid)
                        rows["frame_idx"].append(j)
                        rows["ts_ms"].append(None)
                        rows["frame"].append(None)
                        rows["error"].append(f"{type(e).__name__}: {e}")
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        run, FRAME_SCHEMA
    )
