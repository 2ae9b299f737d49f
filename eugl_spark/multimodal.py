"""Multimodal column plumbing: image/audio/video as opaque binary.

Media payloads are `binary` columns with a typed metadata struct; the
Spark-side plumbing (schema, partition strategy, mapInPandas batch
shape, Arrow transfer) is real and tested. Decoding is REAL for every
format the stdlib can carry — PNG (zlib), BMP, PGM/PPM, PCM WAV
(`eugl_spark.codecs`, magic-byte dispatch) — so the default
`decode=real_decode` path runs end-to-end on genuine files.
Compressed codecs (JPEG/Opus/AV1) need external libraries absent
here: those payloads surface as per-row NotImplementedError rows
(never task failures), and a library-backed decoder plugs in via the
same `decode=` hook — the pattern of the reference's subprocessed
GDAL tools behind a uniform runner
(/root/reference/eugl/fmask.py:108-156).
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


def synthesize_real_media(
    spark: SparkSession, n: int, seed: int = 42
) -> DataFrame:
    """Deterministic media table of REAL files: images cycle
    PNG/BMP/PPM/baseline-JPEG, audio is 16-bit PCM WAV, and every 9th
    row is an 'av1' video payload no stdlib codec can open —
    exercising the NotImplementedError error-row path in real mode."""
    from eugl_spark import codecs

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n):
        mod = i % 9
        if mod == 8:  # genuinely-unsupported compressed format
            payload = b"\x00\x00\x00 ftypav01" + bytes(rng.randint(0, 256, 64, "u1"))
            rows.append((i, "video", bytearray(payload),
                         (None, None, int(rng.randint(1000, 60000)), "av1")))
            continue
        if mod in (0, 3, 6):  # audio
            t = np.arange(400 + 8 * (i % 13), dtype=np.float64)
            sig = 0.5 * np.sin(2 * np.pi * t * (0.01 + 0.001 * (i % 7)))
            payload = codecs.encode_wav(sig, rate=16000)
            rows.append((i, "audio", bytearray(payload),
                         (None, None, int(len(t) * 1000 // 16000), "wav")))
            continue
        h, w = int(rng.randint(4, 24)), int(rng.randint(4, 24))
        img = rng.randint(0, 256, (h, w, 3), "u1")
        # rotate by the block index: the image mods {1,2,4,5,7} within
        # a 9-block never cover all residues alone — adding i // 9
        # cycles every encoder through the corpus
        enc, codec = [
            (codecs.encode_png, "png"),
            (codecs.encode_bmp, "bmp"),
            (codecs.encode_netpbm, "ppm"),
            (codecs.encode_jpeg, "jpeg"),
        ][(i // 9 + i) % 4]
        rows.append((i, "image", bytearray(enc(img)), (w, h, None, codec)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def real_decode(kind: str, payload: bytes, meta) -> np.ndarray:
    """Real decode via stdlib codecs (PNG/BMP/netpbm/WAV/baseline-JPEG,
    magic-byte dispatch). Raises NotImplementedError for formats that
    genuinely need external libraries (Opus/AV1) — per-row isolated by
    the callers, and replaceable via the decode= hook."""
    from eugl_spark.codecs import sniff_decode

    return sniff_decode(payload)


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
                    sig = np.asarray(
                        decode(kind, bytes(payload), meta)
                    ).ravel()  # images arrive (H,W,C), audio (n,ch)
                    if sig.size < FEATURE_DIM:
                        # buckets past sig.size would pool an empty
                        # slice into NaN with error=None — flag
                        # instead, like sample_frames (M7)
                        raise ValueError(
                            f"signal of {sig.size} samples < "
                            f"FEATURE_DIM={FEATURE_DIM}"
                        )
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
    """Image resize: filter → mapInPandas → PNG-encoded binary out.

    Decoded (H, W[, C]) arrays are nearest-neighbor resampled with
    pure-numpy fancy indexing and re-encoded as PNG
    (eugl_spark.codecs); a 1-D decode result (the fake plumbing path)
    is treated as a 1×N gray image so batch shape and schema are
    exercised identically."""
    from eugl_spark.codecs import encode_png, resize_nearest

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("error", T.StringType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, errs = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                try:
                    sig = np.asarray(decode("image", bytes(payload), meta))
                    if sig.ndim == 1:
                        sig = sig[None, :]  # 1×N gray
                    small = resize_nearest(
                        np.clip(sig, 0, 255).astype(np.uint8), width, height
                    )
                    payloads.append(bytearray(encode_png(small)))
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
