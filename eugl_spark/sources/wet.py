"""WET export: pages → WARC ``conversion`` records and shard files.

The produce side of the ingestion contract (sources/warc.py consumes
WET; this writes it): a filtered corpus leaves the engine in the same
format it arrived in, so downstream consumers — including THIS
engine's own splitter/parse chain — ingest the export unchanged. The
reference's analog is its packaged-output writer re-emitting the
archive layout it reads (/root/reference/eugl/fmask.py:477-554, the
K1/K4 family).

Record assembly is one native projection (concat + encode, zero
Python); shard assembly is a mapInPandas over record batches — one
``.wet`` file per input partition, written beside-then-renamed (the
repo's atomic-publish recipe), with parallelism on the partition axis
exactly like the read side's many-files axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = b"\r\n\r\n"


def wet_records(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, text, …) → (content: binary) WET conversion
    records. Content-Length counts the text's UTF-8 OCTETS (the wire
    framing), not its characters; rows with a null url or null text
    are not exportable and drop (count upstream via observe() when
    the drop rate matters). A null warc_ts renders as the epoch —
    WARC-Date is mandatory in the format."""
    ts = F.coalesce(
        F.col("warc_ts"), F.lit("1970-01-01 00:00:00").cast("timestamp")
    )
    payload = F.encode(F.col("text"), "UTF-8")
    rec = F.concat(
        F.encode(
            F.concat_ws(
                "",
                F.lit("WARC/1.0\r\nWARC-Type: conversion\r\n"),
                F.lit("WARC-Target-URI: "),
                F.col("url"),
                F.lit("\r\nWARC-Date: "),
                F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss'Z'"),
                F.lit("\r\nContent-Type: text/plain\r\n"),
                F.lit("Content-Length: "),
                F.length(payload).cast("string"),
                F.lit("\r\n\r\n"),
            ),
            "UTF-8",
        ),
        payload,
    )
    return (
        pages.filter(F.col("url").isNotNull() & F.col("text").isNotNull())
        .select(rec.alias("content"))
    )


def write_wet_shards(records: DataFrame, out_dir: str) -> int:
    """Write (content: binary) records as ``.wet`` shard files — one
    shard per non-empty partition, records joined with the standard
    '\\r\\n\\r\\n' inter-record separator (trailing separator
    included, the format real WET files carry). Atomic publish: each
    shard lands as ``_tmp.<name>`` and renames into place
    (underscore-prefixed temps are invisible to partition discovery,
    the repo's compaction recipe). Returns the number of shards
    written. ``out_dir`` must be a directory every executor can reach
    (local dir here; fuse/NFS mount on a cluster — object stores
    would use their own multipart-commit instead of rename)."""
    import os
    import uuid

    import pandas as pd

    os.makedirs(out_dir, exist_ok=True)

    def gen(batches):
        bufs: list[bytes] = []
        for pdf in batches:
            for blob in pdf["content"]:
                if blob is not None:
                    bufs.append(bytes(blob) + _SEP)
        if bufs:
            name = f"part-{uuid.uuid4().hex}.wet"
            tmp = os.path.join(out_dir, f"_tmp.{name}")
            with open(tmp, "wb") as fh:
                fh.write(b"".join(bufs))
            os.replace(tmp, os.path.join(out_dir, name))
            yield pd.DataFrame({"n": [len(bufs)]})
        else:
            yield pd.DataFrame({"n": pd.Series([], dtype="int64")})

    out = records.mapInPandas(gen, "n long")
    return out.count()
