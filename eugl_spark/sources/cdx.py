"""Capture-index (CDXJ) ingestion and byte-range fetch planning.

At archive scale nobody scans 100 TB of WARC to find their subset:
the capture INDEX (CDXJ — one `<SURT> <14-digit-ts> <JSON>` line per
capture, the Common-Crawl/pywb format) is the entry point. Select
records there, then read only the matching byte ranges from the
shard files. This module is that front: a native line parse and a
gaps-and-islands fetch planner that coalesces selected records into
merged byte spans per shard — the reference's analog is its
acquisition-listing scan choosing which granule files to open
(/root/reference/eugl/acquisition_info.py:60-68), one level down.

All-native plans: regexp field split + get_json_object (JVM,
whole-stage codegen); the planner is one window over
(filename, offset) — partition-parallel by shard file, which is how
the index itself is naturally keyed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# <SURT-key> <exactly-14-digit-ts> <JSON object>; anything else is a
# damaged line and drops (per-record fault isolation).
_CDXJ_RE = r"^(\S+) (\d{14}) (\{.*\})$"


# the JSON payload decodes ONCE via from_json (get_json_object would
# re-parse the document per field — 7×); from_json is also strict on
# the WHOLE document (truncated tail → null struct), matching the
# oracle's try_cast(… AS JSON) exactly — a lenient per-field extractor
# could recover fields from a prefix-valid damaged line and diverge
_CDXJ_SCHEMA = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


# RE2's \S is [^\t\n\f\r ] — Java's \s additionally counts \x0B, so a
# bare \S here would silently drop \x0B-bearing keys the oracle keeps.
# The explicit class reads identically in both dialects.
_SURT_TOKEN_RE = r"^[^ \t\n\f\r]+$"
_TS_TOKEN_RE = r"^(\d{14})$"


def parse_cdxj(raw: DataFrame, line_col: str = "line") -> DataFrame:
    """raw(line: string) → (surt, ts, url, mime, status, digest,
    length, offset, filename).

    Damaged lines (no 3-part shape, unparseable timestamp, malformed
    JSON, missing mandatory url/filename/offset/length fields) are
    dropped, never an abort. Numeric fields try_cast (ANSI-safe).

    Plan shape (measured 2× on the 200k-line bench): the line is
    tokenized with split(limit=3) — three cheap token checks replace
    three full-line regex passes — and the JSON decodes through an
    ``inline(array(from_json(…)))`` generator. The generator is the
    load-bearing part: a bare struct column gets per-field
    schema-pruned by OptimizeJsonExprs and then re-inlined into every
    field reference AND every pushed filter predicate (11 Jackson
    parses per row on this 9-field record); generator output
    attributes are opaque to that rewrite, so the document parses
    exactly once. Same trap class as the verify-skill's Catalyst
    note on filters above expensive transforms."""
    line = F.col(line_col)
    toks = F.split(line, " ", 3)
    surt, tss, js = F.get(toks, 0), F.get(toks, 1), F.get(toks, 2)
    pre = raw.select(
        F.when(surt.rlike(_SURT_TOKEN_RE), surt).alias("surt"),
        F.try_to_timestamp(
            F.nullif(F.regexp_extract(tss, _TS_TOKEN_RE, 1), F.lit("")),
            F.lit("yyyyMMddHHmmss"),
        ).alias("ts"),
        js.alias("_js"),
    ).filter(F.col("surt").isNotNull() & F.col("ts").isNotNull())
    gen = pre.select(
        "surt",
        "ts",
        F.inline(F.array(F.from_json(F.col("_js"), _CDXJ_SCHEMA))),
    )
    return gen.select(
        "surt",
        "ts",
        "url",
        "mime",
        F.col("status").try_cast("int").alias("status"),
        "digest",
        F.col("length").try_cast("long").alias("length"),
        F.col("offset").try_cast("long").alias("offset"),
        "filename",
    ).filter(
        F.col("url").isNotNull()
        & F.col("filename").isNotNull()
        # a capture is ≥1 byte at a non-negative file position —
        # anything else is index damage (dropped, like any other
        # malformed line); the planner/reader downstream may then
        # assume sane ranges
        & (F.col("offset") >= 0)
        & (F.col("length") > 0)
    )


def build_cdxj_index(
    spark, archive_dir: str, pattern: str = "*.warc"
) -> DataFrame:
    """The INDEXER: WARC archive → CDXJ lines (line: string) — the
    cc-index job that makes every other front in this module possible.
    With this the cycle is self-hosting: archive → build_cdxj_index →
    parse_cdxj → latest_captures → fetch_plan → read_ranged_records →
    the same bytes back.

    Per shard: the spans twin of THE exact splitter pairs each record
    with its (offset, length) such that a ranged read reproduces the
    record bytes (separators stripped from the end, so every record
    is a prefix of its slice). Everything after the split is native:
    header fields via the shared spoof-proof chain, status/mime from
    the HTTP envelope, digest = sha1 over the entity, SURT key from
    THE shared host derivation (simplified SURT: reversed host labels
    + path; no port/query normalization — documented), JSON via
    to_json over an all-string struct (CDXJ's conventional
    string-valued numerics).

    Scale shape: one mapInPandas over the many-shards axis emitting
    slim (filename, offset, length) + record bytes, then a single
    whole-stage-codegen projection; no shuffle at all — the index is
    written partition-parallel, one output split per shard batch."""
    import os

    import pandas as pd

    from eugl_spark.functions.hosts import HOST_RE, PATH_RE
    from eugl_spark.sources.warc import (
        _BODY_RE,
        _HEAD_RE,
        _HTTP_STATUS_RE,
        _record_fields,
        _split_blob_exact_spans,
    )

    root = os.path.abspath(archive_dir)
    # recursiveFileLookup: archives nest shards under segment dirs
    # (seg*/shard-*.warc) — the flat read_raw_drops listing would see
    # nothing (its drop-directory callers are flat by contract)
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", pattern)
        .option("recursiveFileLookup", "true")
        .load(archive_dir)
        .select("path", "content")
    )

    def gen(batches):
        for pdf in batches:
            fns, offs, lens, recs = [], [], [], []
            for path, blob in zip(pdf["path"], pdf["content"]):
                if blob is None:
                    continue
                fn = path
                for pref in ("file:" + root + "/", "file:/", ""):
                    if path.startswith(pref) and pref:
                        fn = path[len(pref):]
                        break
                for off, rec in _split_blob_exact_spans(bytes(blob)):
                    fns.append(fn)
                    offs.append(off)
                    lens.append(len(rec))
                    recs.append(rec)
            yield pd.DataFrame(
                {
                    "filename": pd.Series(fns, dtype=object),
                    "offset": pd.Series(offs, dtype="int64"),
                    "length": pd.Series(lens, dtype="int64"),
                    "content": pd.Series(recs, dtype=object),
                }
            )

    split = raw.mapInPandas(
        gen, "filename string, offset long, length long, content binary"
    )
    url, ts, body, head = _record_fields("content")
    http_head = F.regexp_extract(body, _HEAD_RE, 1)
    status = F.regexp_extract(body, _HTTP_STATUS_RE, 1).try_cast("int")
    entity = F.when(
        status.isNotNull(), F.regexp_extract(body, _BODY_RE, 1)
    ).otherwise(body)
    mime = F.nullif(
        F.trim(
            F.regexp_extract(
                http_head, r"(?im)^content-type:[ \t]*([^;\r\n]+)", 1
            )
        ),
        F.lit(""),
    )
    host = F.regexp_extract(url, HOST_RE, 1)
    path_part = F.regexp_extract(url, PATH_RE, 1)
    surt = F.concat(
        F.array_join(F.reverse(F.split(host, r"\.")), ","),
        F.lit(")"),
        F.when(path_part == "", "/").otherwise(path_part),
    )
    line = F.concat_ws(
        " ",
        surt,
        F.date_format(ts, "yyyyMMddHHmmss"),
        F.to_json(
            F.struct(
                url.alias("url"),
                mime.alias("mime"),
                status.cast("string").alias("status"),
                F.concat(
                    F.lit("sha1:"), F.sha1(F.encode(entity, "UTF-8"))
                ).alias("digest"),
                F.col("length").cast("string").alias("length"),
                F.col("offset").cast("string").alias("offset"),
                F.col("filename").alias("filename"),
            )
        ),
    )
    return (
        split.select(
            url.alias("_url"), ts.alias("_ts"), line.alias("line")
        )
        .filter(F.col("_url").isNotNull() & F.col("_ts").isNotNull())
        .select("line")
    )


def latest_captures(
    cdx: DataFrame, mime: str = "text/html", status: int = 200
) -> DataFrame:
    """Newest qualifying capture per url → (url, ts, filename,
    offset, length, digest). ATOMIC winner: one max_by over the whole
    payload struct ordered by (ts, offset, filename) — the
    dedup_url_latest recipe, so tied timestamps resolve to the same
    WHOLE row in any engine."""
    sel = cdx.filter(
        (F.col("mime") == mime) & (F.col("status") == status)
    )
    ordk = F.struct(
        F.col("ts"), F.col("offset"), F.col("filename")
    )
    win = F.max_by(
        F.struct("ts", "filename", "offset", "length", "digest"), ordk
    )
    return (
        sel.groupBy("url")
        .agg(win.alias("_w"))
        .select(
            "url",
            F.col("_w.ts").alias("ts"),
            F.col("_w.filename").alias("filename"),
            F.col("_w.offset").alias("offset"),
            F.col("_w.length").alias("length"),
            F.col("_w.digest").alias("digest"),
        )
    )


def read_ranged_records(
    spark, captures: DataFrame, root: str, gap: int = 65536
) -> DataFrame:
    """Execute the index contract's read side: plan coalesced spans
    over the selected captures (fetch_plan with per-span record
    manifests), open each shard once per span, read span bytes, and
    slice out EXACTLY the selected records → (content: binary) rows,
    the shape every parse front consumes.

    Slicing by the span's record manifest — not re-splitting the span
    — is load-bearing: the gap tolerance deliberately over-reads the
    bytes BETWEEN selected records, and on a dense shard those bytes
    are entire NON-selected records (e.g. superseded revisits the
    latest-capture selection just rejected); a framing re-split would
    resurrect them. Arrow-batched mapInPandas over the slim plan
    rows, one open+read per (file, span) — on an object store each
    span is one ranged GET; parallelism follows the plan's natural
    per-shard partitioning. ``root`` prefixes the index's relative
    filenames (local dir here; mount point / fuse path on a cluster —
    the seek+read pattern is identical). A missing or short shard
    yields no records, never an abort (per-span fault isolation)."""
    import os

    import pandas as pd

    plan = fetch_plan(captures, gap=gap, with_records=True).select(
        "filename", "span_start", "span_end", "records"
    )

    def gen(batches):
        for pdf in batches:
            out: list[bytes] = []
            for fn, start, end, recs in zip(
                pdf["filename"],
                pdf["span_start"],
                pdf["span_end"],
                pdf["records"],
            ):
                try:
                    with open(os.path.join(root, fn), "rb") as fh:
                        fh.seek(int(start))
                        blob = fh.read(int(end) - int(start))
                except OSError:
                    continue  # missing shard: fault-isolated
                for rec in recs:
                    lo = int(rec["offset"]) - int(start)
                    hi = lo + int(rec["length"])
                    if 0 <= lo < hi <= len(blob):  # short read: skip
                        out.append(blob[lo:hi])
            yield pd.DataFrame({"content": pd.Series(out, dtype=object)})

    return plan.mapInPandas(gen, "content binary")


def fetch_plan(
    captures: DataFrame, gap: int = 65536, with_records: bool = False
) -> DataFrame:
    """Selected captures → merged byte spans per shard file:
    (filename, span_start, span_end, n_records, record_bytes)
    [+ records: array<struct<offset,length>> when ``with_records``
    — the per-span manifest read_ranged_records slices by].

    Gaps-and-islands over (filename, offset): a record opens a new
    span when its offset exceeds the running maximum end of all
    earlier records in the file by more than ``gap`` (ranged reads
    tolerate small skips — one coalesced GET beats many tiny ones).
    span_end is exclusive (max offset+length). record_bytes sums the
    selected records only, so span_end - span_start - record_bytes
    is the over-read the gap tolerance bought.

    Scale shape: one window partitioned by filename (shard files are
    the index's natural unit, ~10^5 of them per crawl — wide, even
    parallelism) followed by a partial-agg groupBy on the same key;
    no join, no second shuffle (the groupBy key is a superset of the
    window key, so the exchange is reused)."""
    w = Window.partitionBy("filename").orderBy("offset", "length")
    prev_end = F.max(F.col("offset") + F.col("length")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_span = (
        prev_end.isNull() | (F.col("offset") > prev_end + F.lit(gap))
    ).cast("int")
    span_id = F.sum(new_span).over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    aggs = [
        F.min("offset").alias("span_start"),
        F.max(F.col("offset") + F.col("length")).alias("span_end"),
        F.count("*").alias("n_records"),
        F.sum("length").alias("record_bytes"),
    ]
    if with_records:
        aggs.append(
            F.sort_array(
                F.collect_list(F.struct("offset", "length"))
            ).alias("records")
        )
    return (
        captures.select("filename", "offset", "length")
        .withColumn("_span", span_id)
        .groupBy("filename", "_span")
        .agg(*aggs)
        .drop("_span")
    )
