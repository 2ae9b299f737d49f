"""Minimal WARC-style ingestion: raw binary records → pages rows.

The reference's archive connector unpacks zip/tar members into its
processing layout (/root/reference/eugl/fmask.py:477-554); the
web-scale analog turns raw crawl records (one binary blob per
response) into the canonical pages schema entirely with Catalyst
expressions — decode, header field extraction, body split — so
ingestion stays JVM-side and parallel.

Record layout handled (simplified WARC response record):

    WARC/1.0\r\n
    WARC-Target-URI: <url>\r\n
    WARC-Date: 2024-01-01T00:00:00Z\r\n
    ...headers...\r\n
    \r\n
    <html payload>
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# [ \t]*, NOT \s*: Java's \s matches \r\n, so an EMPTY-valued header
# ('WARC-Target-URI: \r\nWARC-Date: ...') would capture the NEXT
# line's token as the value — a damaged record that must be dropped
# (null url) would instead survive with url='WARC-Date:', polluting
# dedup keys and per-host state
_URI_RE = r"(?m)^WARC-Target-URI:[ \t]*(\S+)"
_DATE_RE = r"(?m)^WARC-Date:[ \t]*(\S+)"
_HEAD_RE = r"(?s)^(.*?)\r\n\r\n"
_BODY_RE = r"(?s)\r\n\r\n(.*)$"


def parse_warc_records(raw: DataFrame, content_col: str = "content") -> DataFrame:
    """raw(content: binary, ...) → pages(url, warc_ts, html, text, lang).

    All-native plan: decode happens once, header fields come from
    regexp_extract, the body is re-encoded to the binary html column.
    Records missing a URI are dropped (count them upstream via
    observe() if needed); text/lang are null — the pipeline's
    extraction path fills them.
    """
    rec = F.decode(F.col(content_col), "UTF-8")
    # header fields are extracted from the HEADER BLOCK only (the text
    # before the first blank line): a crawled page whose BODY contains
    # a line like 'WARC-Target-URI: http://evil/' (e.g. a page about
    # the WARC format) must not be able to spoof the record's url or
    # date — and a record MISSING its URI header must be dropped even
    # when its payload happens to contain one
    head = F.regexp_extract(rec, _HEAD_RE, 1)
    url = F.regexp_extract(head, _URI_RE, 1)
    # try_to_timestamp: a damaged record with a missing/malformed
    # WARC-Date must yield a null warc_ts, not abort the ingest job
    # under ANSI (same tolerance contract as the missing-URI drop).
    ts = F.try_to_timestamp(
        F.regexp_extract(head, _DATE_RE, 1), F.lit("yyyy-MM-dd'T'HH:mm:ssX")
    )
    body = F.regexp_extract(rec, _BODY_RE, 1)
    return (
        raw.select(
            F.nullif(url, F.lit("")).alias("url"),
            ts.alias("warc_ts"),
            F.encode(body, "UTF-8").alias("html"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("lang"),
        )
        .filter(F.col("url").isNotNull())
    )
