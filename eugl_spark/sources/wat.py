"""WAT metadata ingestion: Common Crawl's JSON sidecar records.

A WAT file carries one WARC ``metadata`` record per captured page
whose payload is a JSON envelope describing the capture — head
metadata (title), and the page's extracted link list — so link-graph
and index pipelines can run WITHOUT re-parsing html. This is the
web-scale analog of the reference's sidecar-metadata scan (S4/S5,
/root/reference/eugl/metadata.py:221-263): a smaller, structured
companion artifact read in place of the heavy payload.

All-native plan: the WARC header fields come from the shared
``_record_fields`` chain (same spoof-proof header-block contract as
the page parsers), the JSON subtree is located with
``get_json_object`` and decoded once with ``from_json`` — JVM-side,
whole-stage-codegen-friendly, no Python in the path. A malformed
JSON payload yields null metadata (skipped rows downstream), never an
ingest abort — the per-record fault-isolation contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eugl_spark.sources.warc import _record_fields

# JSONPath into the WAT envelope (bracket form: the keys carry '-').
_HTML_META = (
    "$.Envelope['Payload-Metadata']['HTTP-Response-Metadata']"
    "['HTML-Metadata']"
)
_LINKS_PATH = _HTML_META + ".Links"
_TITLE_PATH = _HTML_META + ".Head.Title"

# Each WAT link is {"path": "<kind>", "url": "<target>"}; anchors are
# path='A@/href' (images IMG@/src, stylesheets LINK@/href, …).
_LINKS_SCHEMA = "array<struct<path:string,url:string>>"
ANCHOR_PATH = "A@/href"


def parse_wat_records(raw: DataFrame, content_col: str = "content") -> DataFrame:
    """raw(content: binary, …) → (url, warc_ts, title,
    links: array<struct<path,url>>).

    Records missing a URI are dropped (the shared header contract);
    a payload that is not valid JSON — or has no HTML-Metadata
    subtree — yields null title/links (kept: the capture row itself
    is still real; link consumers explode ``links``, which skips
    nulls natively)."""
    url, ts, body, head = _record_fields(content_col)
    return raw.select(
        url.alias("url"),
        ts.alias("warc_ts"),
        F.get_json_object(body, _TITLE_PATH).alias("title"),
        F.from_json(
            F.get_json_object(body, _LINKS_PATH), _LINKS_SCHEMA
        ).alias("links"),
    ).filter(F.col("url").isNotNull())


def wat_host_edges(wat: DataFrame) -> DataFrame:
    """parse_wat_records frame → (src, dst, n_links) host edge list:
    anchor links only, absolute http(s) targets only, hosts derived
    with THE shared HOST_RE contract — the same edge semantics as
    link_host_edges, computed from WAT metadata instead of raw html
    (at crawl scale the WAT path reads ~10× fewer bytes: the fat
    html column never leaves the archive)."""
    from eugl_spark.functions.hosts import HOST_RE

    lk = wat.select(
        F.regexp_extract("url", HOST_RE, 1).alias("src"),
        F.explode("links").alias("lk"),
    ).filter(F.col("lk.path") == ANCHOR_PATH)
    return (
        lk.select(
            "src",
            F.regexp_extract(F.col("lk.url"), HOST_RE, 1).alias("dst"),
        )
        .filter((F.col("dst") != "") & (F.col("src") != ""))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("n_links"))
    )
