"""Pathological sweep for the index/sidecar/line-filter families
(CDXJ, WAT, C4): hard-input corpora through every oracle-backed query
of each family in BOTH engines — the documents/events/links sweep
framework applied to the round-6 surfaces.

Documented engine boundary (pinned Spark-only below, like the
broken-UTF-8 html case): a WAT Links array with MIXED element types
(scalars beside objects) is null under Spark's from_json — the whole
array fails strict schema decode — while DuckDB's per-element
TRY_CAST keeps the object elements. Such rows stay out of the parity
corpus; uniform damage (object-instead-of-array, numeric field
values, missing subtrees, malformed JSON) IS in it.
"""

from __future__ import annotations

import json

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import eugl_spark.plans.queries as Q
from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY

# --- hard CDXJ index ---------------------------------------------------


def _cj(**kw):
    return json.dumps(kw, separators=(",", ":"))


_BASE = dict(
    mime="text/html", status="200", digest="sha1:p",
    length="100", offset="0", filename="p/a.warc.gz",
)

PATHO_CDXJ = [
    # plain good line
    "com,ok)/p 20240301120000 " + _cj(url="https://ok.example/p", **_BASE),
    # huge offset (2^40), 1-byte record
    "com,big)/p 20240301120000 "
    + _cj(url="https://big.example/p", **{**_BASE,
          "offset": str(1 << 40), "length": "1"}),
    # damaged numerics: negative offset / zero / negative length → drop
    "com,neg)/p 20240301120000 "
    + _cj(url="https://neg.example/p", **{**_BASE, "offset": "-5"}),
    "com,zl)/p 20240301120000 "
    + _cj(url="https://zl.example/p", **{**_BASE, "length": "0"}),
    "com,nl)/p 20240301120000 "
    + _cj(url="https://nl.example/p", **{**_BASE, "length": "-1"}),
    # non-numeric numerics → drop
    "com,nan)/p 20240301120000 "
    + _cj(url="https://nan.example/p", **{**_BASE, "offset": "abc"}),
    # numeric JSON values instead of strings (variant indexers)
    "com,numjson)/p 20240301120000 "
    + '{"url":"https://numjson.example/p","mime":"text/html",'
    '"status":200,"digest":"sha1:n","length":77,"offset":12,'
    '"filename":"p/n.warc.gz"}',
    # unicode surt + unicode url
    "com,uni)/п 20240301120000 "
    + _cj(url="https://uni.example/п", **_BASE),
    # invalid calendar date (Feb 30) → drop in both engines
    "com,feb30)/p 20240230120000 "
    + _cj(url="https://feb30.example/p", **_BASE),
    # 13- and 15-digit timestamps → drop
    "com,ts13)/p 2024030112000 " + _cj(url="https://t13.example/p", **_BASE),
    "com,ts15)/p 202403011200001 "
    + _cj(url="https://t15.example/p", **_BASE),
    # double space between tokens → token 2 empty → drop
    "com,dsp)/p  20240301120000 " + _cj(url="https://d.example/p", **_BASE),
    # empty and whitespace-only lines
    "",
    "   ",
    # extra JSON fields + nested objects: ignored, row kept
    "com,extra)/p 20240301120000 "
    + '{"url":"https://extra.example/p","mime":"text/html","status":"200",'
    '"digest":"sha1:e","length":"50","offset":"700","filename":"p/e.warc",'
    '"redirect":null,"meta":{"nested":{"deep":[1,2,3]}}}',
    # same url captured twice at the SAME ts: (offset, filename)
    # tie-break must pick one WHOLE row identically in both engines
    "com,tie)/p 20240301120000 "
    + _cj(url="https://tie.example/p", **{**_BASE, "offset": "100",
          "filename": "p/tie-b.warc"}),
    "com,tie)/p 20240301120000 "
    + _cj(url="https://tie.example/p", **{**_BASE, "offset": "300",
          "filename": "p/tie-a.warc"}),
    # revisit chain for latest-selection across files
    "com,rev)/p 20240101000000 "
    + _cj(url="https://rev.example/p", **{**_BASE, "offset": "0",
          "filename": "p/old.warc"}),
    "com,rev)/p 20240601000000 "
    + _cj(url="https://rev.example/p", **{**_BASE, "offset": "5000",
          "filename": "p/new.warc"}),
    # adjacent offsets in one file (span coalescing) + far jump
    "com,sp1)/p 20240301120000 "
    + _cj(url="https://sp1.example/p", **{**_BASE, "offset": "1000",
          "filename": "p/span.warc"}),
    "com,sp2)/p 20240301120000 "
    + _cj(url="https://sp2.example/p", **{**_BASE, "offset": "1104",
          "filename": "p/span.warc"}),
    "com,sp3)/p 20240301120000 "
    + _cj(url="https://sp3.example/p", **{**_BASE, "offset": "9000000",
          "filename": "p/span.warc"}),
    # non-html mime and non-200 status (parse keeps, selection drops)
    "com,pdf)/p 20240301120000 "
    + _cj(url="https://pdf.example/p", **{**_BASE,
          "mime": "application/pdf"}),
    "com,404)/p 20240301120000 "
    + _cj(url="https://e404.example/p", **{**_BASE, "status": "404"}),
    # status as a word → null status (kept by parse, dropped by select)
    "com,oddstatus)/p 20240301120000 "
    + _cj(url="https://odd.example/p", **{**_BASE, "status": "teapot"}),
]


# --- hard WAT records --------------------------------------------------


def _wat(url, payload, uri=True, date="2024-04-01T00:00:00Z"):
    head = "WARC/1.0\r\nWARC-Type: metadata\r\n"
    if uri:
        head += f"WARC-Target-URI: {url}\r\n"
    head += f"WARC-Date: {date}\r\n"
    return (head + "\r\n" + payload).encode("utf-8")


def _env(links=None, title=None, html_meta=True):
    e = {"Envelope": {"Payload-Metadata": {"HTTP-Response-Metadata": {}}}}
    if html_meta:
        e["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
            "HTML-Metadata"
        ] = {"Head": {"Title": title}, "Links": links if links is not None
             else []}
    return json.dumps(e, separators=(",", ":"))


PATHO_WAT = [
    _wat("https://w0.example/a", _env(
        links=[{"path": "A@/href", "url": "https://t.example/x"}],
        title="plain")),
    # Links is an OBJECT, not an array: null links in both engines
    _wat("https://w1.example/obj",
         '{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
         '{"HTML-Metadata":{"Head":{"Title":"obj"},"Links":{"a":1}}}}}}'),
    # uniform array but url is a NUMBER → coerced to its literal in
    # both engines ('7'); no host parses → dropped from edges
    _wat("https://w2.example/num", _env(
        links=[{"path": "A@/href", "url": 7}], title="num")),
    # missing url key in a link object
    _wat("https://w3.example/nourl", _env(
        links=[{"path": "A@/href"}], title="nourl")),
    # empty links array / no HTML-Metadata at all / empty JSON object
    _wat("https://w4.example/empty", _env(links=[], title=None)),
    _wat("https://w5.example/nohtml", _env(html_meta=False)),
    _wat("https://w6.example/brace", "{}"),
    # malformed JSON payload
    _wat("https://w7.example/mal", '{"Envelope": {'),
    # unicode title with emoji; unicode target host
    _wat("https://w8.example/uni", _env(
        links=[{"path": "A@/href", "url": "https://пример.example/п"}],
        title="Титле 🎉")),
    # userinfo/port target; uppercase-scheme target
    _wat("https://w9.example/auth", _env(
        links=[{"path": "A@/href", "url": "https://u:p@tt.example:8443/q"},
               {"path": "A@/href", "url": "HTTPS://UP.example/x"}],
        title="auth")),
    # missing URI header: dropped by the shared header contract
    _wat("https://dropme.example/", _env(links=[]), uri=False),
    # 600-link page (bounded explode)
    _wat("https://w10.example/big", _env(
        links=[{"path": "A@/href", "url": f"https://b{i % 9}.example/{i}"}
               for i in range(600)], title="big")),
]


# --- hard C4 docs ------------------------------------------------------

PATHO_C4 = [
    (0, "https://c0.example/", None),
    (1, "https://c1.example/", ""),
    # \r\n endings: trailing \r survives trim in BOTH engines → the
    # ender check sees '\r', line dropped identically
    (2, "https://c2.example/", "crlf line one ends here.\r\n"
        "crlf line two ends here.\r\nplain tail line is fine."),
    # unicode curly-quote / CJK enders: OUTSIDE the ASCII contract →
    # dropped identically (documented: C4's 'end quotation mark' is
    # implemented as ASCII '\"')
    (3, "https://c3.example/", "smart quote line ends here”\n"
        "cjk stop line ends here。\nplain ascii line ends here."),
    # exactly 3 words / 2 words boundary
    (4, "https://c4.example/", "three words here.\nonly two.\n"
        "four words are here."),
    # javascript casing variants
    (5, "https://c5.example/", "Enable JAVASCRIPT to view this.\n"
        "JavaScript is required here.\nclean line stays right here."),
    # lorem ipsum casing; brace inside an otherwise-dropped line still
    # kills the doc (doc gates read the RAW text)
    (6, "https://c6.example/", "LOREM IPSUM dolor sit amet."),
    (7, "https://c7.example/", "good line one stays here.\n{\n"
        "good line two stays here."),
    # tabs as separators: NOT word separators (space contract)
    (8, "https://c8.example/", "tab\tseparated\ttokens\there."),
    # a line of only punctuation; leading spaces
    (9, "https://c9.example/", "...\n   indented line stays here.\n!!!"),
    # very long single line (10k words)
    (10, "https://c10.example/", " ".join(["word"] * 10000) + "."),
    # windows-1252-ish curly apostrophe inside the line (content, not
    # ender) — must not affect the rules
    (11, "https://c11.example/", "it’s a fine line and it stays here.\n"
        "second fine line stays here too.\nthird line is here as well.\n"
        "fourth line is here as well.\nfifth line is here as well."),
]


@pytest.fixture(scope="module")
def patho_paths(tmp_path_factory):
    root = tmp_path_factory.mktemp("patho_index")
    cdx = str(root / "cdxj.parquet")
    pq.write_table(
        pa.Table.from_pydict(
            {"line": PATHO_CDXJ}, schema=pa.schema([("line", pa.string())])
        ),
        cdx,
    )
    wat = str(root / "wat.parquet")
    pq.write_table(
        pa.Table.from_pydict(
            {"content": PATHO_WAT},
            schema=pa.schema([("content", pa.binary())]),
        ),
        wat,
    )
    c4 = str(root / "c4.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "url": u, "text": t} for i, u, t in PATHO_C4],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("text", pa.string())]
            ),
        ),
        c4,
    )
    return {"cdx": cdx, "wat": wat, "c4": c4}


_SWEEP = {
    "cdx_parse": ("cdx", "ensure_cdxj", Q._cdx_parse_sql),
    "cdx_latest_html": ("cdx", "ensure_cdxj", Q._cdx_latest_sql),
    "cdx_fetch_plan": ("cdx", "ensure_cdxj", Q._cdx_fetch_plan_sql),
    "wat_outlinks": ("wat", "ensure_wat_blobs", Q._wat_outlinks_sql),
    "wat_page_index": ("wat", "ensure_wat_blobs", Q._wat_page_index_sql),
    "qf_c4_line_filter": ("c4", "ensure_c4_docs", Q._c4_line_filter_sql),
}


@pytest.mark.parametrize("name", sorted(_SWEEP))
def test_index_families_on_pathological_corpus(
    spark, patho_paths, name, monkeypatch
):
    corpus, ensure_name, sql_builder = _SWEEP[name]
    path = patho_paths[corpus]
    monkeypatch.setattr(Q, ensure_name, lambda: path)
    got = REGISTRY[name].spark(spark, "").toPandas()
    con = duckdb.connect()
    want = con.sql(sql_builder(path)).df()
    res = compare_frames(got, want)
    assert res["values_match"], (name, res["diff"])
    assert len(got) > 0, f"{name}: vacuous sweep"


def test_cdx_damage_contract(spark, patho_paths, monkeypatch):
    """The specific drops: negative/zero numerics, bad calendar dates,
    wrong-width timestamps, double-space lines — while huge offsets,
    numeric-JSON variants and unicode survive."""
    monkeypatch.setattr(Q, "ensure_cdxj", lambda: patho_paths["cdx"])
    rows = {r["url"]: r for r in REGISTRY["cdx_parse"].spark(spark, "").collect()}
    for gone in ("https://neg.example/p", "https://zl.example/p",
                 "https://nl.example/p", "https://nan.example/p",
                 "https://feb30.example/p", "https://t13.example/p",
                 "https://t15.example/p", "https://d.example/p"):
        assert gone not in rows, gone
    assert rows["https://big.example/p"]["offset"] == 1 << 40
    assert rows["https://numjson.example/p"]["length"] == 77
    assert rows["https://numjson.example/p"]["status"] == 200
    assert "https://uni.example/п" in rows
    assert rows["https://odd.example/p"]["status"] is None


def test_wat_mixed_type_links_spark_boundary(spark):
    """Documented boundary (Spark-only, the broken-UTF-8 precedent):
    a MIXED-type Links array is null under strict from_json — the
    whole array, not just the scalar elements. DuckDB's per-element
    cast keeps the objects, so such rows stay out of the parity
    corpus."""
    from eugl_spark.sources.wat import parse_wat_records

    payload = (
        '{"Envelope":{"Payload-Metadata":{"HTTP-Response-Metadata":'
        '{"HTML-Metadata":{"Links":[5,"s",'
        '{"path":"A@/href","url":"https://kept-by-duckdb.example/"}]}}}}}'
    )
    df = spark.createDataFrame([(_wat("https://m.example/", payload),)],
                               "content binary")
    rows = parse_wat_records(df).collect()
    assert len(rows) == 1 and rows[0]["links"] is None
