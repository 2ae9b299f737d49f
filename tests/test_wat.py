"""WAT sidecar ingestion (sources/wat.py) and the C4 line filter —
hand-built records pinning each rule, plus fault-isolation contracts.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from eugl_spark.sources.wat import parse_wat_records, wat_host_edges


def _wat_record(url, links=None, title=None, payload=None, uri=True):
    if payload is None:
        meta = {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": url},
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": title},
                            "Links": links or [],
                        }
                    }
                },
            }
        }
        payload = json.dumps(meta, separators=(",", ":"))
    head = "WARC/1.0\r\nWARC-Type: metadata\r\n"
    if uri:
        head += f"WARC-Target-URI: {url}\r\n"
    head += "WARC-Date: 2024-04-01T00:00:00Z\r\n"
    return (head + "\r\n" + payload).encode("ascii")


def _raw(spark, blobs):
    return spark.createDataFrame(
        [(b,) for b in blobs], "content binary"
    )


def test_wat_parse_contract(spark):
    """Titles and link arrays decode; missing-URI records drop; a
    malformed JSON payload keeps the row with null title/links
    (per-record fault isolation, never an abort)."""
    blobs = [
        _wat_record(
            "https://s.example/a",
            links=[{"path": "A@/href", "url": "https://t.example/x"}],
            title="Hello",
        ),
        _wat_record("https://s.example/b", payload='{"broken": '),
        _wat_record("https://dropme.example/c", uri=False),
    ]
    rows = {r["url"]: r for r in parse_wat_records(_raw(spark, blobs)).collect()}
    assert set(rows) == {"https://s.example/a", "https://s.example/b"}
    a = rows["https://s.example/a"]
    assert a["title"] == "Hello"
    assert [(lk["path"], lk["url"]) for lk in a["links"]] == [
        ("A@/href", "https://t.example/x")
    ]
    b = rows["https://s.example/b"]
    assert b["title"] is None and b["links"] is None


def test_wat_edges_anchor_and_host_contract(spark):
    """Anchors only; absolute http(s) targets only; userinfo/port
    stripped by THE shared host derivation; multiplicity counted."""
    links = [
        {"path": "A@/href", "url": "https://t.example/1"},
        {"path": "A@/href", "url": "http://t.example/2"},
        {"path": "A@/href", "url": "https://u:pw@t2.example:8443/q"},
        {"path": "A@/href", "url": "/relative"},
        {"path": "A@/href", "url": "mailto:x@m.example"},
        {"path": "IMG@/src", "url": "https://img.example/i.png"},
    ]
    wat = parse_wat_records(
        _raw(spark, [_wat_record("https://src.example/p", links=links)])
    )
    got = {
        (r["src"], r["dst"]): r["n_links"]
        for r in wat_host_edges(wat).collect()
    }
    assert got == {
        ("src.example", "t.example"): 2,
        ("src.example", "t2.example"): 1,
    }


def test_wat_spoofed_payload_cannot_override_header(spark):
    """The JSON envelope carries its own WARC-Target-URI — the record
    url must come from the WARC HEADER block, not the payload."""
    meta = {
        "Envelope": {
            "WARC-Header-Metadata": {
                "WARC-Target-URI": "https://evil.example/"
            },
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {"HTML-Metadata": {"Links": []}}
            },
        }
    }
    blob = _wat_record(
        "https://real.example/p", payload=json.dumps(meta)
    )
    rows = parse_wat_records(_raw(spark, [blob])).collect()
    assert [r["url"] for r in rows] == ["https://real.example/p"]


def test_c4_line_filter_rules(spark):
    """Each C4 rule on a hand doc: line kills (punctuation, <3 words,
    javascript) and doc kills (lorem ipsum, brace, <5 sentences)."""
    from eugl_spark.plans.queries import REGISTRY, ensure_c4_docs

    docs = [
        (0, "good one here.\ngood two here!\ngood three here?\n"
            'good four here"\ngood five here.\ngood six here.'),
        # ↑ KEEP: 6 kept lines; the quote-ended line is KEPT but adds
        # no [.!?] to the sentence count — 5 sentences exactly
        (1, "no ending punct\nOk.\nenable javascript now.\n"
            "fine line is here.\nalso a fine line."),      # 2 kept → <5
        (2, "Lorem Ipsum dolor sit amet.\n" + "w x y.\n" * 6),  # lorem
        (3, "code { brace }.\n" + "w x y.\n" * 6),         # brace
        (4, None),                                          # null text
        (5, ""),                                            # empty text
    ]
    import os
    import tempfile

    import pyarrow as pa
    import pyarrow.parquet as pq

    path = os.path.join(tempfile.mkdtemp(), "c4_hand.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "url": f"u{i}", "text": t} for i, t in docs],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("text", pa.string())]
            ),
        ),
        path,
    )
    # point the registered plan at the hand fixture by swapping the
    # read — the plan body is identical, so exercise it via a direct
    # rebuild over the hand frame
    ensure_c4_docs()  # plan import side-effect parity
    fn = REGISTRY["qf_c4_line_filter"].spark

    import eugl_spark.plans.queries as Q

    orig = Q.ensure_c4_docs
    Q.ensure_c4_docs = lambda: path
    try:
        rows = {r["doc_id"]: r for r in fn(spark, "").collect()}
    finally:
        Q.ensure_c4_docs = orig
    assert rows[0]["c4_reason"] == "KEEP" and rows[0]["n_kept"] == 6
    assert rows[0]["n_sentences"] == 5
    assert rows[1]["c4_reason"] == "too_few_sentences"
    assert rows[1]["n_kept"] == 2  # javascript + bare lines dropped
    assert rows[2]["c4_reason"] == "lorem_ipsum"
    assert rows[3]["c4_reason"] == "brace"
    for d in (4, 5):
        assert rows[d]["c4_reason"] == "too_few_sentences"
        assert rows[d]["n_kept"] == 0 and rows[d]["c4_text"] == ""


def test_wat_page_index_counts(spark):
    """n_anchors counts anchor links only; null links → 0."""
    from eugl_spark.plans.queries import REGISTRY

    rows = {
        r["url"]: r
        for r in REGISTRY["wat_page_index"].spark(spark, "").collect()
    }
    assert rows, "fixture produced no rows"
    assert all(r["n_anchors"] >= 0 for r in rows.values())
    # malformed-JSON rows exist in the fixture and carry 0 anchors
    assert any(
        r["title"] is None and r["n_anchors"] == 0 for r in rows.values()
    )


def test_wat_edges_match_sql_oracle(spark):
    """Spark WAT edge list == DuckDB JSON-extension oracle, value for
    value (the registry gate runs this too; kept here so a WAT change
    fails fast in this file)."""
    import duckdb

    from eugl_spark.plans.queries import REGISTRY

    got = sorted(
        map(tuple, REGISTRY["wat_outlinks"].spark(spark, "").collect())
    )
    want = sorted(
        map(tuple, duckdb.sql(REGISTRY["wat_outlinks"].sql).fetchall())
    )
    assert got == want
