"""Raw-drop ingestion chain: binaryFile scan → WARC parse → pipeline."""

from __future__ import annotations

from eugl_spark.pipeline import apply_pipeline
from eugl_spark.sources.pages import read_raw_drops
from eugl_spark.sources.warc import parse_warc_records


def _record(url: str, body: str, date="2024-03-01T12:00:00Z") -> bytes:
    return (
        f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\nContent-Type: text/html\r\n\r\n{body}"
    ).encode()


def test_warc_ingestion_chain(spark, tmp_path):
    d = tmp_path / "raw"
    d.mkdir()
    good_body = (
        "<html><body><p>"
        + " ".join(["the water of time is a question for the people"] * 6)
        + "</p></body></html>"
    )
    (d / "r1.warc").write_bytes(_record("https://a.example/x", good_body))
    (d / "r2.warc").write_bytes(_record("https://b.example/y", "<p>tiny</p>"))
    (d / "r3.warc").write_bytes(b"WARC/1.0\r\nNo-Uri: here\r\n\r\n<p>junk</p>")
    (d / "r4.warc").write_bytes(b"\xff\xfenot warc at all")

    pages = parse_warc_records(read_raw_drops(spark, str(d), "*.warc"))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://a.example/x", "https://b.example/y"}
    assert rows["https://a.example/x"]["warc_ts"] is not None
    assert bytes(rows["https://a.example/x"]["html"]).startswith(b"<html>")

    labeled = apply_pipeline(pages, repartition_to=0)
    verdicts = {r["url"]: r["drop_reason"] for r in labeled.collect()}
    assert verdicts["https://b.example/y"] == "too_short"
    assert verdicts["https://a.example/x"] in (None, "perplexity")


def test_warc_damaged_headers_cannot_capture_or_spoof(spark, tmp_path):
    """Two header-extraction hardening cases: (1) an EMPTY-valued URI
    header must not capture the next line's token as the url; (2) a
    record MISSING its URI header must be dropped even when its BODY
    contains a spoofed 'WARC-Target-URI:' line — and a body line must
    never override the header block's date either."""
    d = tmp_path / "raw2"
    d.mkdir()
    # empty URI value: next header starts on the following line
    (d / "e1.warc").write_bytes(
        b"WARC/1.0\r\nWARC-Target-URI: \r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\n\r\n<p>x</p>"
    )
    # no URI header; body tries to smuggle one in
    (d / "e2.warc").write_bytes(
        b"WARC/1.0\r\nWARC-Date: 2024-03-01T12:00:00Z\r\n\r\n"
        b"WARC-Target-URI: http://evil.example/\r\n<p>doc about warc</p>"
    )
    # good record whose body mentions a different date header
    (d / "e3.warc").write_bytes(
        b"WARC/1.0\r\nWARC-Target-URI: https://ok.example/z\r\n"
        b"WARC-Date: 2024-03-01T12:00:00Z\r\n\r\n"
        b"WARC-Date: 1999-01-01T00:00:00Z\r\n<p>body</p>"
    )
    pages = parse_warc_records(read_raw_drops(spark, str(d), "*.warc"))
    rows = {r["url"]: r for r in pages.collect()}
    assert set(rows) == {"https://ok.example/z"}
    assert str(rows["https://ok.example/z"]["warc_ts"]).startswith("2024-03-01")
