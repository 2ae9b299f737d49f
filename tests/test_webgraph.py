"""Web-graph family: outlink extraction contract, PageRank semantics
on hand graphs, keep-newest-snapshot dedup. Registry parity vs DuckDB
is covered by tests/test_entry.py; these pin the library surfaces on
inputs with known answers."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from eugl_spark.operators.graph import pagerank
from eugl_spark.plans.queries import link_host_edges


def _pages(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary")


def test_extraction_contract(spark):
    """Double-quoted absolute http(s) hrefs only; relative, single-
    quoted and non-http targets are ignored; null html contributes
    nothing."""
    html = (
        b'<a href="https://www.a.example/p/1">x</a>'
        b'<a href="https://www.a.example/p/2">y</a>'
        b'<a href="http://www.b.example/p/3">z</a>'
        b"<a href='https://www.c.example/p/4'>sq</a>"
        b'<a href="/p/5">rel</a>'
        b'<a href="mailto:u@x.example">m</a>'
    )
    rows = [
        ("https://www.src.example/p/0", html),
        ("https://www.src.example/p/9", None),
    ]
    edges = link_host_edges(_pages(spark, rows)).collect()
    got = {(r["src"], r["dst"]): r["n_links"] for r in edges}
    assert got == {
        ("www.src.example", "www.a.example"): 2,
        ("www.src.example", "www.b.example"): 1,
    }


def test_extraction_counts_every_snapshot(spark):
    """A revisited url contributes its links once per snapshot
    (crawl-frequency edge weighting)."""
    html = b'<a href="https://www.t.example/p/1">x</a>'
    rows = [("https://www.s.example/p/0", html)] * 3
    edges = link_host_edges(_pages(spark, rows)).collect()
    assert len(edges) == 1 and edges[0]["n_links"] == 3


def _edges(spark, triples):
    return spark.createDataFrame(triples, "src string, dst string, w double")


def test_pagerank_mass_conserved(spark):
    """With dangling redistribution, Σrank stays 1 (± iteration
    rounding) — including when a sink node holds mass."""
    pr = pagerank(_edges(spark, [("a", "b", 1.0), ("b", "c", 1.0)]), iters=3)
    total = pr.agg(F.sum("rank")).collect()[0][0]
    assert total == pytest.approx(1.0, abs=1e-8)


def test_pagerank_authority_ordering(spark):
    """The host every other host links to outranks the rest."""
    e = [("a", "hub", 1.0), ("b", "hub", 1.0), ("c", "hub", 1.0),
         ("hub", "a", 1.0)]
    ranks = {r["host"]: r["rank"] for r in pagerank(_edges(spark, e), iters=3).collect()}
    assert ranks["hub"] == max(ranks.values())
    assert ranks["hub"] > ranks["b"]
    # b and c are symmetric → identical ranks
    assert ranks["b"] == ranks["c"]


def test_pagerank_uniform_cycle(spark):
    """A symmetric cycle is the fixpoint: every node keeps rank 1/N
    exactly, so iteration count must not change the answer."""
    e = [("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0)]
    for iters in (1, 5):
        ranks = [r["rank"] for r in pagerank(_edges(spark, e), iters=iters).collect()]
        assert ranks == pytest.approx([1 / 3] * 3)


def test_pagerank_empty_edges(spark):
    pr = pagerank(_edges(spark, []), iters=3)
    assert pr.count() == 0


def test_url_latest_picks_newest_row(spark):
    """max_by returns the winning ROW's attribute, not a column max —
    the newest snapshot's html length even when an older snapshot's
    html is longer."""
    t = datetime.datetime(2024, 3, 1)
    rows = [
        ("u1", t, b"LONG-OLD-HTML-BODY"),
        ("u1", t + datetime.timedelta(days=1), b"new"),
        ("u2", t, b"only"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    )
    out = {
        r["url"]: r
        for r in df.groupBy("url")
        .agg(
            F.max("warc_ts").alias("last_ts"),
            F.count("*").alias("n_snapshots"),
            F.max_by(
                F.length(F.col("html").cast("string")), "warc_ts"
            ).alias("last_html_len"),
        )
        .collect()
    }
    assert out["u1"]["n_snapshots"] == 2
    assert out["u1"]["last_html_len"] == 3  # the NEW row's length
    assert out["u2"]["last_html_len"] == 4


def test_link_fixture_has_revisits_and_negatives():
    """The committed fixture actually exercises the contract: revisited
    urls exist, and so do each class of ignored href."""
    from eugl_spark.corpus import generate_link_pages

    df = generate_link_pages(600, seed=7)
    assert df.url.duplicated().any()
    allhtml = b"\n".join(df.html)
    assert b"<a href='" in allhtml  # single-quoted negative
    assert b'<a href="/p/' in allhtml  # relative negative
    assert b'<a href="mailto:' in allhtml  # non-http negative
    # timestamps strictly increasing → distinct per url, no tiebreak
    assert df.warc_ts.is_monotonic_increasing
    assert not df.warc_ts.duplicated().any()
