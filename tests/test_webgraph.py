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


def test_hits_l1_normalized_and_ordering(spark):
    """Hub and authority vectors each sum to 1 (L1 contract); the
    host everyone links to is the top authority, the page linking to
    everything is the top hub."""
    from eugl_spark.operators.graph import hits

    e = [("huba", "x", 1.0), ("huba", "y", 1.0), ("huba", "z", 1.0),
         ("b", "x", 1.0), ("c", "x", 1.0)]
    out = hits(_edges(spark, e), iters=3).collect()
    hub = {r["host"]: r["hub"] for r in out}
    auth = {r["host"]: r["authority"] for r in out}
    assert sum(hub.values()) == pytest.approx(1.0, abs=1e-6)
    assert sum(auth.values()) == pytest.approx(1.0, abs=1e-6)
    assert max(auth, key=auth.get) == "x"
    assert max(hub, key=hub.get) == "huba"
    # pure targets have no outlinks -> hub 0; pure sources -> auth 0
    assert hub["y"] == 0.0 and auth["huba"] == 0.0
    # symmetric hubs b and c tie exactly
    assert hub["b"] == hub["c"]


def test_hits_empty_edges(spark):
    from eugl_spark.operators.graph import hits

    assert hits(_edges(spark, []), iters=2).count() == 0


def test_anchor_text_mode_tiebreak(spark):
    """Per-host totals and modal anchor text, ties broken by the
    lexicographically smaller text."""
    html = (
        b'<a href="https://t.example/1">beta</a>'
        b'<a href="https://t.example/2">alpha</a>'
        b'<a href="https://t.example/3">alpha</a>'
        b'<a href="https://t.example/4">beta</a>'
        b'<a href="https://u.example/1">only</a>'
    )
    pages = spark.createDataFrame(
        [("https://s.example/p/0", html)], "url string, html binary"
    )
    from eugl_spark.plans.queries import crawl_anchor_text

    # drive the registry body on a hand frame via monkeypatched reader
    import eugl_spark.plans.queries as Q

    orig = Q._link_pages
    Q._link_pages = lambda s: pages
    try:
        out = {r["dst_host"]: r for r in crawl_anchor_text(spark, "").collect()}
    finally:
        Q._link_pages = orig
    assert out["t.example"]["n_anchors"] == 4
    assert out["t.example"]["n_texts"] == 2
    assert out["t.example"]["top_text"] == "alpha"  # 2-2 tie -> lexical
    assert out["u.example"]["top_text"] == "only"


def test_link_fixture_has_frontier_hosts():
    """External hosts appear as link targets but never as page urls —
    the committed fixture exercises the frontier anti-join and gives
    PageRank real dangling nodes."""
    from eugl_spark.corpus import generate_link_pages

    df = generate_link_pages(600, seed=7)
    allhtml = b"\n".join(df.html)
    assert b'href="https://ext' in allhtml
    assert not df.url.str.contains("//ext").any()


def test_span_coverage_hand_docs(spark):
    """A doc sharing an 8-gram with another doc gets covered
    positions; a unique doc gets zero; intra-doc repetition counts."""
    from eugl_spark.plans.queries import span_coverage_from

    eight = "a b c d e f g h"
    docs = spark.createDataFrame(
        [
            (1, f"{eight} unique tail one"),
            (2, f"prefix {eight} other words"),
            (3, "totally different text with no repeats at all here"),
            (4, f"{eight} {eight}"),  # intra-doc duplication
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_coverage_from(docs).collect()}
    # doc 1: tokens 1-8 covered of 11
    assert out[1]["covered_tokens"] == 8 and out[1]["n_tokens"] == 11
    assert out[1]["dup_fraction"] == pytest.approx(8 / 11, abs=1e-6)
    assert out[3]["n_dup_grams"] == 0 and out[3]["dup_fraction"] == 0.0
    # doc 4: every position is inside some duplicated 8-gram
    assert out[4]["covered_tokens"] == out[4]["n_tokens"] == 16
    assert out[4]["dup_fraction"] == 1.0


def test_hits_zero_iterations_uniform(spark):
    """iters=0 returns the uniform initial state for both vectors
    (pagerank's iters=0 contract), not a crash."""
    from eugl_spark.operators.graph import hits

    out = hits(_edges(spark, [("a", "b", 1.0), ("b", "c", 1.0)]), iters=0)
    rows = out.collect()
    assert len(rows) == 3
    assert all(r["hub"] == r["authority"] == pytest.approx(1 / 3) for r in rows)


def test_streaming_edges_equal_batch(spark, tmp_path):
    """Incremental crawl ingestion: the edge list aggregated over an
    AvailableNow stream (complete-mode stateful groupBy across
    micro-batches) equals the batch link_host_edges over the same
    files — the streaming twin of the ingestion step, carrying the
    batch side's DuckDB-oracle evidence across."""
    from eugl_spark.corpus import write_link_pages_parquet
    from eugl_spark.plans.queries import link_host_edges
    from eugl_spark.streaming.stream import PAGES_SCHEMA

    drop = tmp_path / "linkdrops"
    drop.mkdir()
    # several files so the file source actually micro-batches
    write_link_pages_parquet(str(drop / "d0.parquet"), n_rows=150, seed=21)
    write_link_pages_parquet(str(drop / "d1.parquet"), n_rows=150, seed=22)
    write_link_pages_parquet(str(drop / "d2.parquet"), n_rows=100, seed=23)

    src = spark.readStream.schema(PAGES_SCHEMA).parquet(str(drop))
    q = (
        link_host_edges(src)
        .writeStream.format("memory")
        .queryName("edges_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["src"], r["dst"]): r["n_links"]
        for r in spark.sql("SELECT * FROM edges_stream").collect()
    }
    want = {
        (r["src"], r["dst"]): r["n_links"]
        for r in link_host_edges(spark.read.parquet(str(drop))).collect()
    }
    assert got == want and len(want) > 50


def test_auto_round_dp_scales_with_graph_size():
    """ADVICE r4: a fixed per-superstep dp=10 quantizes 1e8-host
    graphs (rank0=1e-8) to ~2 significant digits. The default now
    scales with N while the ≤100-node oracle fixtures keep dp=10."""
    from eugl_spark.operators.graph import _auto_round_dp

    assert _auto_round_dp(2) == 10
    assert _auto_round_dp(60) == 10  # the oracle fixture
    assert _auto_round_dp(100) == 10
    assert _auto_round_dp(101) == 11
    assert _auto_round_dp(2000) == 12
    assert _auto_round_dp(10**8) == 16  # ~8 sig digits below 1e-8


def test_fused_host_regex_equals_two_pass(spark):
    """The fused single-pass host capture (_LINK_HOST_DIRECT_RE) must
    agree with the readable two-pass chain (href-extract → host-extract
    → drop empties) that the SQL twins still embed — on adversarial
    html: userinfo, ports, later-@ bleed bait, unterminated hrefs,
    uppercase schemes/tags, empty hosts, unicode, nested quotes."""
    import random

    from eugl_spark.plans.queries import (
        _LINK_HOST_DIRECT_RE,
        _LINK_HOST_RE,
        _LINK_HREF_RE,
        link_target_hosts,
    )

    pieces = [
        '<a href="https://plain.example/p">x</a>',
        '<a href="http://user:pw@auth.example:8080/q?a=1#f">y</a>',
        '<a href="https://a@b@last-at.example/">z</a>',
        '<a href="HTTPS://UPPER.example/P">u</a>',
        '<A HREF="https://upper-tag.example/">nope-tag-case</A>',
        "<a href='https://single.example/'>sq</a>",
        '<a href="/relative/only">rel</a>',
        '<a href="mailto:someone@mail.example">m</a>',
        '<a href="https://">empty-host</a>',
        '<a href="https:///leading-slash">eh</a>',
        '<a href="ftp://files.example/">ftp</a>',
        '<a href="https://trailing.example"',  # no closing > but quoted
        'text with stray@at and "quotes" and https://bare.example/',
        '<a href="https://unicode-日本.example/ページ">uni</a>',
        '<a href="https://x.example/a b">space-in-path</a>',
        '<a href="https://no-close.example',  # unterminated at EOF-ish
        'mail me at someone@later.example please',
    ]
    rng = random.Random(42)
    docs = []
    for i in range(60):
        k = rng.randrange(0, 8)
        docs.append((i, "".join(rng.choice(pieces) for _ in range(k))))
    # every piece alone, too (incl. the unterminated ones last)
    docs += [(100 + j, p) for j, p in enumerate(pieces)]
    df = spark.createDataFrame(docs, "id long, page string")
    two_pass = F.filter(
        F.transform(
            F.regexp_extract_all(
                F.col("page"), F.lit(_LINK_HREF_RE), F.lit(1)
            ),
            lambda t: F.regexp_extract(t, _LINK_HOST_RE, 1),
        ),
        lambda h: h != "",
    )
    rows = df.select(
        "id",
        link_target_hosts(F.col("page")).alias("fused"),
        two_pass.alias("classic"),
    ).collect()
    assert rows, "fuzz frame must not be empty"
    for r in rows:
        assert r["fused"] == r["classic"], (r["id"], r["fused"], r["classic"])


def test_snapshot_delta_statuses(spark):
    """All four delta classes on a hand corpus: gone (old only),
    added (new only), unchanged (identical payload both sides),
    changed (payload differs); null-ts snapshots are excluded, and a
    revisit storm inside one side resolves via the atomic winner."""
    from eugl_spark.plans.queries import snapshot_delta_from

    OLD, NEW = datetime.datetime(2024, 3, 1), datetime.datetime(2024, 3, 3)
    rows = [
        ("https://h.example/gone", OLD, b"<p>old</p>", None, "en"),
        ("https://h.example/added", NEW, b"<p>new</p>", None, "en"),
        ("https://h.example/same", OLD, b"<p>stable</p>", None, "en"),
        ("https://h.example/same", NEW, b"<p>stable</p>", None, "en"),
        ("https://h.example/diff", OLD, b"<p>v1</p>", None, "en"),
        ("https://h.example/diff", NEW, b"<p>v2</p>", None, "en"),
        # old-side revisit storm: the NEWEST old snapshot ('v1') is the
        # comparison basis, so the url is 'unchanged' vs the new side
        ("https://h.example/storm", datetime.datetime(2024, 3, 1, 1),
         b"<p>earlier</p>", None, "en"),
        ("https://h.example/storm", datetime.datetime(2024, 3, 1, 2),
         b"<p>v1</p>", None, "en"),
        ("https://h.example/storm", NEW, b"<p>v1</p>", None, "en"),
        # null-ts: excluded from both sides → url absent entirely
        ("https://h.example/nullts", None, b"<p>x</p>", None, "en"),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string",
    )
    got = {r["url"].rsplit("/", 1)[1]: r["status"]
           for r in snapshot_delta_from(df).collect()}
    assert got == {
        "gone": "gone",
        "added": "added",
        "same": "unchanged",
        "diff": "changed",
        "storm": "unchanged",
    }


def test_sitemap_directive_extraction(spark):
    """Group-independent Sitemap lines extract regardless of casing,
    indentation, CR endings and position; relative values drop."""
    from eugl_spark.plans.queries import REGISTRY

    got = {
        (r["host"], r["sitemap_url"])
        for r in REGISTRY["crawl_sitemaps"].spark(spark, "").collect()
    }
    assert got, "sitemap extraction found nothing"
    urls = {u for _, u in got}
    assert "https://r.example/sitemap.xml" in urls          # above groups
    assert "https://r.example/s/pages.xml.gz" in urls       # tail, 2-of-2
    assert "http://r.example/alt-map.xml" in urls           # indented+CR
    assert "/rel.xml" not in urls                           # relative


def test_host_gate_semantics(spark):
    """Spam hosts (≥5 docs, keep-rate <0.35) flip their per-doc KEEPs
    to host_gated; non-KEEP reasons are untouched; healthy hosts pass
    through; the gate is auditable (spam_host column)."""
    from eugl_spark.plans.queries import REGISTRY

    rows = REGISTRY["crawl_host_gate"].spark(spark, "").collect()
    assert rows
    by_host = {}
    for r in rows:
        by_host.setdefault(r["host"], []).append(r)
    gated = [r for r in rows if r["reason"] == "host_gated"]
    assert gated, "fixture produced no gated docs (vacuous gate)"
    for r in gated:
        assert r["spam_host"]
        peers = by_host[r["host"]]
        assert len(peers) >= 5
        kr = sum(
            1 for p in peers if p["reason"] in ("KEEP", "host_gated")
        ) / len(peers)
        assert kr < 0.35
    # a spam host's non-KEEP reasons stay what the chain said
    assert all(
        r["reason"] != "KEEP" or not r["spam_host"] for r in rows
    )


def test_seq_len_hist_shape(spark):
    """Buckets are ceil(log2(tokens)); cumulative share is monotone
    and ends at exactly 1.0."""
    from eugl_spark.plans.queries import REGISTRY

    rows = sorted(
        REGISTRY["corpus_seq_len_hist"].spark(
            spark, "/root/testdata/sf0.001"
        ).collect(),
        key=lambda r: r["log2_bucket"],
    )
    assert rows and rows[-1]["cum_token_share"] == 1.0
    shares = [r["cum_token_share"] for r in rows]
    assert shares == sorted(shares)
    total = sum(r["n_tokens"] for r in rows)
    assert all(0 < r["n_docs"] and 0 < r["n_tokens"] <= total for r in rows)
