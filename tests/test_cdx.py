"""CDXJ capture-index family (sources/cdx.py): parse fault isolation,
atomic latest-capture selection, gaps-and-islands fetch planning."""

from __future__ import annotations

from pyspark.sql import functions as F

from eugl_spark.sources.cdx import fetch_plan, latest_captures, parse_cdxj


def _lines(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "line string")


def _j(**kw):
    import json

    return json.dumps(kw, separators=(",", ":"))


GOOD = _j(
    url="https://a.example/p",
    mime="text/html",
    status="200",
    digest="sha1:x",
    length="100",
    offset="0",
    filename="f1.warc.gz",
)


def test_parse_fault_isolation(spark):
    """Damaged lines drop row-by-row; good lines survive alongside."""
    rows = parse_cdxj(
        _lines(
            spark,
            [
                f"com,a)/p 20240301120000 {GOOD}",
                "com,short)/x",  # no 3-part shape
                f"com,a)/q 20249901120000 {GOOD}",  # month 99: bad ts
                "com,a)/r 20240301120000 " + GOOD[:-10],  # truncated JSON
                "com,a)/s 20240301120000 "
                + _j(mime="text/html", status="200"),  # missing mandatory
            ],
        )
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["surt"] == "com,a)/p" and r["status"] == 200
    assert r["offset"] == 0 and r["length"] == 100
    assert r["filename"] == "f1.warc.gz"


def test_latest_captures_atomic_winner(spark):
    """Newest 200 text/html capture wins as a WHOLE row; non-html and
    non-200 captures never win even when newer."""
    mk = lambda ts, off, fn, mime="text/html", status="200": (
        f"com,a)/p {ts} "
        + _j(
            url="https://a.example/p",
            mime=mime,
            status=status,
            digest=f"sha1:{off}",
            length="50",
            offset=str(off),
            filename=fn,
        )
    )
    sel = latest_captures(
        parse_cdxj(
            _lines(
                spark,
                [
                    mk("20240101000000", 10, "old.warc.gz"),
                    mk("20240301000000", 20, "new.warc.gz"),
                    mk("20240601000000", 30, "pdf.warc.gz", mime="application/pdf"),
                    mk("20240701000000", 40, "err.warc.gz", status="503"),
                ],
            )
        )
    ).collect()
    assert len(sel) == 1
    r = sel[0]
    assert (r["filename"], r["offset"], r["digest"]) == (
        "new.warc.gz",
        20,
        "sha1:20",
    )


def test_fetch_plan_islands(spark):
    """Records within the gap tolerance coalesce; a jump beyond it
    opens a new span; span_end is exclusive max(offset+length);
    record_bytes counts selected bytes only (over-read accounting)."""
    caps = spark.createDataFrame(
        [
            ("f1", 0, 100),
            ("f1", 150, 50),     # gap 50 ≤ 100 → same span
            ("f1", 1000, 10),    # gap 800 > 100 → new span
            ("f2", 5, 5),        # other file: own span
        ],
        "filename string, offset long, length long",
    )
    plan = {
        (r["filename"], r["span_start"]): r
        for r in fetch_plan(caps, gap=100).collect()
    }
    assert set(plan) == {("f1", 0), ("f1", 1000), ("f2", 5)}
    s = plan[("f1", 0)]
    assert s["span_end"] == 200 and s["n_records"] == 2
    assert s["record_bytes"] == 150  # 50 bytes of tolerated over-read
    assert plan[("f1", 1000)]["span_end"] == 1010
    assert plan[("f2", 5)]["n_records"] == 1


def test_fetch_plan_reuses_exchange(spark):
    """The groupBy key (filename) is a prefix of the window partition
    key — the plan must carry ONE shuffle of the captures, not two."""
    caps = spark.createDataFrame(
        [("f1", 0, 10), ("f1", 20, 10)],
        "filename string, offset long, length long",
    )
    plan = fetch_plan(caps)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_fetch_plan_overlapping_records(spark):
    """Overlapping ranges (defensive: revisit records pointing into
    the same bytes) stay one span — the running-max end, not lag(end),
    guards against a short record INSIDE a long one splitting it."""
    caps = spark.createDataFrame(
        [
            ("f1", 0, 1000),   # long record
            ("f1", 100, 10),   # nested inside it
            ("f1", 1100, 10),  # within gap of the LONG record's end
        ],
        "filename string, offset long, length long",
    )
    rows = fetch_plan(caps, gap=200).collect()
    assert len(rows) == 1
    assert rows[0]["span_end"] == 1110 and rows[0]["n_records"] == 3


def test_index_driven_ranged_read_end_to_end(spark, tmp_path):
    """The full index contract: archive + true-offset CDXJ index →
    latest-capture selection → coalesced fetch plan → ranged reads →
    parse. The parsed subset must be exactly the urls the selection
    chose, with each url's NEWEST capture body — and the ranged read
    must not touch bytes outside the plan's spans."""
    from eugl_spark.corpus import write_warc_archive_with_index
    from eugl_spark.sources.cdx import read_ranged_records
    from eugl_spark.sources.warc import parse_crawl_records

    arch, idx = write_warc_archive_with_index(str(tmp_path))
    cdx = parse_cdxj(spark.read.parquet(idx))
    sel = latest_captures(cdx)
    want = {
        (r["url"], r["filename"], r["offset"]) for r in sel.collect()
    }
    plan = fetch_plan(sel, gap=4096)
    # plan sanity: spans account for exactly the selected records
    n_sel = len(want)
    n_span_recs = plan.agg(F.sum("n_records")).collect()[0][0]
    assert n_span_recs == n_sel
    # dense shard + subset selection: the gap tolerance over-reads
    # bytes holding NON-selected records — the reader must slice by
    # manifest, yielding exactly the selected urls (superseded
    # revisits must NOT resurrect from the over-read)
    pages = parse_crawl_records(
        read_ranged_records(spark, sel, arch, gap=4096)
    ).collect()
    assert len(pages) == n_sel
    got_urls = sorted(r["url"] for r in pages)
    assert got_urls == sorted(u for u, _, _ in want)
    # every parsed body is the NEWEST capture: cross-check one url's
    # body against a direct slice at the selected offset
    probe = next(iter(want))
    sel_row = [r for r in sel.collect() if r["url"] == probe[0]][0]
    import os

    with open(os.path.join(arch, sel_row["filename"]), "rb") as fh:
        fh.seek(sel_row["offset"])
        rec = fh.read(sel_row["length"])
    # record = WARC block \r\n\r\n HTTP envelope \r\n\r\n entity; the
    # parse strips both, so html must equal the ENTITY bytes
    entity = rec.split(b"\r\n\r\n", 2)[2]
    page = [r for r in pages if r["url"] == probe[0]][0]
    assert bytes(page["html"]) == entity


def test_ranged_read_missing_shard_fault_isolated(spark, tmp_path):
    """A capture pointing at a missing shard yields no records and
    no abort; other spans still read."""
    from eugl_spark.corpus import write_warc_archive_with_index
    from eugl_spark.sources.cdx import read_ranged_records

    arch, idx = write_warc_archive_with_index(str(tmp_path))
    sel = latest_captures(parse_cdxj(spark.read.parquet(idx)))
    fake = spark.createDataFrame(
        [("https://gone.example/", None, "nope/gone.warc", 0, 1000,
          "sha1:gone")],
        "url string, ts timestamp, filename string, offset long, "
        "length long, digest string",
    )
    n_ok = read_ranged_records(spark, sel, arch).count()
    n_mixed = read_ranged_records(
        spark, sel.unionByName(fake.select(sel.columns)), arch
    ).count()
    assert n_mixed == n_ok > 0


def test_build_cdxj_index_round_trip(spark, tmp_path):
    """The indexer reproduces the archive's own index BYTE-IDENTICAL:
    same SURT keys, timestamps, envelope-derived status/mime, real
    sha1 entity digests, true offsets/lengths — so the cycle
    archive → build_cdxj_index → select → plan → ranged read is fully
    self-hosting."""
    from eugl_spark.corpus import write_warc_archive_with_index
    from eugl_spark.sources.cdx import build_cdxj_index

    arch, idx = write_warc_archive_with_index(str(tmp_path))
    built = sorted(
        r["line"] for r in build_cdxj_index(spark, arch).collect()
    )
    orig = sorted(r["line"] for r in spark.read.parquet(idx).collect())
    assert built == orig and len(built) == 240


def test_self_hosted_index_cycle(spark, tmp_path):
    """Full circle on the BUILT index (no generator index involved):
    index the archive, select newest captures, plan, ranged-read —
    the record bytes that come back re-split/parse to the same urls
    the selection chose."""
    from eugl_spark.corpus import write_warc_archive_with_index
    from eugl_spark.sources.cdx import (
        build_cdxj_index,
        read_ranged_records,
    )
    from eugl_spark.sources.warc import parse_crawl_records

    arch, _ = write_warc_archive_with_index(str(tmp_path))
    sel = latest_captures(parse_cdxj(build_cdxj_index(spark, arch)))
    want_urls = sorted(r["url"] for r in sel.select("url").collect())
    pages = parse_crawl_records(
        read_ranged_records(spark, sel, arch)
    ).collect()
    assert sorted(r["url"] for r in pages) == want_urls
    assert all(r["http_status"] == 200 for r in pages)
