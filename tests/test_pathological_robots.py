"""Pathological robots.txt sweep: the path-rule parse AND the per-url
verdict run over a hard corpus in BOTH engines and must agree (same
framework as the documents/events/embeddings/relational/links/BPE
sweeps). The two implementations share NO code — Spark is a lookahead
regex-group parse, DuckDB a line-window SQL reconstruction — so
agreement here pins the RFC 9309 contract itself on inputs a real
crawl's robots snapshot actually contains.

Hard families: bare-\r (old-Mac) line endings (fail OPEN in both —
neither the Spark opener's literal \\n nor the SQL's \\n line split
sees a second line), a UTF-8 BOM ahead of the first User-agent line
(fail OPEN both: the line-anchored opener rejects the BOM char; real
fetchers strip BOMs before this layer — documented), %-encoded and
unicode (incl. non-BMP emoji) path prefixes (NO percent/unicode
normalization, literal octet prefixes — and the longest-prefix winner
is length-unit-proof: a strict string prefix is strictly shorter in
UTF-16 code units AND codepoints alike), rules before any UA line,
no-space colons, tabs, huge many-group bodies, userinfo/port urls
keying to the bare rule host, case-sensitive path matching, and
query-only urls normalizing to '/'.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import eugl_spark.plans.queries as Q
from eugl_spark.functions.robots import (
    parse_robots_path_rules,
    path_verdict_frame,
)
from eugl_spark.plans.compare import compare_frames

PATHO_ROBOTS = [
    # bare-\r line endings: no \n anywhere -> fail OPEN in both
    ("cr.example", "User-agent: *\rDisallow: /\r"),
    # UTF-8 BOM before the first UA line -> fail OPEN in both
    ("bom.example", "﻿User-agent: *\nDisallow: /private/\n"),
    # BOM body but a SECOND clean group later: the later group opens
    ("bom2.example",
     "﻿User-agent: A\nDisallow: /za/\n"
     "User-agent: *\nDisallow: /b/\n"),
    # %-encoded prefix: literal octet matching, no normalization
    ("pct.example", "User-agent: *\nDisallow: /a%20b/\nAllow: /a%20b/c\n"),
    # unicode + non-BMP (emoji) prefixes: longest-prefix winner must
    # not depend on the engine's length unit
    ("uni.example",
     "User-agent: *\nDisallow: /café/\nAllow: /café/ok\n"
     "Disallow: /\U0001f600/\n"),
    # rule BEFORE any UA line is ownerless; the group that follows
    # owns only its own rules
    ("orphan.example", "Disallow: /orphan/\nUser-agent: *\nDisallow: /g/\n"),
    # no-space colons and tabs
    ("tight.example", "User-agent:*\nDisallow:/t1\nAllow:\t/t1/ok\n"),
    # mixed \r\n and \n in one body
    ("mixed.example", "User-agent: *\r\nDisallow: /m1/\nAllow: /m1/ok\r\n"),
    # case-sensitivity of PATHS (directives are case-insensitive)
    ("case.example", "DISALLOW: /X/\nUSER-AGENT: *\ndisallow: /lower/\n"),
    # huge body: 200 agent-specific groups before the wildcard one
    ("huge.example",
     "".join(f"User-agent: bot{i}\nDisallow: /b{i}/\n\n" for i in range(200))
     + "User-agent: *\nDisallow: /deep/\n"),
    # null body
    ("null.example", None),
    # prefix that is itself '%'-heavy and long
    ("long.example",
     "User-agent: *\nDisallow: /" + "p%2F" * 50 + "\n"),
]

PATHO_URLS = [
    "https://cr.example/anything",
    "https://bom.example/private/a",
    "https://bom2.example/b/x",
    "https://bom2.example/za/x",
    "https://pct.example/a%20b/z",
    "https://pct.example/a%20b/c2",
    "https://pct.example/a b/z",  # literal space: no match on %20
    "https://uni.example/café/z",
    "https://uni.example/café/ok2",
    "https://uni.example/\U0001f600/hi",
    "https://uni.example/cafe/z",
    "https://orphan.example/orphan/x",
    "https://orphan.example/g/x",
    "https://tight.example/t1x",
    "https://tight.example/t1/ok2",
    "https://mixed.example/m1/z",
    "https://mixed.example/m1/ok3",
    "https://case.example/lower/a",
    "https://case.example/LOWER/a",
    "https://case.example/X/a",
    "https://huge.example/deep/a",
    "https://huge.example/b7/a",
    "https://long.example/" + "p%2F" * 50 + "x",
    "https://long.example/" + "p%2F" * 49,
    "https://user:pw@case.example:8443/lower/a",  # userinfo/port keying
    "https://case.example?q=1",  # no path -> '/'
    "not a url",
]


@pytest.fixture(scope="module")
def patho_robots_paths(tmp_path_factory) -> tuple[str, str]:
    d = tmp_path_factory.mktemp("patho_robots")
    rp, up = str(d / "robots.parquet"), str(d / "urls.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"host": h, "body": b} for h, b in PATHO_ROBOTS],
            schema=pa.schema([("host", pa.string()), ("body", pa.string())]),
        ),
        rp,
    )
    pq.write_table(
        pa.Table.from_pylist(
            [{"url": u} for u in PATHO_URLS],
            schema=pa.schema([("url", pa.string())]),
        ),
        up,
    )
    return rp, up


def test_path_rules_parse_on_pathological_corpus(spark, patho_robots_paths):
    rp, _ = patho_robots_paths
    got = (
        parse_robots_path_rules(spark.read.parquet(rp))
        .orderBy("host", "prefix")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.sql(Q._robots_paths_sql(rp)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]
    assert len(got) > 0  # the sweep exercises real rules, not empties


def test_path_verdict_on_pathological_corpus(spark, patho_robots_paths):
    rp, up = patho_robots_paths
    got = (
        path_verdict_frame(
            spark.read.parquet(up), spark.read.parquet(rp)
        )
        .orderBy("url")
        .toPandas()
    )
    con = duckdb.connect()
    want = con.sql(Q._robots_verdict_sql(rp, up)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]
    verdicts = dict(zip(got["url"], got["allowed"]))
    # spot-pin the semantics, not just cross-engine agreement:
    assert verdicts["https://cr.example/anything"]  # bare-\r fails open
    assert verdicts["https://bom.example/private/a"]  # BOM fails open
    assert not verdicts["https://bom2.example/b/x"]  # later group opens
    assert verdicts["https://bom2.example/za/x"]  # other agent's rule
    assert not verdicts["https://pct.example/a%20b/z"]
    assert verdicts["https://pct.example/a%20b/c2"]  # allow override
    assert verdicts["https://pct.example/a b/z"]  # literal, no %-decode
    assert not verdicts["https://uni.example/café/z"]
    assert verdicts["https://uni.example/café/ok2"]
    assert not verdicts["https://uni.example/\U0001f600/hi"]
    assert verdicts["https://uni.example/cafe/z"]
    assert verdicts["https://orphan.example/orphan/x"]  # ownerless rule
    assert not verdicts["https://orphan.example/g/x"]
    assert not verdicts["https://tight.example/t1x"]  # prefix, not dir
    assert verdicts["https://tight.example/t1/ok2"]
    assert not verdicts["https://case.example/lower/a"]
    assert verdicts["https://case.example/LOWER/a"]  # paths case-sensitive
    assert verdicts["https://case.example/X/a"]  # rule before UA: ownerless
    assert not verdicts["https://huge.example/deep/a"]
    assert verdicts["https://huge.example/b7/a"]  # bot7's rule, not ours
    assert not verdicts["https://user:pw@case.example:8443/lower/a"]
    assert verdicts["https://case.example?q=1"]
    assert verdicts["not a url"]  # malformed: fail open


def test_fetch_schedule_on_pathological_corpus(spark, patho_robots_paths):
    """The politeness schedule runs the same hard robots corpus
    through both engines: delay extraction from the wildcard group
    survives BOM/CR/comment damage (failing open to the 1s default),
    and per-host ordering/offsets agree row for row."""
    from eugl_spark.functions.hosts import host_of
    from eugl_spark.functions.robots import robots_crawl_delays
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    rp, up = patho_robots_paths
    delays = robots_crawl_delays(spark.read.parquet(rp))
    urls = (
        spark.read.parquet(up)
        .select("url", host_of(F.col("url")).alias("host"))
        .filter(F.col("host").isNotNull())
    )
    w = W.partitionBy("host").orderBy("url")
    got = (
        urls.join(F.broadcast(delays), "host", "left")
        .select(
            "url", "host",
            F.coalesce("delay_sec", F.lit(1)).alias("delay_sec"),
            F.row_number().over(w).cast("long").alias("fetch_order"),
        )
        .withColumn(
            "fetch_offset_sec",
            ((F.col("fetch_order") - 1) * F.col("delay_sec")).cast("long"),
        )
        .toPandas()
    )
    con = duckdb.connect()
    want = con.sql(Q._fetch_schedule_sql(rp, up)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]
    assert len(got) > 0
