"""URL canonicalization: the crawl-side dedup key (S3 extension)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eugl_spark.functions.urls import canonical_url, dedup_by_canonical_url

CASES = [
    # (raw, canonical)
    ("HTTPS://WWW.Example.COM/Path/Page", "https://example.com/Path/Page"),
    ("https://example.com/a/#section-2", "https://example.com/a"),
    (
        "https://example.com/a?utm_source=x&utm_medium=y&id=7",
        "https://example.com/a?id=7",
    ),
    ("https://example.com/a?gclid=abc123", "https://example.com/a"),
    ("https://example.com/a?id=7&fbclid=zz&q=1", "https://example.com/a?id=7&q=1"),
    ("https://example.com/a/b///", "https://example.com/a/b"),
    ("https://example.com/", "https://example.com/"),  # root slash kept
    ("https://example.com/a?", "https://example.com/a"),
    # a trailing slash INSIDE a query value is part of the value —
    # stripping it would merge genuinely different urls
    ("https://example.com/search?q=a/", "https://example.com/search?q=a/"),
    ("https://example.com/p?path=/x/y/", "https://example.com/p?path=/x/y/"),
    # path/query case is significant — only scheme+host folds
    ("http://EXAMPLE.com/CaseSensitive?Q=V", "http://example.com/CaseSensitive?Q=V"),
    # --- param-boundary anchoring (round-3 ADVICE regression cases) ---
    # href= is NOT utm/ref: must survive untouched
    ("https://example.com/a?href=x", "https://example.com/a?href=x"),
    # xutm_source is a different param, not utm_source: survives
    ("https://example.com/a?xutm_source=1&id=2", "https://example.com/a?xutm_source=1&id=2"),
    # Amazon-style /ref=... PATH segment: never query-param stripped
    ("https://example.com/dp/B0/ref=sr_1_1", "https://example.com/dp/B0/ref=sr_1_1"),
    # bare ref is a meaningful param (GitHub branches): kept
    ("https://github.example/o/r/blob/f?ref=main", "https://github.example/o/r/blob/f?ref=main"),
    # consecutive tracking params collapse cleanly
    (
        "https://example.com/a?a=1&utm_x=1&utm_y=2&b=2",
        "https://example.com/a?a=1&b=2",
    ),
    # tracking param mid-query followed by a real one
    ("https://example.com/a?utm_source=x&utm_medium=y", "https://example.com/a"),
]


@pytest.mark.parametrize("raw,want", CASES)
def test_canonical_url_cases(spark, raw, want):
    got = (
        spark.createDataFrame([(raw,)], ["url"])
        .select(canonical_url(F.col("url")).alias("c"))
        .collect()[0]["c"]
    )
    assert got == want, (raw, got, want)


def test_canonical_url_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    once = df.select(canonical_url(F.col("url")).alias("c"))
    twice = once.select(canonical_url(F.col("c")).alias("c2"))
    assert [r["c"] for r in once.collect()] == [
        r["c2"] for r in twice.collect()
    ]


def test_dedup_by_canonical_url(spark):
    urls = [
        "https://www.site.example/p/1?utm_source=mail",
        "https://site.example/p/1",
        "HTTPS://SITE.example/p/1#frag",
        "https://site.example/p/2",
    ]
    out = dedup_by_canonical_url(
        spark.createDataFrame([(u,) for u in urls], ["url"])
    ).collect()
    by_canon = {r["canonical_url"]: r for r in out}
    assert by_canon["https://site.example/p/1"]["n_variants"] == 3
    assert by_canon["https://site.example/p/2"]["n_variants"] == 1
    # keeper is deterministic (lexicographic min of raw variants)
    assert (
        by_canon["https://site.example/p/1"]["keeper_url"]
        == "HTTPS://SITE.example/p/1#frag"
    )
