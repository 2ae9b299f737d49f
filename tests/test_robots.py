"""robots.txt → host-rules parsing contract, and its integration with
apply_pipeline's host policy (deny and deterministic sampling)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eugl_spark.functions.robots import (
    parse_robots_path_rules,
    parse_robots_rules,
    path_denied,
    path_rules_dim,
)
from eugl_spark.pipeline import apply_pipeline


def _rules(spark, rows) -> dict:
    df = spark.createDataFrame(rows, "host string, body string")
    return {r["host"]: r["action"] for r in parse_robots_rules(df).collect()}


def test_deny_all_and_negatives(spark):
    rows = [
        ("deny.example", "User-agent: *\nDisallow: /\n"),
        # path-scoped disallow is NOT a host deny
        ("path.example", "User-agent: *\nDisallow: /private/\n"),
        # wildcard group absent: agent-specific rules are not ours
        ("other.example", "User-agent: OtherBot\nDisallow: /\n"),
        # empty / null bodies -> no rule (fail open)
        ("empty.example", ""),
        ("null.example", None),
        # allow-everything group
        ("allow.example", "User-agent: *\nDisallow:\n"),
    ]
    got = _rules(spark, rows)
    assert got == {"deny.example": "deny"}


def test_case_and_whitespace_and_crlf(spark):
    rows = [
        ("a.example", "USER-AGENT: * \r\nDISALLOW: / \r\n"),
        ("b.example", "user-agent:\t*\ndisallow: /\n"),
    ]
    got = _rules(spark, rows)
    assert got == {"a.example": "deny", "b.example": "deny"}


def test_group_boundary_stops_at_next_agent(spark):
    """A Disallow: / belonging to a LATER agent-specific group must
    not leak into the wildcard group."""
    body = (
        "User-agent: *\nDisallow: /tmp/\n\n"
        "User-agent: BadBot\nDisallow: /\n"
    )
    assert _rules(spark, [("x.example", body)]) == {}


def test_crawl_delay_maps_to_sampling(spark):
    rows = [
        ("slow.example", "User-agent: *\nCrawl-delay: 30\n"),
        ("fast.example", "User-agent: *\nCrawl-delay: 2\n"),
        # deny wins over delay
        ("both.example", "User-agent: *\nCrawl-delay: 30\nDisallow: /\n"),
        # absurd delay value must not ANSI-abort (try_cast)
        ("huge.example", "User-agent: *\nCrawl-delay: 99999999999999\n"),
    ]
    got = _rules(spark, rows)
    assert got["slow.example"] == "sample:10"
    assert "fast.example" not in got
    assert got["both.example"] == "deny"
    assert "huge.example" not in got  # overflow -> null -> no rule


def test_strictest_policy_wins_across_snapshots(spark):
    rows = [
        ("s.example", "User-agent: *\nCrawl-delay: 30\n"),
        ("s.example", "User-agent: *\nDisallow: /\n"),
    ]
    assert _rules(spark, rows) == {"s.example": "deny"}


def test_robots_rules_drive_pipeline(spark):
    """End-to-end: parsed rules deny/sample pages through
    apply_pipeline exactly like hand-written host rules."""
    import numpy as np

    from eugl_spark.corpus import _chain

    rng = np.random.RandomState(3)
    pages = spark.createDataFrame(
        [
            (
                f"https://{h}/p/{i}",
                None,
                # generator-chain text: passes the full rule set, so
                # the only drops below are the host policy's
                " ".join(_chain("en", 60, rng)),
                "en",
            )
            for h in ("denied.example", "open.example")
            for i in range(4)
        ],
        "url string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.current_timestamp())
    robots = spark.createDataFrame(
        [("denied.example", "User-agent: *\nDisallow: /\n")],
        "host string, body string",
    )
    out = apply_pipeline(
        pages, host_rules=parse_robots_rules(robots), repartition_to=0
    )
    by_host = {
        r["h"]: (r["kept"], set(r["reasons"]))
        for r in out.groupBy(
            F.regexp_extract("url", r"^https?://([^/]+)/", 1).alias("h")
        )
        .agg(
            F.sum(F.col("keep").cast("long")).alias("kept"),
            F.collect_set("drop_reason").alias("reasons"),
        )
        .collect()
    }
    assert by_host["denied.example"][0] == 0
    assert by_host["denied.example"][1] == {"host_deny"}
    assert by_host["open.example"][0] == 4


def test_parse_is_jvm_side(spark):
    """No Python boundary in the rules plan (whole-stage regex)."""
    df = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /\n")],
        "host string, body string",
    )
    p = (
        parse_robots_rules(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in p


def test_comment_tails_do_not_make_or_break_groups(spark):
    """'user-agent:' inside a comment must neither START a phantom
    wildcard group nor TERMINATE a real one (review repro)."""
    rows = [
        # comment mentions 'user-agent: *' but rules belong to Googlebot
        ("phantom.example",
         "User-agent: Googlebot\n"
         "# the following applies to user-agent: *\n"
         "Disallow: /\n"),
        # real wildcard group with a mid-group comment naming user-agent:
        ("truncated.example",
         "User-agent: *\n"
         "# note to user-agent: folks\n"
         "Disallow: /\n"),
    ]
    got = _rules(spark, rows)
    assert "phantom.example" not in got
    assert got.get("truncated.example") == "deny"


def test_indented_and_commented_rule_lines(spark):
    """REP-legal leading whitespace and trailing same-line comments on
    rule lines must still register (review repro: indented rules were
    silently failing open)."""
    rows = [
        ("indent.example", "User-agent: *\n  Disallow: /\n"),
        ("tailcomment.example", "User-agent: *\nDisallow: / # staging\n"),
        ("delayindent.example", "User-agent: *\n\tCrawl-delay: 30\n"),
        ("uacomment.example", "User-agent: * # all bots\nDisallow: /\n"),
    ]
    got = _rules(spark, rows)
    assert got["indent.example"] == "deny"
    assert got["tailcomment.example"] == "deny"
    assert got["delayindent.example"] == "sample:10"
    assert got["uacomment.example"] == "deny"


def _path_rules(spark, rows) -> dict:
    df = spark.createDataFrame(rows, "host string, body string")
    return {
        (r["host"], r["prefix"]): r["allow"]
        for r in parse_robots_path_rules(df).collect()
    }


def test_path_rules_parse_contract(spark):
    rows = [
        # plain disallow + allow override candidate
        (
            "a.example",
            "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n",
        ),
        # empty Disallow (allow-all) emits NOTHING; site-wide deny
        # emits the '/' rule (host-level deny is parse_robots_rules's
        # job, but the path dim must agree on '/')
        ("b.example", "User-agent: *\nDisallow:\nDisallow: /\n"),
        # trailing '*' is prefix-equivalent → stripped; mid-pattern
        # wildcards / '$' anchors are skipped (fail OPEN)
        (
            "c.example",
            "User-agent: *\nDisallow: /tmp*\nDisallow: /a/*/b\n"
            "Disallow: /x$\nAllow: /ok/\n",
        ),
        # rules in an agent-specific group are not ours
        ("d.example", "User-agent: OtherBot\nDisallow: /private/\n"),
        # duplicate prefix: allow wins (RFC tie rule)
        (
            "e.example",
            "User-agent: *\nDisallow: /p/\nAllow: /p/\n",
        ),
        # 'Disallow: /*' normalizes to '/'
        ("f.example", "User-agent: *\nDisallow: /*\n"),
        ("null.example", None),
    ]
    got = _path_rules(spark, rows)
    assert got == {
        ("a.example", "/private/"): False,
        ("a.example", "/private/pub/"): True,
        ("b.example", "/"): False,
        ("c.example", "/tmp"): False,
        ("c.example", "/ok/"): True,
        ("e.example", "/p/"): True,
        ("f.example", "/"): False,
    }


def test_path_rules_parse_is_jvm_side(spark):
    df = spark.createDataFrame(
        [("h.example", "User-agent: *\nDisallow: /p/\n")],
        "host string, body string",
    )
    p = (
        parse_robots_path_rules(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in p


def test_path_denied_longest_prefix_wins(spark):
    """Nested allow/disallow: the MOST SPECIFIC matching prefix
    decides (RFC 9309 §2.2.2), not rule order."""
    robots = spark.createDataFrame(
        [
            (
                "h.example",
                "User-agent: *\n"
                "Disallow: /private/\n"
                "Allow: /private/pub/\n"
                "Disallow: /private/pub/secret/\n",
            )
        ],
        "host string, body string",
    )
    dim = path_rules_dim(parse_robots_path_rules(robots))
    urls = spark.createDataFrame(
        [
            ("https://h.example/private/a", True),
            ("https://h.example/private/pub/x", False),
            ("https://h.example/private/pub/secret/y", True),
            ("https://h.example/open/z", False),
            ("https://h.example", False),  # no path ≡ '/': unmatched
            ("https://other.example/private/a", False),  # host absent
            ("not a url", False),  # malformed: null host, fail open
        ],
        "url string, want_denied boolean",
    )
    from eugl_spark.functions.hosts import host_of

    out = (
        urls.join(F.broadcast(dim), host_of(F.col("url")) == dim["host"], "left")
        .select(
            "url",
            "want_denied",
            path_denied(F.col("url"), F.col("path_rules")).alias("denied"),
        )
        .collect()
    )
    for r in out:
        assert r["denied"] == r["want_denied"], r["url"]


def test_path_rules_drive_pipeline(spark):
    """End-to-end: a path-scoped disallow drops exactly the urls under
    the prefix, with drop_reason='robots_path'; the allow override
    under it survives."""
    import numpy as np

    from eugl_spark.corpus import _chain

    rng = np.random.RandomState(5)
    txt = lambda: " ".join(_chain("en", 60, rng))  # noqa: E731
    pages = spark.createDataFrame(
        [
            (f"https://p.example{path}", None, txt(), "en")
            for path in (
                "/private/a",
                "/private/b",
                "/private/pub/ok",
                "/open/c",
                "",
            )
        ],
        "url string, html binary, text string, lang string",
    ).withColumn("warc_ts", F.current_timestamp())
    robots = spark.createDataFrame(
        [
            (
                "p.example",
                "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n",
            )
        ],
        "host string, body string",
    )
    out = apply_pipeline(
        pages,
        path_rules=parse_robots_path_rules(robots),
        repartition_to=0,
    ).collect()
    got = {r["url"]: (r["keep"], r["drop_reason"]) for r in out}
    assert got["https://p.example/private/a"] == (False, "robots_path")
    assert got["https://p.example/private/b"] == (False, "robots_path")
    assert got["https://p.example/private/pub/ok"][0] is True
    assert got["https://p.example/open/c"][0] is True
    assert got["https://p.example"][0] is True
    # condemned rows skipped the kernel: null qa metrics
    denied = [r for r in out if r["drop_reason"] == "robots_path"]
    assert all(r["qa"]["heuristics"]["n_chars"] is None for r in denied)


def test_stacked_user_agent_lines_form_one_group(spark):
    """RFC 9309 §2.2.1: consecutive User-agent lines stack onto ONE
    rule block; a site-wide deny in a group opened by
    '*' + 'Googlebot' (in either order) must apply to the wildcard —
    the single-line opener used to terminate the group at the second
    UA line and fail OPEN (ADVICE r4)."""
    rows = [
        (
            "star-first.example",
            "User-agent: *\nUser-agent: Googlebot\nDisallow: /\n",
        ),
        (
            "star-last.example",
            "User-agent: Googlebot\nUser-agent: *\nDisallow: /\n",
        ),
        # stacked run WITHOUT '*' is still not ours
        (
            "others-only.example",
            "User-agent: A\nUser-agent: B\nDisallow: /\n",
        ),
        # a later stacked wildcard group after an agent-specific one
        (
            "second-group.example",
            "User-agent: A\nDisallow: /\n\n"
            "User-agent: B\nUser-agent: *\nCrawl-delay: 30\n",
        ),
        # FIRST wildcard group wins: its empty policy is not
        # overridden by a later wildcard deny
        (
            "first-wins.example",
            "User-agent: *\nDisallow: /a/\n\nUser-agent: *\nDisallow: /\n",
        ),
    ]
    got = _rules(spark, rows)
    assert got == {
        "star-first.example": "deny",
        "star-last.example": "deny",
        "second-group.example": "sample:10",
    }


def test_self_curating_crawl_end_to_end(spark):
    """A crawl CONTAINS its own robots policy: /robots.txt response
    records inside the WARC drops become the (host, body) frame
    (robots_from_pages), both parsers derive the dims, and the SAME
    parsed-pages frame is gated by them — raw record bytes to
    robots-aware verdicts with no side channel."""
    import numpy as np

    from eugl_spark.corpus import _chain
    from eugl_spark.functions.robots import robots_from_pages
    from eugl_spark.sources.warc import parse_crawl_records

    rng = np.random.RandomState(7)

    def rec(url, body):
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: 2024-03-01T00:00:00Z\r\n\r\n"
            f"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n{body}"
        ).encode()

    txt = lambda: " ".join(_chain("en", 60, rng))  # noqa: E731
    blobs = [
        rec(
            "https://a.example/robots.txt",
            "User-agent: *\nDisallow: /private/\n",
        ),
        rec("https://b.example/robots.txt", "User-agent: *\nDisallow: /\n"),
        rec("https://a.example/private/p1", f"<p>{txt()}</p>"),
        rec("https://a.example/open/p2", f"<p>{txt()}</p>"),
        rec("https://b.example/p3", f"<p>{txt()}</p>"),
        rec("https://c.example/p4", f"<p>{txt()}</p>"),
    ]
    raw = spark.createDataFrame([(b,) for b in blobs], "content binary")
    pages = parse_crawl_records(raw)

    robots = robots_from_pages(pages)
    out = apply_pipeline(
        pages,
        host_rules=parse_robots_rules(robots),
        path_rules=parse_robots_path_rules(robots),
        repartition_to=0,
    )
    got = {r["url"]: r["drop_reason"] for r in out.collect()}
    assert got["https://a.example/private/p1"] == "robots_path"
    assert got["https://a.example/open/p2"] is None
    assert got["https://b.example/p3"] == "host_deny"
    assert got["https://c.example/p4"] is None  # no robots: fail open
    # the robots.txt records themselves flow through as documents and
    # fall to the quality gates (too short / not prose), never to
    # their own policy (robots.txt does not disallow /robots.txt here)
    assert got["https://a.example/robots.txt"] is not None


def test_self_curating_capstone(spark):
    """The capstone's policy passthrough: robots dims derived from the
    SAME crawl frame gate the corpus build — a path-denied url reports
    reason=robots_path, a denied host host_deny, and both still carry
    their host's PageRank annotation."""
    import numpy as np

    from eugl_spark.corpus import _chain
    from eugl_spark.functions.robots import robots_from_pages
    from eugl_spark.plans.queries import crawl_corpus_from

    rng = np.random.RandomState(11)
    txt = lambda: " ".join(_chain("en", 60, rng))  # noqa: E731

    def page(url, html_text=None, body=None):
        h = (body if body is not None else f"<p>{html_text}</p>").encode()
        return (url, None, h, None, "en")

    rows = [
        page(
            "https://a.example/robots.txt",
            body="User-agent: *\nDisallow: /private/\n",
        ),
        page("https://b.example/robots.txt", body="User-agent: *\nDisallow: /\n"),
        page("https://a.example/private/p1", txt()),
        page(
            "https://a.example/open/p2",
            txt() + ' <a href="https://c.example/x">c</a>',
        ),
        page("https://b.example/p3", txt()),
        page("https://c.example/p4", txt()),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    ).withColumn("warc_ts", F.current_timestamp())

    robots = robots_from_pages(pages)
    out = crawl_corpus_from(
        pages,
        host_rules=parse_robots_rules(robots),
        path_rules=parse_robots_path_rules(robots),
    )
    got = {r["url"]: (r["reason"], r["host_rank"]) for r in out.collect()}
    assert got["https://a.example/private/p1"][0] == "robots_path"
    assert got["https://a.example/open/p2"][0] == "KEEP"
    assert got["https://b.example/p3"][0] == "host_deny"
    assert got["https://c.example/p4"][0] == "KEEP"
    # linked host still ranked despite gating (rank is authority, not
    # permission — the corpus sampler weighs both)
    assert got["https://c.example/p4"][1] > 0


def test_crawl_delay_extraction_for_schedule(spark):
    """robots_crawl_delays surfaces the RAW wildcard-group delay
    (first delay line; strictest across snapshots), independent of
    the pipeline's sampling threshold; agent-specific-only and
    delay-free hosts are absent (schedule defaults them to 1s)."""
    from eugl_spark.functions.robots import robots_crawl_delays

    rows = [
        ("a.example", "User-agent: *\nCrawl-delay: 7\nDisallow: /x/\n"),
        ("b.example", "User-agent: Other\nCrawl-delay: 99\n"),  # not *
        ("c.example", "User-agent: *\nDisallow: /\n"),  # no delay
        ("d.example", "User-agent: *\nCrawl-delay: 2\nCrawl-delay: 9\n"),
        # two snapshots: strictest (max) wins
        ("e.example", "User-agent: *\nCrawl-delay: 3\n"),
        ("e.example", "User-agent: *\nCrawl-delay: 11\n"),
    ]
    df = spark.createDataFrame(rows, "host string, body string")
    got = {r["host"]: r["delay_sec"]
           for r in robots_crawl_delays(df).collect()}
    assert got == {"a.example": 7, "d.example": 2, "e.example": 11}
