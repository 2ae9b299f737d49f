"""robots.txt → host-rules: turn raw robots bodies into the (host,
action) policy dim `apply_pipeline(host_rules=...)` consumes.

Crawl curation has three host-level signals — authority (PageRank),
recency (snapshot dedup) and PERMISSION (robots policy); this module
supplies the third. The reference's analog is its ancillary
site/acquisition metadata gating which granules a run processes
(/root/reference/eugl/metadata.py's per-acquisition lookups feeding
the verdicts).

Parsing contract (the widely-implemented core of REP / RFC 9309,
deliberately simplified and documented rather than a full matcher —
the pipeline's policy dim only speaks deny/sample):

* a group opens with a RUN of consecutive ``User-agent:`` lines
  (RFC 9309 §2.2.1 stacked start-of-group lines) and applies here iff
  one of them names ``*`` — agent-specific-only groups are for other
  crawlers; a fetcher honoring a specific token should pre-resolve
  bodies before this step. Only the FIRST such wildcard group counts;
* the group's rule block runs to the next ``User-agent:`` line or
  end-of-body;
* ``Disallow: /`` (entire site, optionally with trailing whitespace)
  in that group → action ``deny`` — path-scoped disallows do NOT deny
  the host (path filtering is a url-level concern: those rules are
  parsed by ``parse_robots_path_rules`` below into the
  (host, prefix, allow) dim ``apply_pipeline(path_rules=...)`` gates
  on per-url);
* ``Crawl-delay: N`` with N ≥ CRAWL_DELAY_SAMPLE_THRESHOLD in that
  group → action ``sample:{CRAWL_DELAY_SAMPLE_PCT}`` (a politeness
  throttle re-expressed as the pipeline's deterministic keep-percent;
  deny wins when both are present);
* everything else (no wildcard group, path disallows, comments,
  empty body, null body) → NO row: absent hosts fail OPEN, exactly
  like apply_pipeline's unknown-action contract.

Everything is JVM-side regexp (whole-stage codegen, no Python) and
the output is a distinct-host dim sized O(hosts) — broadcastable at
any corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from eugl_spark.functions.hosts import host_of, path_of

# A group = a RUN of consecutive User-agent lines followed by its rule
# block, up to the next group or end-of-body (RFC 9309 §2.2.1: several
# start-of-group lines stack onto one rule block, so
# 'User-agent: *\nUser-agent: Googlebot\nDisallow: /' is ONE group
# that covers the wildcard — the single-UA-line opener used before
# this terminated the group at the second UA line and a site-wide deny
# failed OPEN, a common real-world layout and the wrong failure
# direction for a permission signal). LINE-ANCHORED on the opener run
# and the terminator lookahead ((?m)^ + [ \t]* lead): an un-anchored
# 'user-agent:' matched inside a comment tail, which both STARTED
# phantom groups (a '# … user-agent: *' comment turned the next
# agent-specific Disallow into a site-wide deny) and TERMINATED real
# ones (a mid-group comment mentioning 'user-agent:' truncated a
# genuine deny) — caught by review repro. Rule lines tolerate
# REP-legal leading whitespace and trailing same-line '#' comments
# (RFC 9309 *WS grammar; Google's reference parser accepts indented
# rules).
_GROUP_RE = (
    r"(?ism)(?:^[ \t]*user-agent:[^\n\r]*\r?\n)+"
    r".*?(?=^[ \t]*user-agent:|\Z)"
)
# does a group's UA-line run name the wildcard agent? Checked against
# the FULL group text: the rule block cannot contain a line starting
# with ws+'user-agent:' (the opener run consumed every consecutive UA
# line and the block stops before the next one), so a match can only
# come from the opener run itself.
_UA_STAR_LINE_RE = (
    r"(?im)^[ \t]*user-agent:[ \t]*\*[ \t]*(?:#[^\n\r]*)?\r?$"
)
_DENY_ALL_RE = r"(?im)^[ \t]*disallow:[ \t]*/[ \t]*(?:#[^\n\r]*)?\r?$"
_CRAWL_DELAY_RE = r"(?im)^[ \t]*crawl-delay:[ \t]*([0-9]+)"

CRAWL_DELAY_SAMPLE_THRESHOLD = 10  # seconds; ≥ this → sampled host
CRAWL_DELAY_SAMPLE_PCT = 10  # deterministic keep-percent applied


def parse_robots_rules(robots: DataFrame) -> DataFrame:
    """(host, body) robots.txt frame → (host, action) rules dim.

    See the module docstring for the parsing contract. Output has one
    row per host that needs a non-default policy; pass it straight to
    ``apply_pipeline(host_rules=...)``.
    """
    # all groups in order → first whose UA run names '*' (F.get is
    # null-safe on the empty/no-match array: no wildcard group → null
    # grp → null action → fail OPEN, the module contract)
    grps = F.regexp_extract_all("body", F.lit(_GROUP_RE), F.lit(0))
    grp = F.get(F.filter(grps, lambda g: g.rlike(_UA_STAR_LINE_RE)), F.lit(0))
    deny_all = grp.rlike(_DENY_ALL_RE)
    delay = F.regexp_extract(grp, _CRAWL_DELAY_RE, 1).try_cast("int")
    action = F.when(deny_all, F.lit("deny")).when(
        delay >= CRAWL_DELAY_SAMPLE_THRESHOLD,
        F.lit(f"sample:{CRAWL_DELAY_SAMPLE_PCT}"),
    )
    return (
        robots.filter(F.col("body").isNotNull())
        .select("host", action.alias("action"))
        .filter(F.col("action").isNotNull())
        # a crawl may carry several snapshots of one robots.txt;
        # deny > sample so the strictest observed policy wins
        .groupBy("host")
        .agg(F.min("action").alias("action"))  # 'deny' < 'sample:…'
    )


# --- path-scoped rules (RFC 9309 §2.2.2) -----------------------------
# `Disallow: /p` / `Allow: /p` rows within the wildcard group; the
# host-level parser above deliberately ignores these (a path disallow
# must not deny the whole host). Longest-prefix-wins with allow
# breaking ties (RFC 9309 §2.2.2 "most specific match"); matching is
# against the url's PATH (empty path ≡ '/', per the RFC's
# normalization). Simplifications, documented like the host parser's:
# literal prefixes only — a single TRAILING '*' is dropped (it is
# prefix-equivalent), rules still containing '*' or '$' after that are
# skipped (fail OPEN, the module's failure direction); query strings
# are not matched. Output is O(rules) rows — broadcastable at any
# corpus scale — consumed by apply_pipeline(path_rules=...).
_PATH_RULE_LINE_RE = (
    r"(?im)^[ \t]*(?:allow|disallow):[ \t]*/[^ \t\r\n#]*"
)


def parse_robots_path_rules(robots: DataFrame) -> DataFrame:
    """(host, body) robots.txt frame → (host, prefix, allow) rules.

    One row per (host, path prefix) that the wildcard group scopes;
    conflicting duplicate prefixes collapse to allow (RFC tie rule).
    Hosts with no wildcard group or no path rules emit nothing —
    absent hosts fail OPEN, like parse_robots_rules."""
    grps = F.regexp_extract_all("body", F.lit(_GROUP_RE), F.lit(0))
    grp = F.get(F.filter(grps, lambda g: g.rlike(_UA_STAR_LINE_RE)), F.lit(0))
    lines = F.regexp_extract_all(grp, F.lit(_PATH_RULE_LINE_RE), F.lit(0))
    out = (
        robots.filter(F.col("body").isNotNull())
        .select("host", F.explode(lines).alias("_line"))
        .select(
            "host",
            F.lower(
                F.regexp_extract(F.col("_line"), r"(?i)^\s*(allow|disallow)", 1)
            ).alias("_action"),
            # strip ONE trailing '*' (prefix-equivalent wildcard)
            F.regexp_replace(
                F.regexp_extract(F.col("_line"), r"(/[^ \t\r\n#]*)$", 1),
                r"\*$",
                "",
            ).alias("prefix"),
        )
        # non-prefix-expressible wildcard rules are skipped (fail OPEN)
        .filter(
            ~F.col("prefix").contains("*") & ~F.col("prefix").contains("$")
        )
        .select(
            "host", "prefix", (F.col("_action") == "allow").alias("allow")
        )
    )
    # 'Disallow: /*' strips to '' — normalize to the site root '/'
    out = out.withColumn(
        "prefix",
        F.when(F.col("prefix") == "", F.lit("/")).otherwise(F.col("prefix")),
    )
    return out.groupBy("host", "prefix").agg(
        F.max("allow").alias("allow")  # duplicate prefix: allow wins
    )


def path_rules_dim(path_rules: DataFrame) -> DataFrame:
    """(host, prefix, allow) rules → one row per host carrying its
    rules as an array<struct<prefix,allow>>.

    THE join shape for the per-url gate: a rules dim is O(hosts) rows
    (each a handful of structs), so it broadcast-joins against a
    100-TB pages frame WITHOUT multiplying page rows by rule count —
    the naive rules-equi-join would explode every fat page row once
    per rule before re-aggregating. The verdict then evaluates as a
    native array expression per row (no shuffle, no Python)."""
    return path_rules.groupBy("host").agg(
        F.collect_list(F.struct("prefix", "allow")).alias("path_rules")
    )


def path_denied(url, rules_arr) -> "F.Column":
    """url + array<struct<prefix,allow>> → boolean deny verdict.

    RFC 9309 §2.2.2 most-specific-match: among rules whose prefix
    starts the url's path, the LONGEST wins; if it is a disallow the
    url is denied. No matching rule / null array (host absent from the
    dim) → False (fail OPEN). A length tie is impossible post-
    parse_robots_path_rules: prefixes are distinct per host, and two
    distinct equal-length strings cannot both prefix one path — the
    struct's allow field is payload, not a tie-break."""
    p = path_of(url)
    matches = F.filter(
        rules_arr, lambda r: p.startswith(r.getField("prefix"))
    )
    best = F.array_max(
        F.transform(
            matches,
            lambda r: F.struct(
                F.length(r.getField("prefix")).alias("l"),
                r.getField("allow").alias("allow"),
            ),
        )
    )
    return F.coalesce(~best.getField("allow"), F.lit(False))


def robots_from_pages(pages: DataFrame) -> DataFrame:
    """pages(url, html, text, …) → (host, body) robots snapshots.

    THE self-curation source: a real crawl CONTAINS its own robots
    policy — every host's /robots.txt is just another response record
    in the WARC — so the (host, body) frame both parsers consume can
    be derived from the same parsed-pages frame being gated, no side
    channel. Rows whose url path is exactly /robots.txt (the RFC 9309
    well-known location; query strings ignored by PATH_RE) become one
    body per snapshot; multiple snapshots per host are fine — the
    host parser takes the strictest action and the path parser's
    duplicate-prefix allow-wins tie applies across snapshots too
    (documented blend). WET ``conversion`` rows carry the body in
    text; raw ``response`` rows in html."""
    body = F.coalesce(F.col("text"), F.decode(F.col("html"), "UTF-8"))
    return (
        pages.filter(path_of(F.col("url")) == "/robots.txt")
        .select(host_of(F.col("url")).alias("host"), body.alias("body"))
        .filter(F.col("host").isNotNull())
    )


def path_verdict_frame(urls: DataFrame, robots: DataFrame) -> DataFrame:
    """urls(url) × robots(host, body) → (url, allowed).

    THE full composition — parse → per-host rules array → broadcast
    join → longest-prefix verdict — as one library call; the registry
    query crawl_robots_verdict and the pathological sweep both run
    exactly this."""
    from eugl_spark.functions.hosts import host_of

    dim = path_rules_dim(parse_robots_path_rules(robots))
    return urls.join(
        F.broadcast(dim), host_of(F.col("url")) == dim["host"], "left"
    ).select(
        "url",
        (~path_denied(F.col("url"), F.col("path_rules"))).alias("allowed"),
    )


def robots_crawl_delays(robots: DataFrame) -> DataFrame:
    """(host, body) robots.txt frame → (host, delay_sec) dim: the raw
    Crawl-delay of the first wildcard group (first delay line in the
    group, like the host parser's extract), strictest (max) across
    snapshots. Unlike parse_robots_rules — which THRESHOLDS the delay
    into a sampling action for the quality pipeline — this surfaces
    the number itself for fetch scheduling. O(hosts) rows,
    broadcastable."""
    grps = F.regexp_extract_all("body", F.lit(_GROUP_RE), F.lit(0))
    grp = F.get(F.filter(grps, lambda g: g.rlike(_UA_STAR_LINE_RE)), F.lit(0))
    delay = F.regexp_extract(grp, _CRAWL_DELAY_RE, 1).try_cast("int")
    return (
        robots.filter(F.col("body").isNotNull())
        .select("host", delay.alias("delay_sec"))
        .filter(F.col("delay_sec").isNotNull())
        .groupBy("host")
        .agg(F.max("delay_sec").alias("delay_sec"))
    )
