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
  the host (path filtering is a url-level concern, not a host rule);
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
