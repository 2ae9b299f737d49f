"""URL canonicalization (S3 extension): the crawl-side dedup key.

Re-crawls of the same page differ by tracking params, fragments, case
and cosmetic slashes long before content hashing gets a say; URL-level
dedup on a canonical form is the cheapest dedup stage in a crawl
pipeline. All Catalyst expressions (RE2/Java-safe patterns, no
lookaround), so canonicalization runs JVM-side at scan parallelism and
the canonical key feeds the same hash-groupBy dedup as dedup_exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tracking params dropped from query strings, anchored to a param
# boundary (? or &) so only whole k=v pairs match: the industry-standard
# utm_* family plus common click ids. Bare "ref" is deliberately NOT in
# the list — it is a meaningful param on many sites (GitHub ?ref=branch)
# and unanchored it also ate path segments like Amazon's /ref=... .
_TRACKING_RE = r"([?&])(?:utm_[a-z]+|gclid|fbclid|msclkid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Deterministic canonical form:

    scheme+host lowercased, leading ``www.`` stripped, fragment
    dropped, tracking params dropped (with ``?``/``&`` stitching
    repaired), dangling ``?``/``&`` and trailing path slash removed.
    Idempotent: canonical_url(canonical_url(u)) == canonical_url(u).
    """
    head = F.regexp_extract(url, r"^([^/]*//[^/?#]*)", 1)
    rest = url.substr(F.length(head) + F.lit(1), F.length(url))
    u = F.concat(F.lower(head), rest)

    u = F.regexp_replace(u, r"^([a-z]+://)www\.", r"$1")  # strip www.
    u = F.regexp_replace(u, r"#.*$", "")  # fragment
    u = F.regexp_replace(u, _TRACKING_RE, r"$1")  # tracking k=v, keep ?/&
    u = F.regexp_replace(u, r"\?&+", "?")  # ?&& → ?
    u = F.regexp_replace(u, r"&&+", "&")  # a&&b → a&b
    u = F.regexp_replace(u, r"[?&]+$", "")  # dangling ? / &
    # trailing slash on a non-root PATH (never the scheme's // and
    # never inside a query string: [^?#] keeps '?q=a/' intact — a
    # slash there is part of the query VALUE, and stripping it would
    # merge urls whose server responses genuinely differ)
    u = F.regexp_replace(u, r"(//[^/]+/[^?#]+?)/+$", r"$1")
    return u


def dedup_by_canonical_url(pages: DataFrame) -> DataFrame:
    """URL-level exact dedup: group by canonical form, keeper = the
    lexicographically-first raw url (deterministic)."""
    return (
        pages.withColumn("canonical_url", canonical_url(F.col("url")))
        .groupBy("canonical_url")
        .agg(
            F.count("*").alias("n_variants"),
            F.min("url").alias("keeper_url"),
        )
    )
