"""Deterministic synthetic page corpus (FIXTURES.md §1).

Mirrors the reference's fixture strategy — small, stable, synthetic
datasets covering normal plus curated problem cases
(/root/reference/testing/fmask-generate-test-data.py:26-70,
"Small and stable but ... not real pixels") — recast as Common-Crawl
style pages with the BASELINE.json input_hint shape:

    url: string, warc_ts: timestamp, html: binary, text: string,
    lang: string  (+ hidden _case column, tests only)

Everything is a pure function of (n_rows, seed); numpy RandomState
keeps it reproducible across runs and machines.
"""

from __future__ import annotations

import hashlib as _hashlib
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

from eugl_spark import constants as C

# Generator version, captured AT IMPORT TIME from this module's own
# bytes: fixture paths are keyed on it so a stale cached parquet can
# never serve a newer generator. Computed here (not at call time via
# inspect.getsource) because a long-lived process whose loaded module
# predates an on-disk edit would otherwise hash the NEW file while
# running the OLD generator — and write stale fixtures to the new
# version's path (observed: a background pytest racing an edit).
_SRC_VERSION = _hashlib.md5(open(__file__, "rb").read()).hexdigest()[:8]

# (case, weight) — weights normalized; covers every row class from
# FIXTURES.md §1.
CASES: tuple[tuple[str, float], ...] = (
    ("clean_en", 0.42),
    ("clean_de", 0.05),
    ("clean_fr", 0.03),
    ("wrong_lang", 0.05),
    ("high_ppl", 0.06),
    ("too_short", 0.04),
    ("too_long", 0.02),
    ("symbol_heavy", 0.04),
    ("repetitive", 0.04),
    ("no_stopwords", 0.04),
    ("pii_email", 0.05),
    ("pii_phone", 0.04),
    ("pii_ip", 0.03),
    ("toxic_term", 0.03),
    ("empty_text", 0.02),
    ("null_both", 0.01),
    ("boundary_short", 0.01),
    ("boundary_symbol", 0.01),
    ("html_only", 0.05),
)

N_HOSTS = 200


def _chain(lang: str, n_words: int, rng: np.random.RandomState,
           avoid_stopwords: bool = False) -> list[str]:
    """Walk the fixed successor graph → text the bigram LM scores as seen."""
    vocab = C.WORDS[lang]
    stop = set(C.EN_STOPWORDS) if avoid_stopwords else set()
    if avoid_stopwords:
        start_pool = [w for w in vocab if w not in stop]
        word = start_pool[rng.randint(len(start_pool))]
    else:
        word = vocab[rng.randint(len(vocab))]
    out = [word]
    for _ in range(n_words - 1):
        succ = C.successors(lang, word)
        if avoid_stopwords:
            allowed = [s for s in succ if s not in stop]
            if allowed:
                word = allowed[rng.randint(len(allowed))]
            else:  # all successors are stop words: deterministic escape
                i = vocab.index(word)
                word = vocab[16 + ((i * 7) % 32)]
        else:
            word = succ[rng.randint(len(succ))]
        out.append(word)
    return out


def _lines(words: list[str], per_line: int = 12) -> str:
    return "\n".join(
        " ".join(words[i : i + per_line])
        for i in range(0, len(words), per_line)
    )


def _make_text(case: str, rng: np.random.RandomState) -> tuple[str | None, str]:
    """Return (text, effective_lang) for a row class."""
    if case == "null_both" or case == "html_only":
        return None, "en"
    if case == "empty_text":
        return "", "en"
    if case == "clean_de":
        return _lines(_chain("de", 40 + rng.randint(40), rng)), "de"
    if case == "clean_fr":
        return _lines(_chain("fr", 40 + rng.randint(40), rng)), "fr"
    if case == "wrong_lang":
        lang = ("de", "fr", "es", "it")[rng.randint(4)]
        return _lines(_chain(lang, 40 + rng.randint(40), rng)), lang
    if case == "high_ppl":
        vocab = C.WORDS["en"]
        words = [vocab[rng.randint(len(vocab))] for _ in range(60)]
        return _lines(words), "en"
    if case == "too_short":
        return " ".join(_chain("en", 6, rng))[: C.MIN_CHARS - 10], "en"
    if case == "too_long":
        return _lines(_chain("en", 1800, rng)), "en"
    if case == "boundary_short":
        base = _lines(_chain("en", 30, rng))
        text = base[: C.MIN_CHARS]
        if text.endswith(" ") or text.endswith("\n"):
            text = text[:-1] + "x"
        return text, "en"
    if case == "symbol_heavy":
        base = " ".join(_chain("en", 30, rng))
        n_sym = int(len(base) * 0.25)
        return base + " " + "@#$%^&*" * (n_sym // 7 + 1), "en"
    if case == "boundary_symbol":
        words = _chain("en", 40, rng)
        base = " ".join(words)
        # exactly MAX_SYMBOL_RATIO: pad alnum/space to a multiple of 9,
        # then add 1 symbol per 9 clean chars (ratio = n/(9n+n) = 0.1)
        pad = (9 - len(base) % 9) % 9
        base = base + "x" * pad
        n_sym = len(base) // 9
        return base + "#" * n_sym, "en"
    if case == "repetitive":
        line = " ".join(_chain("en", 12, rng))
        other = " ".join(_chain("en", 12, rng))
        return "\n".join([line] * 8 + [other]), "en"
    if case == "no_stopwords":
        return _lines(_chain("en", 50, rng, avoid_stopwords=True)), "en"
    body = _chain("en", 50 + rng.randint(30), rng)
    if case == "pii_email":
        ins = f"user{rng.randint(1000)}@mail{rng.randint(100)}.example.com"
    elif case == "pii_phone":
        ins = f"+{rng.randint(1, 99)} {rng.randint(100, 999)} {rng.randint(100, 999)} {rng.randint(1000, 9999)}"
    elif case == "pii_ip":
        ins = ".".join(str(rng.randint(1, 255)) for _ in range(4))
    elif case == "toxic_term":
        ins = C.TOXIC_TERMS[rng.randint(len(C.TOXIC_TERMS))]
    else:  # clean_en
        ins = None
    if ins is not None:
        body.insert(rng.randint(len(body)), ins)
    return _lines(body), "en"


def _wrap_html(text: str, rng: np.random.RandomState) -> bytes:
    paras = "\n".join(f"<p>{ln}</p>" for ln in text.split("\n"))
    script = (
        "<script type='text/javascript'>var x = 1; tracker(x);</script>"
        if rng.rand() < 0.3
        else ""
    )
    nav = "<div class='nav'>home &amp; about</div>" if rng.rand() < 0.3 else ""
    html = (
        f"<html><head><title>doc</title>{script}</head>"
        f"<body>{nav}\n{paras}\n</body></html>"
    )
    return html.encode("utf-8")


def generate_pages(n_rows: int, seed: int = 42) -> pd.DataFrame:
    """The synthetic `pages` table (pandas; write with Spark or pyarrow)."""
    rng = np.random.RandomState(seed)
    names = [c for c, _ in CASES]
    weights = np.array([w for _, w in CASES])
    weights = weights / weights.sum()
    case_idx = rng.choice(len(names), size=n_rows, p=weights)
    # Zipf host distribution → a few hot hosts (exercises salting).
    host_w = 1.0 / np.arange(1, N_HOSTS + 1)
    host_w /= host_w.sum()
    host_idx = rng.choice(N_HOSTS, size=n_rows, p=host_w)
    t0 = datetime(2024, 1, 1)

    rows = []
    for i in range(n_rows):
        case = names[case_idx[i]]
        text, true_lang = _make_text(case, rng)
        # claimed lang is wrong for wrong_lang rows; ~5% of the rest
        # get a RANDOM claim drawn from (zz, null, en, de) — the draw
        # can coincide with the row's true lang (1-in-4 for an 'en'
        # row), so the effectively-WRONG claim rate is ~3.5-4%, not the
        # full 5%. Kept as-is (fixing the draw would churn every
        # golden/cached corpus for no functional gain); sized analyses
        # should count langid-vs-claimed disagreement, not assume 5%.
        if case == "wrong_lang":
            lang = "en"
        elif rng.rand() < 0.05:
            lang = ("zz", None, "en", "de")[rng.randint(4)]
        else:
            lang = true_lang
        html: bytes | None
        if case == "null_both":
            html, text_col = None, None
        elif case == "html_only":
            body = _lines(_chain("en", 50 + rng.randint(30), rng))
            html, text_col = _wrap_html(body, rng), None
        else:
            assert text is not None
            html = _wrap_html(text, rng) if rng.rand() > 0.10 else None
            text_col = text if (html is None or rng.rand() > 0.10) else None
        rows.append(
            {
                "url": f"https://www.site{host_idx[i]}.example/p/{i}",
                "warc_ts": t0 + timedelta(seconds=int(rng.randint(0, 365 * 86400))),
                "html": html,
                "text": text_col,
                "lang": lang,
                "_case": case,
            }
        )
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def write_pages_parquet(path: str, n_rows: int, seed: int = 42) -> str:
    """Write the corpus as parquet (pyarrow; no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_pages(n_rows, seed)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
            ("_case", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    # small row groups: a single-row-group file caps scan parallelism at
    # 1 task no matter the cluster size (real CC tables are many files)
    pq.write_table(table, path, row_group_size=8192)
    return path


# ---------------------------------------------------------------------------
# Link corpus: crawl-with-outlinks fixture for the web-graph family
# (outlink extraction → host edge list → PageRank) and snapshot-recency
# dedup. Same input_hint shape as `generate_pages`; kept separate so the
# link-free pipeline fixture stays byte-stable.
# ---------------------------------------------------------------------------

LINK_N_HOSTS = 60

# External hosts: appear only as link TARGETS, never as page urls —
# the crawl frontier (discovered-but-uncrawled). They are PageRank
# dangling nodes for real (no outlinks), exercising the dangling-mass
# redistribution term on the committed fixture rather than only in
# hand-graph tests.
LINK_N_EXT_HOSTS = 10

# Anchor-text vocabulary (Zipf-weighted): navigation boilerplate
# dominates real anchor text, so the per-host mode is a meaningful
# signal rather than a uniform draw.
_ANCHOR_TEXTS = [
    "click here", "read more", "home", "about us", "contact",
    "news", "products", "blog", "privacy policy", "terms of use",
    "login", "site map",
]


def generate_link_pages(
    n_rows: int, seed: int = 7, n_hosts: int = LINK_N_HOSTS
) -> pd.DataFrame:
    """Synthetic crawl pages whose html embeds anchor outlinks.

    Structure (all deterministic in (n_rows, seed)):
      * hosts follow a Zipf law over ``n_hosts`` (authority skew — a
        few hosts receive most links, the adversarial case for link
        analysis); the oracle fixture keeps the 60-host default, the
        scaled bench corpus raises it so the graph itself scales;
      * ~15% of rows are REVISITS of an earlier url at a strictly later
        warc_ts (no two snapshots of one url share a timestamp), for
        the keep-newest-snapshot dedup;
      * each page embeds 0-8 anchors: mostly double-quoted absolute
        https targets, plus deliberate negatives the extractor must
        ignore — single-quoted hrefs, relative hrefs, mailto:;
      * ~10% of qualifying targets point at EXTERNAL hosts that are
        never crawled (no page rows) — the frontier / dangling set;
      * anchor text is drawn Zipf-weighted from a boilerplate
        vocabulary so per-host anchor-text aggregation has a
        well-defined mode.
    """
    rng = np.random.RandomState(seed)
    host_w = 1.0 / np.arange(1, n_hosts + 1)
    host_w /= host_w.sum()
    at_w = 1.0 / np.arange(1, len(_ANCHOR_TEXTS) + 1)
    at_w /= at_w.sum()
    ext_w = 1.0 / np.arange(1, LINK_N_EXT_HOSTS + 1)
    ext_w /= ext_w.sum()
    n_pages = max(1, int(n_rows * 0.85))
    page_host = rng.choice(n_hosts, size=n_pages, p=host_w)
    t0 = datetime(2024, 3, 1)
    rows = []
    for i in range(n_rows):
        pid = i if i < n_pages else int(rng.randint(n_pages))
        url = f"https://www.site{page_host[pid]}.example/p/{pid}"
        anchors = []
        for j in range(int(rng.randint(0, 9))):
            th = int(rng.choice(n_hosts, p=host_w))
            target = f"https://www.site{th}.example/p/{int(rng.randint(n_pages))}"
            atext = str(rng.choice(_ANCHOR_TEXTS, p=at_w))
            r = rng.rand()
            if r < 0.08:  # single-quoted: outside the extraction contract
                anchors.append(f"<a href='{target}'>{atext}</a>")
            elif r < 0.14:  # relative: no host → dropped at host parse
                anchors.append(
                    f'<a href="/p/{int(rng.randint(n_pages))}">{atext}</a>'
                )
            elif r < 0.17:  # non-http scheme → dropped at host parse
                anchors.append(f'<a href="mailto:u{j}@x.example">{atext}</a>')
            elif r < 0.27:  # external target: frontier host, dangling node
                eh = int(rng.choice(LINK_N_EXT_HOSTS, p=ext_w))
                ep = int(rng.randint(50))
                anchors.append(
                    f'<a href="https://ext{eh}.example/p/{ep}">{atext}</a>'
                )
            else:
                anchors.append(f'<a href="{target}">{atext}</a>')
        body = " ".join(_chain("en", 20 + rng.randint(20), rng))
        html = (
            f"<html><body><p>{body}</p>\n" + "\n".join(anchors)
            + "</body></html>"
        ).encode("utf-8")
        rows.append(
            {
                "url": url,
                # 137s stride + sub-stride jitter: strictly increasing in
                # i, so every snapshot (in particular every revisit of
                # one url) has a distinct timestamp — keep-newest needs
                # no tiebreak
                "warc_ts": t0 + timedelta(seconds=i * 137 + int(rng.randint(0, 100))),
                "html": html,
                "text": None,
                "lang": "en",
            }
        )
    df = pd.DataFrame(rows)
    df["warc_ts"] = pd.to_datetime(df["warc_ts"])
    return df


def write_link_pages_parquet(
    path: str, n_rows: int, seed: int = 7, n_hosts: int = LINK_N_HOSTS
) -> str:
    """Write the link corpus as parquet (pyarrow; no Spark needed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_link_pages(n_rows, seed, n_hosts)
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    table = pa.Table.from_pandas(df, schema=schema, preserve_index=False)
    pq.write_table(table, path, row_group_size=8192)
    return path


# ---------------------------------------------------------------------------
# WARC record-blob corpus: one raw record's bytes per row, for the
# cross-engine ingestion-parse fixture (crawl_ingest_parse). The blobs
# are deliberately ALL-ASCII so the DuckDB twin's decode() can read
# them (its decode hard-errors on invalid UTF-8 — the documented
# engine-vs-oracle boundary; non-UTF-8 resilience is pinned by the
# Spark-only pytest probes instead).
# ---------------------------------------------------------------------------

_WARC_WORDS = (
    "the water of time is a question for the people and the day was "
    "good for all of them there in the house by the sea"
).split()


def generate_warc_blobs(n_rows: int, seed: int = 3) -> pd.DataFrame:
    """Deterministic mix of parse cases, cycling: WARC response,
    WET conversion, warcinfo (dropped), missing-URI with body-spoofed
    header (dropped), empty-URI value (dropped), damaged date (kept,
    null ts), request (dropped), HTTP-enveloped 200 response (kept,
    envelope stripped, status surfaced), enveloped 404 (dropped —
    non-2xx), WARC-Truncated enveloped response (kept, flagged),
    still-chunked enveloped response (kept, flagged)."""
    rng = np.random.RandomState(seed)
    blobs: list[bytes] = []
    for i in range(n_rows):
        words = " ".join(
            _WARC_WORDS[(i + k + int(rng.randint(0, 3))) % len(_WARC_WORDS)]
            for k in range(40 + (i % 30))
        )
        case = i % 11
        url = f"https://w{i % 17}.example/p/{i}"
        date = f"2024-03-{(i % 27) + 1:02d}T{(i % 24):02d}:00:00Z"
        if case == 0:
            body = f"<html><body><p>{words}</p></body></html>"
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"Content-Type: text/html\r\n\r\n{body}"
            )
        elif case == 1:
            b = (
                f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"Content-Type: text/plain\r\n\r\n{words}"
            )
        elif case == 2:
            b = "WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nsoftware: x"
        elif case == 3:
            # no URI header; body tries to smuggle one in
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Date: {date}\r\n\r\n"
                f"WARC-Target-URI: http://evil.example/\r\n{words}"
            )
        elif case == 4:
            b = (
                f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Target-URI: \r\nWARC-Date: {date}\r\n\r\n{words}"
            )
        elif case == 5:
            b = (
                f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Date: not-a-real-date\r\n\r\n{words}"
            )
        elif case == 6:
            b = (
                f"WARC/1.0\r\nWARC-Type: request\r\n"
                f"WARC-Target-URI: {url}\r\n\r\nGET /p HTTP/1.1"
            )
        elif case == 7:
            # the REAL Common-Crawl response shape: HTTP envelope
            # (status line + headers + blank line) ahead of the entity
            html = f"<html><body><p>{words}</p></body></html>"
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n\r\n"
                f"HTTP/1.1 200 OK\r\nServer: httpd/2.{i % 5}\r\n"
                f"Content-Type: text/html; charset=UTF-8\r\n"
                f"Content-Length: {len(html)}\r\n\r\n{html}"
            )
        elif case == 8:
            # non-2xx envelope: dropped by parse (no corpus payload)
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n\r\n"
                f"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n"
                f"\r\n<html><body>not found: {words[:40]}</body></html>"
            )
        elif case == 9:
            # WARC-Truncated record: kept with partial entity, flagged
            html = f"<html><body><p>{words}"
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"WARC-Truncated: length\r\n\r\n"
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n{html}"
            )
        else:
            # Transfer-Encoding: chunked entity that reached the
            # native parse un-repaired: kept raw, flagged 'chunked'
            chunk = f"<p>{words[:60]}</p>"
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n\r\n"
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Transfer-Encoding: chunked\r\n\r\n"
                f"{len(chunk):x}\r\n{chunk}\r\n0\r\n\r\n"
            )
        blobs.append(b.encode("ascii"))
    return pd.DataFrame({"content": blobs})


def write_warc_blobs_parquet(path: str, n_rows: int, seed: int = 3) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_warc_blobs(n_rows, seed)
    table = pa.Table.from_pandas(
        df, schema=pa.schema([("content", pa.binary())]), preserve_index=False
    )
    pq.write_table(table, path, row_group_size=4096)
    return path


# ---------------------------------------------------------------------------
# robots.txt corpus: (host, body) robots snapshots + a url frame over
# the same hosts, for the cross-engine path-rule fixtures
# (crawl_robots_paths / crawl_robots_verdict). Bodies cycle through
# the parse contract's hard cases — nested allow/disallow, stacked UA
# groups, comments/indentation/CRLF, wildcard rules that must be
# skipped or prefix-stripped, agent-specific-only groups — so the
# DuckDB twin (an INDEPENDENT line-window reimplementation, not a
# regex mirror: RE2 has no lookahead) re-derives the same rules.
# ---------------------------------------------------------------------------

_ROBOTS_BODIES = [
    # 0: plain nested disallow/allow; Sitemap ABOVE any group (the
    # common real-world placement — group-independent per RFC 9309)
    "Sitemap: https://r.example/sitemap.xml\n"
    "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n",
    # 1: agent-specific only -> no wildcard rules (fail open)
    "User-agent: OtherBot\nDisallow: /\n",
    # 2: trailing-* stripped; mid-* and $ rules skipped; TWO sitemaps
    # at the tail (inside the group region: rule parsers must ignore
    # them, the sitemap extractor must find both), one of them
    # relative — dropped (the directive requires an absolute URL)
    "User-agent: *\nDisallow: /tmp*\nDisallow: /a/*/b\nDisallow: /x$\n"
    "Allow: /tmp/pub*\n"
    "Sitemap: https://r.example/s/pages.xml.gz\nSitemap: /rel.xml\n",
    # 3: stacked UA run + CRLF + comments + indentation
    "User-agent: Googlebot\r\nUser-agent: * # all\r\n"
    "  Disallow: /secret/ # staging\r\n\tAllow: /secret/ok\r\n",
    # 4: three-level nesting (most-specific-match exercise)
    "User-agent: *\nDisallow: /p/\nAllow: /p/pub/\nDisallow: /p/pub/x/\n",
    # 5: duplicate prefix conflict -> allow wins
    "User-agent: *\nDisallow: /dup/\nAllow: /dup/\n",
    # 6: empty Disallow + crawl-delay only -> no path rules
    "User-agent: *\nDisallow:\nCrawl-delay: 30\n",
    # 7: wildcard group AFTER an agent-specific one; 'Disallow: /*'
    # normalizes to '/'; indented lowercase sitemap with CR ending
    "User-agent: A\nDisallow: /za/\n\nUser-agent: *\nDisallow: /*\n"
    "Allow: /open/\n  sitemap: http://r.example/alt-map.xml\r\n",
]

_ROBOTS_PATHS = [
    "/private/a", "/private/pub/b", "/private/pub/secret/c",
    "/tmp5", "/tmp/pub/d", "/a/q/b", "/x", "/secret/hid",
    "/secret/ok2", "/p/one", "/p/pub/two", "/p/pub/x/three",
    "/dup/z", "/open/ok", "/za/deep", "", "/search?q=x", "/frag#top",
]


def generate_robots_corpus(
    n_hosts: int = 40, n_urls: int = 600, seed: int = 11
) -> tuple[pd.DataFrame, pd.DataFrame]:
    rng = np.random.RandomState(seed)
    hosts = [f"r{i}.example" for i in range(n_hosts)]
    rb_rows = []
    for i, h in enumerate(hosts):
        if i % 9 == 8:
            continue  # host with no robots snapshot at all (fail open)
        rb_rows.append((h, _ROBOTS_BODIES[i % len(_ROBOTS_BODIES)]))
    robots = pd.DataFrame(rb_rows, columns=["host", "body"])
    urls = []
    for j in range(n_urls):
        h = hosts[int(rng.randint(0, n_hosts))]
        p = _ROBOTS_PATHS[int(rng.randint(0, len(_ROBOTS_PATHS)))]
        urls.append(f"https://{h}{p}")
    # a few malformed urls: null host -> fail open in both engines
    urls.extend(["not a url", "ftp://r0.example/private/a"])
    # messy re-crawl variants (dedup_url_canonical exercise; the
    # robots queries also see them — uppercase scheme/host fails the
    # case-sensitive host join OPEN, fragments/queries are outside
    # PATH_RE's capture): tracking params in every position, fragment,
    # www., uppercase scheme+host, trailing slash, dangling '?'
    urls.extend(
        [
            "https://r1.example/open/ok?utm_source=feed&q=1",
            "https://r1.example/open/ok?q=1",
            "https://r1.example/open/ok?q=1&utm_medium=em&gclid=g1",
            "https://r1.example/open/ok?q=1#frag",
            "https://www.r1.example/open/ok?q=1",
            "HTTPS://R1.EXAMPLE/open/ok?q=1",
            "https://r1.example/open/ok/?q=1",
            "https://r1.example/open/ok?",
            "https://r1.example/open/ok?fbclid=abc",
            "https://r2.example/p/one/",
            "https://r2.example/p/one///",
            "https://r2.example/p/one#sec-2",
        ]
    )
    return robots, pd.DataFrame({"url": sorted(set(urls))})


def write_robots_parquet(
    robots_path: str, urls_path: str, n_hosts: int = 40,
    n_urls: int = 600, seed: int = 11,
) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    robots, urls = generate_robots_corpus(n_hosts, n_urls, seed)
    pq.write_table(
        pa.Table.from_pandas(
            robots,
            schema=pa.schema([("host", pa.string()), ("body", pa.string())]),
            preserve_index=False,
        ),
        robots_path,
    )
    pq.write_table(
        pa.Table.from_pandas(
            urls,
            schema=pa.schema([("url", pa.string())]),
            preserve_index=False,
        ),
        urls_path,
    )


def generate_wat_records(n_rows: int = 500, seed: int = 5) -> pd.DataFrame:
    """Deterministic WAT-style metadata records (Common Crawl's WAT
    sidecar: a WARC ``metadata`` record per page whose payload is a
    JSON envelope with the page's extracted head/link metadata — the
    reference's sidecar-metadata scan S4/S5 analog, one level up).

    Case mix, cycling: normal pages with mixed link kinds (anchors,
    images, stylesheets; absolute/relative/mailto/userinfo/port
    targets), pages with no HTML-Metadata at all (non-html captures),
    pages with an empty Links array, a MALFORMED-JSON payload (both
    engines must skip it, not abort), and a missing-URI record
    (dropped by the shared header contract)."""
    import json as _json

    rng = np.random.RandomState(seed)
    blobs: list[bytes] = []
    for i in range(n_rows):
        url = f"https://wat{i % 23}.example/p/{i}"
        date = f"2024-04-{(i % 27) + 1:02d}T{(i % 24):02d}:30:00Z"
        case = i % 9
        links = []
        n_links = int(rng.randint(0, 7))
        for k in range(n_links):
            t = (i + k) % 6
            if t <= 2:  # anchor to an absolute http(s) target
                scheme = "https" if (i + k) % 2 else "http"
                tgt = f"{scheme}://t{(i * 7 + k) % 31}.example/q/{k}"
                if t == 2:  # userinfo + port: host contract exercise
                    tgt = f"https://u{k}:pw@t{(i * 7 + k) % 31}.example:8443/q"
                links.append({"path": "A@/href", "url": tgt})
            elif t == 3:  # relative anchor: no host, dropped
                links.append({"path": "A@/href", "url": f"/rel/{k}"})
            elif t == 4:  # image: wrong path kind, dropped
                links.append(
                    {"path": "IMG@/src",
                     "url": f"https://img{k}.example/i.png"}
                )
            else:  # mailto: anchor with no http host, dropped
                links.append({"path": "A@/href", "url": f"mailto:x{k}@m.example"})
        meta = {
            "Envelope": {
                "WARC-Header-Metadata": {"WARC-Target-URI": url},
                "Payload-Metadata": {
                    "HTTP-Response-Metadata": {
                        "HTML-Metadata": {
                            "Head": {"Title": f"Page {i % 40} title"},
                            "Links": links,
                        }
                    }
                },
            }
        }
        if case == 6:  # non-html capture: no HTML-Metadata subtree
            meta["Envelope"]["Payload-Metadata"] = {
                "HTTP-Response-Metadata": {}
            }
        payload = _json.dumps(meta, separators=(",", ":"))
        if case == 7:  # malformed JSON payload: skipped, never aborts
            payload = payload[: max(10, len(payload) // 2)] + "{"
        head = (
            f"WARC/1.0\r\nWARC-Type: metadata\r\n"
            f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
            f"Content-Type: application/json\r\n"
        )
        if case == 8:  # missing URI header: dropped
            head = (
                f"WARC/1.0\r\nWARC-Type: metadata\r\nWARC-Date: {date}\r\n"
            )
        blobs.append((head + "\r\n" + payload).encode("ascii"))
    return pd.DataFrame({"content": blobs})


def write_wat_parquet(path: str, n_rows: int = 500, seed: int = 5) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_wat_records(n_rows, seed)
    pq.write_table(
        pa.Table.from_pandas(
            df,
            schema=pa.schema([("content", pa.binary())]),
            preserve_index=False,
        ),
        path,
    )
    return path


# C4-style line-filter corpus: multi-line docs whose lines exercise
# each rule of the C4 cleaning recipe (terminal punctuation, ≥3
# space-separated words, no 'javascript' line; doc-level 'lorem
# ipsum' / '{' / ≥5-sentence gates).
_C4_ENDERS = [".", "!", "?", '"']
_C4_BAD_LINES = [
    "read more",                      # no terminal punctuation
    "Ok.",                            # <3 words
    "menu home about contact",        # nav cruft, no punctuation
    "Please enable javascript to continue.",   # javascript line
    "var x = 1; // javascript!",      # javascript line
    "  ",                             # whitespace-only
    "",                               # empty line
    "\tindented\twith\ttabs",         # tabs are not word separators
]


def generate_c4_docs(n_rows: int = 400, seed: int = 13) -> pd.DataFrame:
    """(doc_id, url, text) rows for the C4 line-filter contract."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        case = i % 12
        url = f"https://c4-{i % 19}.example/d/{i}"
        if case == 10:
            rows.append((i, url, None))
            continue
        if case == 11:
            rows.append((i, url, ""))
            continue
        n_lines = 4 + int(rng.randint(0, 8))
        lines = []
        for k in range(n_lines):
            words = _chain("en", 4 + int(rng.randint(0, 10)), rng)
            if rng.rand() < 0.35:  # a line failing some rule
                lines.append(
                    _C4_BAD_LINES[int(rng.randint(0, len(_C4_BAD_LINES)))]
                )
            else:
                ender = _C4_ENDERS[int(rng.randint(0, len(_C4_ENDERS)))]
                lines.append(" ".join(words) + ender)
        if case == 7:  # doc-level lorem ipsum kill
            lines.insert(
                int(rng.randint(0, len(lines))),
                "Lorem ipsum dolor sit amet consectetur.",
            )
        if case == 8:  # doc-level brace kill (code page)
            lines.insert(
                int(rng.randint(0, len(lines))),
                "function f() { return 1; }",
            )
        if case == 9:  # too few surviving sentences
            good = " ".join(_chain("en", 6, rng)) + "."
            lines = [good, "read more", "Ok."]
        rows.append((i, url, "\n".join(lines)))
    return pd.DataFrame(rows, columns=["doc_id", "url", "text"])


def write_c4_docs_parquet(path: str, n_rows: int = 400, seed: int = 13) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_c4_docs(n_rows, seed)
    pq.write_table(
        pa.Table.from_pandas(
            df,
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("url", pa.string()),
                    ("text", pa.string()),
                ]
            ),
            preserve_index=False,
        ),
        path,
    )
    return path


def generate_cdxj_lines(n_rows: int = 900, seed: int = 17) -> pd.DataFrame:
    """Deterministic CDXJ index lines (the Common-Crawl/pywb capture
    index format: `<SURT-key> <14-digit-ts> <JSON>` per capture).

    Case mix, cycling: normal 200 text/html captures (several per
    url — revisit dedup exercise), non-200 statuses, non-html mimes,
    records missing optional JSON fields, a malformed JSON tail and
    a short line (both dropped by the parse), plus offset patterns
    that exercise fetch-plan coalescing: dense runs of adjacent
    records in one file vs scattered singletons."""
    import json as _json

    rng = np.random.RandomState(seed)
    rows = []
    # deterministic per-file offset cursors → realistic dense layout
    cursors: dict[str, int] = {}
    for i in range(n_rows):
        # host×path moduli share factors on purpose: each url recurs
        # every lcm(10,60)=60 rows → ~15 captures per url at the
        # default size (the latest-capture dedup exercise)
        host = f"cdx{i % 10}.example"
        path = f"/p/{i % 60}"
        surt = f"example,{host.split('.')[0]})" + path
        ts = f"2024{(i % 12) + 1:02d}{(i % 27) + 1:02d}{(i % 24):02d}0000"
        url = f"https://{host}{path}"
        fn = f"crawl/seg{i % 7}/shard-{i % 13:05d}.warc.gz"
        length = 400 + int(rng.randint(0, 3200))
        # ~2/3 of records extend their file's dense run; the rest
        # jump ahead, opening a new span (gap > the plan tolerance)
        cur = cursors.get(fn, 0)
        if rng.rand() < 0.35:
            cur += 1 << 20
        offset = cur
        cursors[fn] = cur + length
        case = i % 11
        j = {
            "url": url,
            "mime": "text/html" if case not in (3, 4) else "application/pdf",
            "status": "200" if case != 5 else str((301, 404, 503)[i % 3]),
            "digest": f"sha1:{(i * 2654435761) % (1 << 40):010x}",
            "length": str(length),
            "offset": str(offset),
            "filename": fn,
        }
        if case == 6:
            j.pop("digest")  # optional field absent
        line = f"{surt} {ts} {_json.dumps(j, separators=(',', ':'))}"
        if case == 7:
            line = line[: len(line) - 8]  # truncated JSON: dropped
        if case == 8:
            line = surt  # short line: dropped
        rows.append(line)
    return pd.DataFrame({"line": rows})


def write_cdxj_parquet(path: str, n_rows: int = 900, seed: int = 17) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    df = generate_cdxj_lines(n_rows, seed)
    pq.write_table(
        pa.Table.from_pandas(
            df,
            schema=pa.schema([("line", pa.string())]),
            preserve_index=False,
        ),
        path,
    )
    return path


def write_warc_archive_with_index(
    root: str, n_files: int = 6, recs_per_file: int = 40, seed: int = 29
) -> tuple[str, str]:
    """Write a small WARC archive (concatenated spec-framed records,
    Content-Length correct, '\\r\\n\\r\\n' inter-record separators)
    PLUS its CDXJ index with TRUE byte offsets/lengths — the paired
    fixture for index-driven ranged reads (sources/cdx.py). Offsets
    in the index are measured while writing, exactly like a real
    indexer, so a ranged read at (offset, length) yields the record
    bytes sans separator. Returns (archive_dir, cdxj_parquet_path)."""
    import json as _json
    import os as _os

    rng = np.random.RandomState(seed)
    arch = _os.path.join(root, "archive")
    _os.makedirs(arch, exist_ok=True)
    lines = []
    for f in range(n_files):
        fn = f"seg{f % 3}/shard-{f:05d}.warc"
        fpath = _os.path.join(arch, fn)
        _os.makedirs(_os.path.dirname(fpath), exist_ok=True)
        buf = bytearray()
        for k in range(recs_per_file):
            i = f * recs_per_file + k
            # urls recur across files → the latest-capture selection
            # picks a strict subset of records (the point of the index)
            url = f"https://ar{i % 11}.example/p/{i % 30}"
            ts14 = f"2024{(i % 12) + 1:02d}{(i % 27) + 1:02d}{(i % 24):02d}1500"
            date = (
                f"{ts14[:4]}-{ts14[4:6]}-{ts14[6:8]}"
                f"T{ts14[8:10]}:{ts14[10:12]}:{ts14[12:14]}Z"
            )
            words = " ".join(
                _chain("en", 25 + int(rng.randint(0, 20)), rng)
            )
            # REAL Common-Crawl response shape: the WARC body is a
            # full HTTP response (status line + headers + entity) —
            # status/mime live in the envelope, exactly where
            # build_cdxj_index must find them; digest = sha1(entity),
            # the indexer contract
            entity = (
                f"<html><body><p>{words}</p></body></html>".encode("ascii")
            )
            env = (
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                f"Content-Length: {len(entity)}\r\n\r\n"
            ).encode("ascii")
            body = env + entity
            rec = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
            offset = len(buf)
            buf += rec + b"\r\n\r\n"
            surt = f"example,ar{i % 11})/p/{i % 30}"
            lines.append(
                f"{surt} {ts14} "
                + _json.dumps(
                    {
                        "url": url,
                        "mime": "text/html",
                        "status": "200",
                        "digest": "sha1:"
                        + _hashlib.sha1(entity).hexdigest(),
                        "length": str(len(rec)),
                        "offset": str(offset),
                        "filename": fn,
                    },
                    separators=(",", ":"),
                )
            )
        with open(fpath, "wb") as fh:
            fh.write(bytes(buf))
    import pyarrow as pa
    import pyarrow.parquet as pq

    idx = _os.path.join(root, "cdxj.parquet")
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame({"line": lines}),
            schema=pa.schema([("line", pa.string())]),
            preserve_index=False,
        ),
        idx,
    )
    return arch, idx


def generate_script_docs(n_rows: int = 240, seed: int = 31) -> pd.DataFrame:
    """(doc_id, url, text) rows with controlled Unicode-script mixes
    for the script-profile contract: pure Latin/Cyrillic/CJK/Arabic/
    Hangul/Greek/Hebrew/Devanagari docs, deliberate mixtures (content
    vs boilerplate script), digit/punctuation-only, emoji-only, empty
    and null docs."""
    rng = np.random.RandomState(seed)
    samples = {
        "latin": "the quick brown fox jumps over the lazy dog again",
        "cyrillic": "съешь же ещё этих мягких французских булок да выпей чаю",
        "cjk": "这是一个测试文档包含中文字符 日本語のテキストもある",
        "arabic": "هذا نص تجريبي يحتوي على حروف عربية كثيرة هنا",
        "hangul": "이것은 한국어 텍스트 샘플입니다 한글 문자가 많이",
        "greek": "αυτό είναι ένα ελληνικό κείμενο με πολλά γράμματα",
        "hebrew": "זהו טקסט בעברית עם הרבה אותיות לבדיקה כאן",
        "devanagari": "यह एक परीक्षण दस्तावेज़ है जिसमें हिंदी अक्षर हैं",
    }
    keys = list(samples)
    rows = []
    for i in range(n_rows):
        case = i % 14
        url = f"https://sc{i % 13}.example/d/{i}"
        if case < 8:  # pure single-script doc (repeated to vary length)
            text = " ".join([samples[keys[case]]] * (1 + int(rng.randint(0, 4))))
        elif case == 8:  # latin boilerplate around cyrillic content
            text = ("nav menu home | " + samples["cyrillic"]
                    + " | copyright footer")
        elif case == 9:  # half cjk half latin
            text = samples["cjk"] + " " + samples["latin"]
        elif case == 10:  # digits + punctuation only
            text = "1234567890 ... !!! ??? 42 -- (2024) [99]"
        elif case == 11:  # emoji-only
            text = "🎉🚀🌍 😀😃😄 🔥💧🌟"
        elif case == 12:
            text = ""
        else:
            text = None
        rows.append((i, url, text))
    return pd.DataFrame(rows, columns=["doc_id", "url", "text"])


def write_script_docs_parquet(
    path: str, n_rows: int = 240, seed: int = 31
) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            generate_script_docs(n_rows, seed),
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("text", pa.string())]
            ),
            preserve_index=False,
        ),
        path,
    )
    return path


def generate_revisit_blobs(n_rows: int = 360, seed: int = 37) -> pd.DataFrame:
    """WARC blobs exercising revisit resolution: ``response`` records
    declaring a WARC-Payload-Digest, and ``revisit`` records pointing
    at previously-captured identical content via the same digest
    (Common Crawl's dedup-at-capture shape — ~15% of a real crawl).
    Damage mix: revisits whose digest matches NO stored response
    (dangling — the referenced capture is in another segment),
    revisits missing the digest header entirely, and digest ties
    (two responses storing the same payload — resolution must pick a
    deterministic winner)."""
    rng = np.random.RandomState(seed)
    blobs: list[bytes] = []
    for i in range(n_rows):
        url = f"https://rv{i % 13}.example/p/{i % 45}"
        date = f"2024-05-{(i % 27) + 1:02d}T{(i % 24):02d}:05:00Z"
        case = i % 9
        digest = f"sha1:{(i % 60) * 2654435761 % (1 << 36):09x}"
        if case < 5:  # stored response with declared digest
            words = " ".join(
                _chain("en", 20 + int(rng.randint(0, 15)), rng)
            )
            entity = f"<html><body><p>{words}</p></body></html>"
            b = (
                f"WARC/1.0\r\nWARC-Type: response\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"WARC-Payload-Digest: {digest}\r\n\r\n"
                f"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                f"{entity}"
            )
        elif case < 7:  # revisit of a stored digest
            b = (
                f"WARC/1.0\r\nWARC-Type: revisit\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"WARC-Payload-Digest: {digest}\r\n"
                f"WARC-Refers-To-Target-URI: https://rv0.example/ref\r\n"
                f"\r\n"
            )
        elif case == 7:  # dangling revisit: digest never stored here
            b = (
                f"WARC/1.0\r\nWARC-Type: revisit\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n"
                f"WARC-Payload-Digest: sha1:ffffff{i:06x}\r\n\r\n"
            )
        else:  # damaged revisit: no digest header
            b = (
                f"WARC/1.0\r\nWARC-Type: revisit\r\n"
                f"WARC-Target-URI: {url}\r\nWARC-Date: {date}\r\n\r\n"
            )
        blobs.append(b.encode("ascii"))
    return pd.DataFrame({"content": blobs})


def write_revisit_parquet(path: str, n_rows: int = 360, seed: int = 37) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            generate_revisit_blobs(n_rows, seed),
            schema=pa.schema([("content", pa.binary())]),
            preserve_index=False,
        ),
        path,
    )
    return path


def generate_unicode_docs(n_rows: int = 300, seed: int = 29) -> pd.DataFrame:
    """(doc_id, url, text) rows for the Unicode-normalization contract:
    NFD-decomposed accents and Hangul jamo (change under NFC),
    precomposed text (doesn't), embedded control and zero-width
    characters, UTF-8-read-as-latin-1 mojibake (forged by the exact
    round trip the repair kernel reverses), legitimate curly
    punctuation that must NOT be flagged, null/empty rows."""
    import unicodedata

    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        case = i % 12
        url = f"https://u{i % 17}.example/d/{i}"
        base = " ".join(_chain("en", 12 + int(rng.randint(0, 20)), rng))
        if case == 0:  # clean ascii
            text = base
        elif case == 1:  # NFD accents: recompose under NFC
            text = unicodedata.normalize(
                "NFD", f"café naïve résumé señor {base}"
            )
        elif case == 2:  # already-NFC accents: unchanged
            text = f"café naïve résumé señor {base}"
        elif case == 3:  # control chars sprinkled in
            text = f"ab\x00cd\x07ef\x0bgh\x1fij\x7f {base}"
        elif case == 4:  # zero-width junk
            text = f"zero​width‌join‍er﻿ {base}"
        elif case == 5:  # mojibake: curly quotes + accents round-tripped
            text = "it’s a “café” – naïve…".encode("utf-8").decode(
                "latin-1"
            ) + " " + base
        elif case == 6:  # decomposed Hangul jamo: composes under NFC
            text = unicodedata.normalize("NFD", f"한국어 텍스트 {base}")
        elif case == 7:
            text = None
        elif case == 8:
            text = ""
        elif case == 9:  # everything at once
            text = unicodedata.normalize("NFD", "séance") + (
                "\x01​ " + "déjà vu".encode("utf-8").decode("latin-1")
                + " " + base
            )
        elif case == 10:  # legitimate curly punctuation: NOT mojibake
            text = f"it’s a “quoted” phrase – fine… {base}"
        else:  # combining mark with no precomposed form: NFC keeps it
            text = f"q̃uixotic {base}"
        rows.append((i, url, text))
    return pd.DataFrame(rows, columns=["doc_id", "url", "text"])


def write_unicode_docs_parquet(
    path: str, n_rows: int = 300, seed: int = 29
) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            generate_unicode_docs(n_rows, seed),
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("url", pa.string()),
                    ("text", pa.string()),
                ]
            ),
            preserve_index=False,
        ),
        path,
    )
    return path


def _boiler_para(rng: np.random.RandomState, n_words: int,
                 with_link: bool = False) -> str:
    """A content paragraph; optionally one short inline anchor."""
    words = _chain("en", n_words, rng)
    if with_link:
        k = int(rng.randint(1, max(2, len(words) - 2)))
        words[k] = (
            f'see <a href="/ref/{int(rng.randint(99))}">'
            f"{words[k]} {words[min(k + 1, len(words) - 1)]}</a>"
        )
    return "<p>" + " ".join(words) + ".</p>"


def generate_boiler_docs(n_rows: int = 320, seed: int = 23) -> pd.DataFrame:
    """(doc_id, url, html) pages with REALISTIC block structure for the
    boilerplate classifier: nav bars / menu lists / footers / link
    farms (high link density), headings and short teasers ('near'
    blocks whose fate depends on their neighbors), and genuine content
    paragraphs — plus the damage classes (null / empty / tagless /
    link-only / unclosed-tag / unicode / CRLF pages)."""
    rng = np.random.RandomState(seed)
    rows = []
    for i in range(n_rows):
        case = i % 16
        url = f"https://b{i % 23}.example/page/{i}"
        if case == 13:
            rows.append((i, url, None))
            continue
        if case == 14:
            rows.append((i, url, ""))
            continue
        if case == 15:  # tagless plain text: ONE chunk, no split tag
            rows.append(
                (i, url, " ".join(_chain("en", 40 + int(rng.randint(60)), rng)) + ".")
            )
            continue
        nav = (
            '<div class="nav"><a href="/">Home</a> <a href="/about">About'
            '</a> <a href="/contact">Contact</a> &amp; <a href="/faq">FAQ'
            "</a></div>"
        )
        blocks = [nav]
        n_mid = 3 + int(rng.randint(0, 6))
        for _ in range(n_mid):
            kind = int(rng.randint(0, 10))
            if kind < 4:  # real content paragraph (good)
                blocks.append(
                    _boiler_para(rng, 70 + int(rng.randint(0, 60)),
                                 with_link=rng.rand() < 0.3)
                )
            elif kind < 6:  # short teaser (near: 30..79 chars)
                blocks.append(
                    "<p>" + " ".join(_chain("en", 6 + int(rng.randint(0, 4)), rng))
                    + ".</p>"
                )
            elif kind == 6:  # heading (usually < 30 chars: bad)
                blocks.append(
                    "<h2>" + " ".join(_chain("en", 2 + int(rng.randint(0, 2)), rng))
                    + "</h2>"
                )
            elif kind == 7:  # menu item list (link-dense: bad)
                blocks.append(
                    "".join(
                        f'<li><a href="/m/{j}">'
                        + " ".join(_chain("en", 2, rng))
                        + "</a></li>"
                        for j in range(2 + int(rng.randint(0, 4)))
                    )
                )
            elif kind == 8:  # link farm div
                blocks.append(
                    "<div>"
                    + " ".join(
                        f'<a href="/t/{j}">' + " ".join(_chain("en", 2, rng)) + "</a>"
                        for j in range(6 + int(rng.randint(0, 6)))
                    )
                    + "</div>"
                )
            else:  # UPPERCASE anchor tag (case-insensitive contract)
                blocks.append(
                    '<div class="promo"><A HREF="/buy">'
                    + " ".join(_chain("en", 3, rng))
                    + "</A></div>"
                )
        if case == 11:  # link-only page: nav + farms, zero content
            blocks = [nav] + [
                "<div>"
                + " ".join(f'<a href="/x/{j}">link {j}</a>' for j in range(8))
                + "</div>"
                for _ in range(3)
            ]
        if case == 12:  # unicode content + CRLF between blocks
            blocks.append(
                "<p>café naïve résumé "
                + " ".join(_chain("en", 75, rng))
                + " — fin.</p>"
            )
        if case == 8:  # boilerplate-free lorem page (doc-level kill)
            blocks.append(
                "<p>Lorem ipsum dolor sit amet consectetur "
                + " ".join(_chain("en", 70, rng))
                + ".</p>"
            )
        if case == 9:  # code block: braces survive into the content
            blocks.append(
                "<p>function render() { return "
                + " ".join(_chain("en", 70, rng))
                + "; }.</p>"
            )
        footer = (
            '<div class="footer">© 2024 site'
            ' <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></div>'
        )
        blocks.append(footer)
        if case == 10:  # unclosed tag damage: block never terminates
            blocks.insert(1, "<p>broken block with no closing tag "
                             + " ".join(_chain("en", 5, rng)))
        joiner = "\r\n" if case == 12 else "\n"
        html = (
            f"<html><head><title>page {i}</title></head><body>"
            + joiner.join(blocks)
            + "</body></html>"
        )
        rows.append((i, url, html))
    return pd.DataFrame(rows, columns=["doc_id", "url", "html"])


def write_boiler_docs_parquet(
    path: str, n_rows: int = 320, seed: int = 23
) -> str:
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.Table.from_pandas(
            generate_boiler_docs(n_rows, seed),
            schema=pa.schema(
                [
                    ("doc_id", pa.int64()),
                    ("url", pa.string()),
                    ("html", pa.string()),
                ]
            ),
            preserve_index=False,
        ),
        path,
    )
    return path
