"""Boilerplate block classification — the shared rule text.

ONE definition of the jusText-style contract, consumed by three
surfaces that must agree byte-for-byte:
  * the Catalyst expression chain (`content_text_expr` — used by the
    registry queries AND `apply_pipeline(boilerplate=True)`),
  * the DuckDB SQL twins (plans/queries.py embeds the same regex
    constants verbatim),
  * the pandas oracle (`content_text_py` — label_frame's mirror).

Contract (integer arithmetic only — no float ratios, so engines can't
diverge on a boundary ulp):
  blocks  = html split on closing block tags (?i)</p|div|li|h1-h3>
  btext   = tag-strip(' ') → '&amp;'→'&' → collapse [\t\n\f\r ]+ →
            trim; empty blocks leave the sequence
  lch     = total chars of (?i)<a...>text</a> anchor text (raw chunk)
  class   = bad  if len < 30 OR 3*lch > len        (link-dense/short)
            good if len >= 80 AND 20*lch <= 3*len  (content)
            near otherwise
  final   = near promotes to good iff an ADJACENT raw class is good
            (parallel one-pass variant of jusText context
            propagation), else demotes to bad
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

SPLIT_RE = r"(?i)</(?:p|div|li|h1|h2|h3)>"
TAG_RE = r"<[^>]*>"
WS_RE = r"[\t\n\f\r ]+"
A_RE = r"(?i)<a[^>]*>([^<]*)</a>"


def btext_expr(c: Column) -> Column:
    """Chunk → collapsed block text (the shared btext definition)."""
    t = F.regexp_replace(c, TAG_RE, " ")
    t = F.regexp_replace(t, "&amp;", "&")
    return F.trim(F.regexp_replace(t, WS_RE, " "))


def linkchars_expr(c: Column) -> Column:
    return F.length(F.array_join(F.regexp_extract_all(c, F.lit(A_RE), 1), ""))


def classify_expr(t: Column, l: Column) -> Column:
    return (
        F.when((F.length(t) < 30) | (l * 3 > F.length(t)), "bad")
        .when((F.length(t) >= 80) & (l * 20 <= F.length(t) * 3), "good")
        .otherwise("near")
    )


def with_content_column(df, html_col: Column, out: str):
    """Append ``out`` = main-content text ('' when none) computed from
    ``html_col``, via STAGED projections (one withColumn per array
    stage, temp columns dropped at the end).

    Staging is load-bearing, not style: an indexed-lambda reference to
    an inline array subtree (``F.get(bt_all, i-1)`` with ``bt_all``
    itself a transform expression) re-evaluates the WHOLE subtree per
    element — measured super-linear blowup (a 3k-block page took
    minutes as one nested expression). Bound to a real column, each
    stage materializes once per row and every F.get is O(1). Catalyst's
    CollapseProject declines to inline non-cheap multi-referenced
    expressions, so the stages survive optimization. F.get (0-based,
    NULL out of range) does the neighbor lookups; sequence() is
    guarded behind size>0 because Spark's sequence(1,0) counts DOWN."""
    tmp = [
        "_bp_chunks", "_bp_bt_all", "_bp_lch_all",
        "_bp_bt", "_bp_lch", "_bp_cls", "_bp_idx", "_bp_fin",
    ]
    df = df.withColumn(
        "_bp_chunks", F.split(F.coalesce(html_col, F.lit("")), SPLIT_RE)
    )
    df = df.withColumn(
        "_bp_bt_all", F.transform("_bp_chunks", btext_expr)
    ).withColumn("_bp_lch_all", F.transform("_bp_chunks", linkchars_expr))
    keep = F.filter(
        F.sequence(F.lit(1), F.size("_bp_bt_all")),
        lambda i: F.get("_bp_bt_all", i - 1) != F.lit(""),
    )
    df = df.withColumn(
        "_bp_bt", F.transform(keep, lambda i: F.get("_bp_bt_all", i - 1))
    ).withColumn(
        "_bp_lch", F.transform(keep, lambda i: F.get("_bp_lch_all", i - 1))
    )
    df = df.withColumn(
        "_bp_cls", F.zip_with("_bp_bt", "_bp_lch", classify_expr)
    )
    n = F.size("_bp_cls")
    df = df.withColumn(
        "_bp_idx",
        F.when(n > 0, F.sequence(F.lit(1), n)).otherwise(
            F.array().cast("array<int>")
        ),
    )
    df = df.withColumn(
        "_bp_fin",
        F.transform(
            "_bp_idx",
            lambda i: F.when(
                F.get("_bp_cls", i - 1) == "near",
                F.when(
                    (F.get("_bp_cls", i - 2) == "good")
                    | (F.get("_bp_cls", i) == "good"),
                    "good",
                ).otherwise("bad"),
            ).otherwise(F.get("_bp_cls", i - 1)),
        ),
    )
    content = F.transform(
        F.filter("_bp_idx", lambda i: F.get("_bp_fin", i - 1) == F.lit("good")),
        lambda i: F.get("_bp_bt", i - 1),
    )
    df = df.withColumn(out, F.array_join(content, "\n"))
    return df.drop(*tmp)


# --- pandas-oracle twin ----------------------------------------------------

_SPLIT_PY = re.compile(SPLIT_RE)
_TAG_PY = re.compile(TAG_RE)
_WS_PY = re.compile(WS_RE)
_A_PY = re.compile(A_RE)


def content_text_py(html: bytes | str | None) -> str:
    """Python mirror of content_text_expr (oracle.label_row's
    boilerplate mode). bytes decode with errors='replace', matching
    the engine's binary→string cast under legacy codingErrorAction."""
    if html is None:
        return ""
    if isinstance(html, (bytes, bytearray)):
        html = bytes(html).decode("utf-8", errors="replace")
    chunks = _SPLIT_PY.split(html)
    bts: list[str] = []
    lchs: list[int] = []
    for c in chunks:
        t = _TAG_PY.sub(" ", c)
        t = t.replace("&amp;", "&")
        t = _WS_PY.sub(" ", t).strip(" ")
        if t == "":
            continue
        bts.append(t)
        lchs.append(sum(len(m) for m in _A_PY.findall(c)))
    cls = [
        "bad"
        if len(t) < 30 or 3 * l > len(t)
        else ("good" if len(t) >= 80 and 20 * l <= 3 * len(t) else "near")
        for t, l in zip(bts, lchs)
    ]
    fin = [
        (
            "good"
            if (i > 0 and cls[i - 1] == "good")
            or (i + 1 < len(cls) and cls[i + 1] == "good")
            else "bad"
        )
        if c == "near"
        else c
        for i, c in enumerate(cls)
    ]
    return "\n".join(t for t, f in zip(bts, fin) if f == "good")
