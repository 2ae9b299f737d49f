"""HTML → text extraction as pure Catalyst expressions (no UDF).

The reference normalizes every granule to a common grid before
scoring (/root/reference/eugl/s2cl.py:69-101, M3 in SURVEY.md §2.10);
our analog canonicalizes raw html/text to one extracted-text form
that all downstream stages consume.

All regexes live in constants.SCRUB/HTML_* and are written in the
common Java-regex/Python-re/RE2 subset, so `regexp_replace` here, the
pandas oracle, and DuckDB produce byte-identical output (BASELINE.json
per-row invariant). Staying JVM-side keeps this inside whole-stage
codegen — the fat `html` column never crosses into Python.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from eugl_spark import constants as C


def html_to_text(html: Column) -> Column:
    """Strip tags/entities, collapse whitespace; null-safe."""
    t = F.decode(html, "UTF-8")
    for pat, rep in C.HTML_STRIP_RULES:
        t = F.regexp_replace(t, pat, rep)
    for ent, ch in C.HTML_ENTITIES:
        # entity strings contain no regex metacharacters
        t = F.regexp_replace(t, ent, ch)
    t = F.regexp_replace(t, C.WHITESPACE_COLLAPSE_RE, " ")
    t = F.regexp_replace(t, C.NEWLINE_COLLAPSE_RE, "\n")
    t = F.regexp_replace(t, C.TRIM_RE, "")
    return t


def text_extracted(text: Column, html: Column) -> Column:
    """Prefer pre-extracted text; fall back to html extraction.

    Matches oracle.label_row: `text` wins even when empty (empty ⇒
    no_content downstream, not a fallback to html).
    """
    return F.coalesce(text, html_to_text(html))
