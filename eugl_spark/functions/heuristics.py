"""Gopher/C4-style heuristic quality rules as pure Catalyst expressions.

The reference's multi-band validity conjunction
(/root/reference/eugl/contiguity.py:28-31, F3 in SURVEY.md §2.3) and
threshold filters (eugl/gqa/tasks.py:474, F1) recast as native column
expressions — no UDF, fully inside whole-stage codegen, and pushdown-
friendly (a `keep`-only consumer prunes everything else).

Every metric is derived from integer counts so the oracle reproduces
the doubles bit-exactly (long/long division → IEEE double in both
engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from eugl_spark import constants as C


def n_chars(t: Column) -> Column:
    return F.length(t).cast("long")


def symbol_ratio(t: Column) -> Column:
    """(symbol chars) / (all chars). regexp_count, not
    length(regexp_replace(...)): counting avoids materializing the
    stripped copy of every document — measured ~2× cheaper on the
    whole-pipeline CPU profile."""
    n_sym = F.regexp_count(t, F.lit(C.SYMBOL_RE)).cast("long")
    return F.try_divide(n_sym, n_chars(t))


def tokens(t: Column) -> Column:
    """Lowercase alphabetic runs — the shared tokenizer (constants.TOKEN_RE)."""
    return F.regexp_extract_all(F.lower(t), F.lit(C.TOKEN_RE), 0)


def n_words(toks: Column) -> Column:
    return F.size(toks).cast("long")


def mean_word_len(toks: Column) -> Column:
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.try_divide(total, n_words(toks))


def dup_line_fraction(t: Column) -> Column:
    lines = F.split(t, "\n")
    return F.lit(1.0) - F.try_divide(
        F.size(F.array_distinct(lines)).cast("long"),
        F.size(lines).cast("long"),
    )


def stopword_fraction(toks: Column) -> Column:
    n_stop = F.size(
        F.filter(toks, lambda w: w.isin(*C.EN_STOPWORDS))
    ).cast("long")
    return F.try_divide(n_stop, n_words(toks))
