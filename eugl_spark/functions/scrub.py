"""PII / toxicity scrub (M8): ordered Catalyst regexp_replace chain.

Deterministic by construction — a fixed rule order over a fixed rule
list (constants.SCRUB_RULES), the analog of the reference's nodata
remap (/root/reference/eugl/gqa/tasks.py:169-170) but applied to PII
spans. Pure JVM-side → byte-identical with the oracle and ~free at
scale (whole-stage codegen, no Python boundary for the hot column).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from eugl_spark import constants as C


def scrub(text: Column) -> Column:
    t = text
    for pat, rep in C.SCRUB_RULES:
        t = F.regexp_replace(t, pat, rep)
    return t


def scrub_changed(original: Column, scrubbed: Column) -> Column:
    """qa.scrub.changed metric — null-safe inequality."""
    return ~original.eqNullSafe(scrubbed)
