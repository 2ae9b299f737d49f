"""Golden-snapshot pin: the exact verdicts + scrubbed bytes of the
seed-42 corpus, frozen as a checksum — the reference's released-vs-dev
golden-output diffing (/root/reference/testing/cmp-fmask-outputs.py)
applied across OUR revisions. Any change to constants, corpus
generation, kernel or oracle semantics trips this; if the change is
intentional, recompute the hash (command in the assert message)."""

from __future__ import annotations

import hashlib

from eugl_spark.corpus import generate_pages
from eugl_spark.oracle import label_frame
from eugl_spark.pipeline import apply_pipeline

GOLDEN_SHA = "ad5c0195655e361823dc739cc967b675f3ea681d977be47f89a59a20fc18aa19"
GOLDEN_KEPT = 760
GOLDEN_N = 1200


def _digest(rows) -> str:
    blob = "\x1e".join(
        f"{u}\x1f{dr or ''}\x1f{sc or ''}" for u, dr, sc in rows
    )
    return hashlib.sha256(blob.encode()).hexdigest()


def test_oracle_golden_snapshot():
    df = generate_pages(GOLDEN_N, seed=42)
    lab = label_frame(df[["url", "html", "text"]]).sort_values("url")
    assert int(lab.keep.sum()) == GOLDEN_KEPT
    got = _digest(
        (r.url, r.drop_reason, r.scrubbed_text)
        for r in lab.itertuples(index=False)
    )
    assert got == GOLDEN_SHA, (
        "oracle semantics changed; if intentional, recompute via "
        "tests/test_golden_snapshot.py docstring recipe: " + got
    )


def test_engine_golden_snapshot(spark, pages_path):
    out = (
        apply_pipeline(spark.read.parquet(pages_path).drop("_case"))
        .select("url", "drop_reason", "scrubbed_text")
        .toPandas()
        .sort_values("url")
    )
    got = _digest(
        (r.url, r.drop_reason, r.scrubbed_text)
        for r in out.itertuples(index=False)
    )
    assert got == GOLDEN_SHA, got
