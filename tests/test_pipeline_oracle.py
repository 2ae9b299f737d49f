"""Tier-2 golden-output test: Spark engine vs pandas oracle.

The reference's main strategy — run released vs dev pipeline over a
fixed corpus and diff outputs field-by-field with NaN==NaN
(/root/reference/testing/cmp-fmask-outputs.py:16-60) — recast as
engine-vs-oracle over the synthetic corpus:

  * keep/drop F1 ≥ 0.99 (BASELINE.json metric; we assert exact match)
  * byte-identical text_extracted and scrubbed_text per url
  * per-metric equality with NaN tolerance (C14 pattern)
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

from eugl_spark.corpus import generate_pages
from eugl_spark.oracle import label_frame
from eugl_spark.pipeline import apply_pipeline


@pytest.fixture(scope="module")
def joined(spark, pages_path) -> pd.DataFrame:
    pages = spark.read.parquet(pages_path)
    got = apply_pipeline(pages.drop("_case")).toPandas()
    want = label_frame(
        generate_pages(1200, seed=42)[["url", "html", "text"]]
    )
    m = got.merge(want, on="url", suffixes=("", "_ref"), how="outer")
    assert len(m) == len(got) == len(want)
    return m


def test_keep_f1(joined):
    tp = int(((joined.keep) & (joined.keep_ref)).sum())
    fp = int(((joined.keep) & (~joined.keep_ref)).sum())
    fn = int((~joined.keep & joined.keep_ref).sum())
    f1 = 2 * tp / (2 * tp + fp + fn)
    assert f1 >= 0.99, f"F1={f1} tp={tp} fp={fp} fn={fn}"
    # and in fact exact:
    assert fp == 0 and fn == 0


def test_drop_reason_exact(joined):
    mism = joined[
        joined.drop_reason.fillna("KEEP")
        != joined.drop_reason_ref.fillna("KEEP")
    ]
    assert len(mism) == 0, mism[["url", "drop_reason", "drop_reason_ref"]].head()


def test_extracted_text_byte_identical(joined):
    a = joined.text_extracted.fillna("\0")
    b = joined.text_extracted_ref.fillna("\0")
    mism = joined[a != b]
    assert len(mism) == 0, mism[["url", "text_extracted", "text_extracted_ref"]].head()


def test_scrubbed_text_byte_identical(joined):
    a = joined.scrubbed_text.fillna("\0")
    b = joined.scrubbed_text_ref.fillna("\0")
    mism = joined[a != b]
    assert len(mism) == 0, mism[["url", "scrubbed_text", "scrubbed_text_ref"]].head()


def test_scrub_actually_scrubs(joined):
    changed = joined[
        joined.scrubbed_text.notna()
        & (joined.scrubbed_text != joined.text_extracted)
    ]
    assert len(changed) > 0
    blob = "".join(changed.scrubbed_text)
    assert "<EMAIL>" in blob and "<PHONE>" in blob and "<IP>" in blob


def _eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


QA_FIELDS = [
    ("heuristics", "n_chars", "qa_n_chars"),
    ("heuristics", "symbol_ratio", "qa_symbol_ratio"),
    ("heuristics", "n_words", "qa_n_words"),
    ("heuristics", "mean_word_len", "qa_mean_word_len"),
    ("heuristics", "dup_line_fraction", "qa_dup_line_fraction"),
    ("heuristics", "stopword_fraction", "qa_stopword_fraction"),
    ("langid", "lang", "qa_detected_lang"),
    ("langid", "confidence", "qa_langid_confidence"),
    ("perplexity", "avg_nll", "qa_avg_nll"),
]


def test_qa_metrics_match(joined):
    bad = []
    for _, row in joined.iterrows():
        qa = row["qa"]
        for stage, field, ref_col in QA_FIELDS:
            got = qa[stage][field] if qa is not None else None
            want = row[ref_col]
            if isinstance(want, float) and pd.isna(want) and not isinstance(got, float):
                want = None
            if got is not None and isinstance(got, float) and pd.isna(got) and want is None:
                got = None
            if isinstance(want, float) and isinstance(got, int):
                got = float(got)
            if isinstance(want, int) and isinstance(got, int):
                pass
            if not _eq(got, want):
                bad.append((row["url"], stage, field, got, want))
    assert not bad, bad[:10]


def test_unicode_regex_classes_agree_across_stacks(spark):
    """The RE_FLAGS (re.ASCII) contract: \\d/\\s/\\b must mean the
    same thing in the Python kernel/oracle as in Catalyst (Java regex)
    and DuckDB (RE2), which are ASCII by default. Probe with the two
    divergence cases the review found: an IP in Arabic-Indic digits
    (Python-Unicode \\d would scrub it, Java/RE2 never can) and
    nbsp-laced text (Python-Unicode \\s would exempt \\xa0 from the
    symbol count, Java/RE2 count it)."""
    from pyspark.sql import functions as F

    from eugl_spark import oracle
    from eugl_spark.functions import heuristics as H
    from eugl_spark.functions.scrub import scrub

    texts = [
        "server at \u0661\u0669\u0662.\u0661\u0666\u0668.\u0660.\u0661 down",
        "plain at 192.168.0.1 down",
        "nbsp\xa0seams\xa0everywhere\xa0here",
        "email x@y.com and tel +1 555 0100 123",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = (
        df.select(
            "text",
            scrub(F.col("text")).alias("scrubbed"),
            H.symbol_ratio(F.col("text")).alias("symr"),
        )
        .toPandas()
        .set_index("text")
    )
    for t in texts:
        assert got.loc[t, "scrubbed"] == oracle.scrub_text(t), t
        want_symr = len(oracle._SYMBOL.findall(t)) / len(t)
        assert got.loc[t, "symr"] == pytest.approx(want_symr), t
