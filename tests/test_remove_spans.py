"""Exact-substring REMOVAL (dedup_remove_spans): the act half of the
span-coverage profile.

Contract pinned here:
* profile/removal agreement — kept_tokens == n_tokens - covered_tokens
  row for row (both halves share _span_tk_hits, so they cannot
  disagree about WHICH spans are duplicated);
* clean_text is exactly the kept tokens in document order (token
  count of clean_text == kept_tokens; a doc with no duplicated spans
  round-trips its full normalized token stream);
* a sentence duplicated across two docs is cut from BOTH occurrences
  (Lee et al. 2022 drop-all-copies semantics), unique text survives;
* fully-duplicated docs collapse to the empty string, short docs
  (< n tokens, gram guard) and empty docs pass through untouched.

DuckDB value parity runs in tests/test_entry.py (registry sweep) and
on the hard corpus in tests/test_pathological_pages.py.
"""

from __future__ import annotations

import pandas as pd

from eugl_spark.plans.queries import (
    _SPAN_N,
    remove_spans_from,
    span_coverage_from,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text"])
    )


_DUP = "the quick brown fox jumps over the lazy sleeping dog tonight"
_UNIQ_A = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
_UNIQ_B = "one two three four five six seven eight nine ten eleven"


def test_profile_and_removal_agree(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    prof = span_coverage_from(docs).toPandas().set_index("doc_id")
    rem = remove_spans_from(docs).toPandas().set_index("doc_id")
    assert set(prof.index) == set(rem.index)
    j = prof.join(rem, lsuffix="_p")
    assert (j["n_tokens_p"] == j["n_tokens"]).all()
    assert (j["kept_tokens"] == j["n_tokens"] - j["covered_tokens"]).all()
    assert (j["removed_tokens"] == j["covered_tokens"]).all()
    # clean_text token count == kept_tokens (split of '' is [] here
    # because kept tokens are non-empty alphabetic runs)
    n_clean = rem["clean_text"].map(lambda t: len(t.split()))
    assert (n_clean == rem["kept_tokens"]).all()


def test_duplicated_sentence_cut_from_both_docs(spark):
    docs = _docs(
        spark,
        [
            (1, f"{_UNIQ_A} {_DUP}"),
            (2, f"{_DUP} {_UNIQ_B}"),
        ],
    )
    out = (
        remove_spans_from(docs)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # the 11-word duplicated sentence spans 4 duplicated 8-grams; its
    # 11 positions are covered in BOTH docs, the unique 10-word
    # prefixes/suffixes survive verbatim
    assert out.loc[1, "clean_text"] == _UNIQ_A
    assert out.loc[2, "clean_text"] == _UNIQ_B
    assert (out["removed_tokens"] == 11).all()


def test_identical_docs_collapse_to_empty(spark):
    docs = _docs(spark, [(1, _DUP), (2, _DUP)])
    out = remove_spans_from(docs).toPandas()
    assert (out["clean_text"] == "").all()
    assert (out["kept_tokens"] == 0).all()


def test_unique_docs_roundtrip_and_short_doc_guard(spark):
    short = "only seven words live in this doc"  # 7 < _SPAN_N
    assert len(short.split()) == _SPAN_N - 1
    docs = _docs(spark, [(1, _UNIQ_A), (2, short), (3, "")])
    out = remove_spans_from(docs).toPandas().set_index("doc_id")
    assert out.loc[1, "clean_text"] == _UNIQ_A
    assert out.loc[2, "clean_text"] == short
    assert (out["removed_tokens"] == 0).all()
    assert out.loc[3, "n_tokens"] == 0
    assert out.loc[3, "clean_text"] == ""


def test_intra_doc_repetition_removed(spark):
    # the same 8-gram twice WITHIN one doc is duplication too
    docs = _docs(spark, [(1, f"{_UNIQ_A} {_UNIQ_A}")])
    out = remove_spans_from(docs).toPandas()
    assert out.loc[0, "n_tokens"] == 20
    assert out.loc[0, "kept_tokens"] == 0  # every position covered
    assert out.loc[0, "clean_text"] == ""
