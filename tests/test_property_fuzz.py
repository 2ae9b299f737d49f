"""Property-based fuzz: the Arrow kernel must equal the oracle on
ARBITRARY input, not just the synthetic corpus (goes beyond the
reference, which has no randomized testing — SURVEY.md §5).

qa_batch (the engine's kernel) vs oracle.label_row, row by row, over
hypothesis-generated text/html including unicode, control chars,
pathological whitespace, near-threshold lengths."""

from __future__ import annotations

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from eugl_spark import constants as C
from eugl_spark.models.doc_kernel import qa_batch
from eugl_spark.oracle import label_row

text_st = st.one_of(
    st.none(),
    st.text(max_size=400),
    st.text(
        alphabet=st.sampled_from(
            list("abcdefghijklmnopqrstuvwxyz @.\n\t0123456789+-<>&")
        ),
        max_size=600,
    ),
    # vocabulary-flavored text (hits langid/ppl paths)
    st.lists(
        st.sampled_from(C.WORDS["en"] + C.WORDS["de"] + ("@", "10.0.0.1", "grobnak")),
        max_size=80,
    ).map(" ".join),
)
html_st = st.one_of(
    st.none(),
    st.binary(max_size=300),
    st.text(max_size=300).map(
        lambda t: f"<html><body><p>{t}</p></body></html>".encode()
    ),
)


def _eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def _norm(v):
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    return v


FIELDS = [
    ("text_extracted", "text_extracted"),
    ("scrubbed_text", "scrubbed_text"),
    ("n_chars", "qa_n_chars"),
    ("symbol_ratio", "qa_symbol_ratio"),
    ("n_words", "qa_n_words"),
    ("mean_word_len", "qa_mean_word_len"),
    ("dup_line_fraction", "qa_dup_line_fraction"),
    ("stopword_fraction", "qa_stopword_fraction"),
    ("lang", "qa_detected_lang"),
    ("confidence", "qa_langid_confidence"),
    ("avg_nll", "qa_avg_nll"),
]


@settings(max_examples=300, deadline=None)
@given(text=text_st, html=html_st)
def test_kernel_matches_oracle(text, html):
    got = qa_batch(
        pd.Series([text], dtype=object), pd.Series([html], dtype=object)
    ).iloc[0]
    want = label_row("u", html, text)
    for kf, of in FIELDS:
        g, w = _norm(got[kf]), _norm(want[of])
        if isinstance(g, float) and isinstance(w, int):
            w = float(w)
        # oracle sets detected_lang 'und' where kernel may not reach it
        assert _eq(g, w), (kf, g, w, repr(text)[:80], repr(html)[:60])


@settings(max_examples=100, deadline=None)
@given(
    texts=st.lists(text_st, min_size=1, max_size=12),
)
def test_kernel_batch_consistency(texts):
    """Batching must not change per-row results (vectorization safety)."""
    htmls = [None] * len(texts)
    batch = qa_batch(
        pd.Series(texts, dtype=object), pd.Series(htmls, dtype=object)
    )
    for i, t in enumerate(texts):
        solo = qa_batch(
            pd.Series([t], dtype=object), pd.Series([None], dtype=object)
        ).iloc[0]
        for kf, _ in FIELDS:
            assert _eq(_norm(batch.iloc[i][kf]), _norm(solo[kf])), (
                i, kf, batch.iloc[i][kf], solo[kf], repr(t)[:80],
            )
