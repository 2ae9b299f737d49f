"""Unicode normalization (qf_normalize_unicode + textnorm kernel):
repair round-trip, fault isolation, signature counting, and
Spark↔DuckDB parity on a hard micro corpus."""

from __future__ import annotations

import unicodedata
import unittest.mock as mock

import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import eugl_spark.plans.queries as Q
from eugl_spark.corpus import generate_unicode_docs
from eugl_spark.models.textnorm import (
    MOJIBAKE_SEQS,
    _mojibake,
    count_mojibake,
    repair_mojibake,
)
from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY

CLEAN = [
    "it’s a “café” – naïve… résumé",
    "señor – ¡déjà vu! «quoted»",
    "plain ascii stays plain ascii.",
    "temperature 20° and price 5€",
]


def test_repair_round_trip():
    forged = pd.Series([_mojibake(c) for c in CLEAN[:2]])
    assert list(repair_mojibake(forged)) == CLEAN[:2]


def test_repair_leaves_clean_text_alone():
    s = pd.Series(CLEAN + [None, ""])
    out = repair_mojibake(s)
    assert list(out.fillna("∅")) == list(s.fillna("∅"))


def test_repair_fault_isolation_unencodable():
    # a signature PLUS a char outside latin-1: reverse round trip
    # cannot encode → row returned unchanged, no exception
    broken = "cafÃ© 한국어"
    assert repair_mojibake(pd.Series([broken]))[0] == broken


def test_repair_requires_strict_improvement():
    # 'Ã' alone: latin-1-encodable and utf-8-UNdecodable alone, but
    # with a trailing copyright char the round trip decodes to a
    # string that still carries a signature count >= original → must
    # stay unchanged rather than churn
    s = "Ã©" * 1  # repairs to 'é' (1 sig → 0): changed
    assert repair_mojibake(pd.Series([s]))[0] == "é"


def test_count_matches_python_reference():
    forged = _mojibake("it’s “x” – …")
    assert count_mojibake(forged) == 5  # ’ “ ” – …
    assert count_mojibake("it’s “x” – …") == 0
    assert count_mojibake(None) == 0


def test_signatures_sorted_longest_first():
    lens = [len(s) for s in MOJIBAKE_SEQS]
    assert lens == sorted(lens, reverse=True)


MICRO = [
    (0, None),
    (1, ""),
    (2, unicodedata.normalize("NFD", "Åström försök")),  # ring+umlaut NFD
    (3, "\x00\x01\x02\x03\x04\x05\x06\x07\x08\x0b\x0c"
        "\x0e\x0f\x10\x1f\x7f"),  # every stripped control char
    (4, "\t\n\r kept whitespace \t"),  # tab/newline/CR NOT stripped
    (5, "​‌‍﻿"),  # only zero-width: clean_len 0
    (6, _mojibake("… – “nested” ’quotes’")),
    (7, "q̃ combining-only mark"),  # no precomposed form: NFC no-op
    (8, unicodedata.normalize("NFD", "한국어") + " jamo"),
    (9, "mixed " + unicodedata.normalize("NFD", "é") + "\x1f​"
        + _mojibake("ç")),
]


@pytest.fixture(scope="module")
def micro_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("unicode") / "micro.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "url": f"https://u.example/{i}", "text": t}
             for i, t in MICRO],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("text", pa.string())]
            ),
        ),
        path,
    )
    return path


def test_micro_corpus_parity(spark, micro_path):
    with mock.patch.object(Q, "ensure_unicode_docs", lambda: micro_path):
        got = REGISTRY["qf_normalize_unicode"].spark(spark, "").toPandas()
    con = duckdb.connect()
    want = con.sql(Q._normalize_unicode_sql(micro_path)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]
    rows = {int(r.doc_id): r for r in got.itertuples()}
    assert rows[3].n_ctrl == 16 and rows[3].clean_len == 0
    assert rows[4].n_ctrl == 0  # \t \n \r survive
    assert rows[5].n_zw == 4 and rows[5].clean_len == 0
    assert rows[6].mojibake_hits == 6
    assert rows[7].nfc_changed == 0
    assert rows[2].nfc_changed == 1 and rows[8].nfc_changed == 1
    assert rows[9].nfc_changed == 1 and rows[9].n_ctrl == 1
    assert rows[9].n_zw == 1 and rows[9].mojibake_hits == 1


def test_fuzz_parity_200_random_docs(spark, tmp_path):
    """200 random strings over the stable alphabet (Latin + combining
    marks + Hangul + curly punctuation + controls + zero-width +
    mojibake fragments) through BOTH engines — guards the NFC parity
    claim (unicodedata vs utf8proc) beyond the hand cases."""
    import numpy as np

    rng = np.random.RandomState(662)
    FRAGS = (
        ["plain", "word", "tail."]
        + ["café", "naïve", "señor", "Åström"]
        + [unicodedata.normalize("NFD", s) for s in ("café", "Åström", "한국어")]
        + ["한국어", "q̃x", "ȩ́"]  # stacked combining marks
        + ["it’s", "“quoted”", "–", "…"]
        + ["\x00", "\x07", "\x1f", "\x7f", "\t", "\n"]
        + ["​", "‌", "﻿"]
        + [_mojibake(s) for s in ("é", "’", "“x”", "…")]
    )
    docs = []
    for i in range(200):
        n = int(rng.randint(0, 30))
        s = " ".join(FRAGS[int(rng.randint(0, len(FRAGS)))] for _ in range(n))
        docs.append({"doc_id": i, "url": f"https://z.example/{i}", "text": s})
    path = str(tmp_path / "fuzz.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            docs,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("text", pa.string())]
            ),
        ),
        path,
    )
    with mock.patch.object(Q, "ensure_unicode_docs", lambda: path):
        got = REGISTRY["qf_normalize_unicode"].spark(spark, "").toPandas()
    con = duckdb.connect()
    want = con.sql(Q._normalize_unicode_sql(path)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]
    assert got["nfc_changed"].sum() > 0  # non-vacuous


def test_generator_deterministic_and_covering():
    a = generate_unicode_docs(120, seed=29)
    b = generate_unicode_docs(120, seed=29)
    assert a.equals(b)
    assert a["text"].isna().sum() == 10  # case 7 of 12
    assert (a["text"] == "").sum() == 10  # case 8
