"""qf_script_profile semantics on hand docs: per-script counts,
dominant-script selection (first-of-max, deterministic), ratio, and
the none cases (empty/null/digits/emoji)."""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

import eugl_spark.plans.queries as Q
from eugl_spark.plans.queries import REGISTRY


def _run(spark, docs):
    path = os.path.join(tempfile.mkdtemp(), "script_hand.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "url": f"u{i}", "text": t}
             for i, t in enumerate(docs)],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("text", pa.string())]
            ),
        ),
        path,
    )
    orig = Q.ensure_script_docs
    Q.ensure_script_docs = lambda: path
    try:
        return {
            r["doc_id"]: r
            for r in REGISTRY["qf_script_profile"].spark(spark, "").collect()
        }
    finally:
        Q.ensure_script_docs = orig


def test_script_profile_hand_docs(spark):
    rows = _run(
        spark,
        [
            "hello world",                      # 0: pure latin
            "привет мир",                       # 1: pure cyrillic
            "你好世界 こんにちは",               # 2: cjk (han + kana)
            "hello привет",                     # 3: 5 latin vs 6 cyrillic
            "12345 !!! ...",                    # 4: no letters
            "🎉🚀",                             # 5: emoji only
            None,                               # 6: null
            "",                                 # 7: empty
            "ab ба",                            # 8: 2-2 TIE → first-of-max
        ],
    )
    assert rows[0]["dominant_script"] == "latin"
    assert rows[0]["n_latin"] == 10 and rows[0]["n_chars"] == 11
    assert rows[1]["dominant_script"] == "cyrillic"
    assert rows[2]["dominant_script"] == "cjk"
    assert rows[2]["n_cjk"] == 9
    assert rows[3]["dominant_script"] == "cyrillic"
    assert abs(rows[3]["dominant_ratio"] - 6 / 11) < 1e-6
    for i in (4, 5, 6, 7):
        assert rows[i]["dominant_script"] == "none", i
        assert rows[i]["dominant_ratio"] == 0.0
    # emoji are counted in n_chars (code points) but no script class
    assert rows[5]["n_chars"] == 2 and rows[5]["n_latin"] == 0
    # deterministic tie: class order is the contract (latin first)
    assert rows[8]["dominant_script"] == "latin"
    assert rows[8]["dominant_ratio"] == 0.5
