"""Pathological-pages golden corpus (reference anchor: the
problem-dataset idea in
/root/reference/testing/fmask-generate-test-data.py:52-55 — curate the
inputs that historically break pipelines and pin their outputs).

Hard documents: 0/1/2-token, all-symbol, whitespace-only, a 10 MB doc,
mixed-script, emoji, control chars, broken-UTF-8 html, null url,
malformed url, null both. Invariants:

* engine == pandas oracle per row (keep, drop_reason, extracted and
  scrubbed text byte-identical) — nothing throws;
* a pinned sha256 snapshot of the full verdict table (any semantic
  drift trips it; recompute recipe in the assert message);
* the dedup/token registry queries run on a pathological documents
  table and still hash-match their DuckDB oracle SQL.
"""

from __future__ import annotations

import hashlib
import os
from datetime import datetime

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eugl_spark.oracle import label_frame
from eugl_spark.pipeline import apply_pipeline
from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY

TS = datetime(2024, 6, 1, 0, 0, 0)

# (name, url, html, text) — deterministic, no RNG
PATHOLOGICAL = [
    ("zero_token", "https://p.example/zero", None, ""),
    ("one_token", "https://p.example/one", None, "hello"),
    ("two_token", "https://p.example/two", None, "the cat"),
    ("all_symbol", "https://p.example/sym", None, "!@#$%^&*()[]{}<>~`|\\" * 40),
    ("whitespace_only", "https://p.example/ws", None, " \t\n\x0b  \n\n\r "),
    (
        "huge_10mb",
        "https://p.example/huge",
        None,
        "the quick brown fox jumps over the lazy dog near the river bank "
        * 160_000,  # ~10.4 MB
    ),
    (
        "mixed_script",
        "https://p.example/mixed",
        None,
        "the cat sat on the mat но кот сидел на коврике 猫はマットの上に座った "
        "and then it was the best of times for all of them",
    ),
    (
        "emoji",
        "https://p.example/emoji",
        None,
        "i love 🍕🍕🍕 pizza 🎉 and the day was good 😀 with many of the "
        "best things that we could have",
    ),
    ("long_single_token", "https://p.example/longtok", None, "a" * 100_000),
    ("repeated_word", "https://p.example/rep", None, "spam " * 500),
    (
        "control_chars",
        "https://p.example/ctrl",
        None,
        "hello\x00world\x01\x02 the end of the line and the start of it",
    ),
    (
        "broken_utf8_html",
        "https://p.example/badutf8",
        b"<html><body><p>caf\xe9 \xff\xfe broken bytes but the text is here "
        b"and it is one of the best</p></body></html>",
        None,
    ),
    ("null_both", "https://p.example/nullboth", None, None),
    (
        "html_ok",
        "https://p.example/htmlok",
        "<html><head><title>t</title></head><body><p>the day was good and "
        "we had the best of the time with all of them there</p>"
        "<script>var x = 1;</script></body></html>".encode(),
        None,
    ),
    ("malformed_url", "not a url at all %%% ::", None, "the cat sat on the mat"),
    (None, None, None, "the dog ran over the hill and it was a good day"),
]

GOLDEN_SHA = "5ba360dbbdbc7d0dfd70e21335a632e34463d646e5e35e2a5061bc01f1070f14"


def _pages_pdf() -> pd.DataFrame:
    return pd.DataFrame(
        {
            "url": [u for _, u, _, _ in PATHOLOGICAL],
            "warc_ts": [TS] * len(PATHOLOGICAL),
            "html": [h for _, _, h, _ in PATHOLOGICAL],
            "text": [t for _, _, _, t in PATHOLOGICAL],
            "lang": ["en"] * len(PATHOLOGICAL),
        }
    )


def _write_pages(path: str) -> str:
    pdf = _pages_pdf()
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, schema=schema, preserve_index=False), path
    )
    return path


def _digest(df: pd.DataFrame) -> str:
    key = df.url.fillna("\x00<null-url>")
    df = df.assign(_k=key).sort_values("_k")
    blob = "\x1e".join(
        f"{k}\x1f{r.keep}\x1f{r.drop_reason or ''}\x1f{r.text_extracted or ''}"
        f"\x1f{r.scrubbed_text or ''}"
        for k, r in zip(df._k, df.itertuples(index=False))
    )
    return hashlib.sha256(blob.encode()).hexdigest()


@pytest.fixture(scope="module")
def path_out(spark, tmp_path_factory) -> pd.DataFrame:
    p = _write_pages(str(tmp_path_factory.mktemp("patho") / "pages.parquet"))
    return (
        apply_pipeline(spark.read.parquet(p))
        .select("url", "keep", "drop_reason", "text_extracted", "scrubbed_text")
        .toPandas()
    )


def test_engine_matches_oracle_on_pathological(path_out):
    want = label_frame(_pages_pdf()[["url", "html", "text"]])
    got = path_out.copy()
    k = lambda s: s.fillna("\x00<null-url>")  # noqa: E731
    got = got.assign(_k=k(got.url)).sort_values("_k").reset_index(drop=True)
    want = want.assign(_k=k(want.url)).sort_values("_k").reset_index(drop=True)
    assert got.keep.tolist() == want.keep.tolist()
    assert got.drop_reason.fillna("").tolist() == want.drop_reason.fillna("").tolist()
    assert (
        got.text_extracted.fillna("").tolist()
        == want.text_extracted.fillna("").tolist()
    ), "extracted text must be byte-identical"
    assert (
        got.scrubbed_text.fillna("").tolist()
        == want.scrubbed_text.fillna("").tolist()
    ), "scrubbed text must be byte-identical"


def test_pathological_golden_snapshot(path_out):
    got = _digest(path_out)
    assert got == GOLDEN_SHA, (
        "pathological verdicts changed; if intentional set GOLDEN_SHA to: "
        + got
    )


# documents-table twin: same hard texts (10 MB doc trimmed to 1 MB —
# the DuckDB oracle re-tokenizes it per query and this is a unit test),
# plus exact-dup and near-dup planted pairs so the dedup family has
# real work to do on pathological input
_DOC_TEXTS = [
    (i, t if (t is None or len(t) < 2_000_000) else t[:1_000_000])
    for i, (_, _, _, t) in enumerate(PATHOLOGICAL)
]
_DOC_TEXTS += [
    (100, "spam " * 500),  # exact dup of repeated_word
    (101, ("spam " * 499) + "eggs"),  # near-dup of repeated_word
    (102, "a" * 100_000),  # exact dup of long_single_token
]

_DOC_QUERIES = [
    "dedup_remove_spans",
    "qf_ppl_buckets",
    "qf_repetition_profile",
    "dsir_importance",
    "decontaminate_bloom",
    "dedup_exact",
    "dedup_minhash_bands",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_clusters_lsh",
    "dedup_ngram_jaccard",
    "corpus_token_budget",
    "text_bpe_token_stats",
    "corpus_mixture_sample",
    "corpus_upsample_epochs",
    "corpus_host_diversity",
    "text_tfidf_top_terms",
    "text_top_bigrams",
    "qf_verdict",
    "qf_token_stats",
    "qf_fingerprint",
    "qf_linear_score",
    "qf_score_calibration",
    "split_train_val_test",
    "decontaminate_train",
    "udf_langid_documents",
    "udf_perplexity_documents",
    "qf_scrub",
    "qf_drop_reason_dist",
    "qf_keep_rate_by_source",
    "qf_quality_score",
    "qf_train_linear",
    "pipeline_docs_verdict",
    # round-5 additions: trained BPE over the hard corpus (emoji /
    # mixed-script / control-char / 10 MB docs exercise the doubled-
    # separator encoding and the separator-exclusion filter)
    "bpe_train_merges",
    "bpe_apply_token_stats",
    # round-6 session 2: sequence packing (prefix-sum offsets over the
    # hard corpus — 10 MB single-token docs span many sequences, empty
    # and null docs must vanish before the stream forms)
    "corpus_pack_sequences",
    # round-6 session 3: shuffle-shard composes the packing oracle
    # (10 MB docs → many sequences per doc); the datasheet's lang
    # coalesce meets the fixture's null-lang family head-on
    "corpus_shard_sequences",
    "corpus_datasheet",
    "corpus_pack_payload",
    # fuzzy decon: the hard corpus' dup families + null-source docs
    # exercise the cross-split band join and the null-split hash
    "decontaminate_fuzzy",
]


@pytest.fixture(scope="module")
def patho_docs_dir(tmp_path_factory) -> str:
    return _write_patho_docs(tmp_path_factory, _DOC_TEXTS, "patho_docs")


# the SQL model oracles (langid trigram LUT, perplexity bigrams)
# re-derive the models as million-element list ops in DuckDB — on the
# 1 MB doc that single ORACLE query costs ~7 min (the numpy kernel
# side is <1 s). Those two queries run on a twin corpus whose huge doc
# is trimmed to 100 KB: every hard CASE survives, only the
# oracle-side scale grind goes.
_MODEL_ORACLE_QUERIES = {
    "qf_ppl_buckets",
    "udf_langid_documents",
    "udf_perplexity_documents",
    "pipeline_docs_verdict",  # embeds both SQL models in its oracle
    # DuckDB's chained regexp_replace costs ~3 min on the 1 MB doc;
    # scrub-at-scale byte identity is pinned by the PIPELINE
    # pathological test (Python oracle, full 10 MB doc)
    "qf_scrub",
    # the BPE oracles symbolize every doc with a per-char global
    # regexp_replace — linear, but DuckDB pays ~minutes on the 10 MB
    # doc; every hard CASE survives on the 100 KB twin
    "bpe_train_merges",
    "bpe_apply_token_stats",
}
_DOC_TEXTS_SMALL = [
    (i, t if (t is None or len(t) <= 100_000) else t[:100_000])
    for i, t in _DOC_TEXTS
]


@pytest.fixture(scope="module")
def patho_docs_small_dir(tmp_path_factory) -> str:
    return _write_patho_docs(
        tmp_path_factory, _DOC_TEXTS_SMALL, "patho_docs_small"
    )


def _write_patho_docs(tmp_path_factory, texts, name) -> str:
    d = str(tmp_path_factory.mktemp(name))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([i for i, _ in texts], pa.int64()),
                "text": pa.array([t for _, t in texts], pa.string()),
                # a NULL-lang family (the corpus generator emits null
                # langs): every lang-consuming op — the DSIR target
                # filter, the ppl-bucket partition, the verdict chain —
                # must treat null-lang docs identically in both
                # engines, not drop or null-propagate them (the
                # qf_ppl_buckets equi-join drop was exactly this bug)
                "lang": pa.array(
                    [None if i % 7 == 2 else "en" for i, _ in texts],
                    pa.string(),
                ),
                # one source family carries a 14-digit numeric suffix
                # (> 2^31): the mixture-weight rule extracts and casts
                # the trailing digit run, and a plain INT cast aborts
                # under ANSI / errors in DuckDB — try_cast must degrade
                # it to the default weight in BOTH engines (ADVICE r3).
                # A third family is NULL: every per-source op (split
                # hash, budget window, host diversity, the verdict
                # url) must treat null-source docs identically in both
                # engines, not drop or null-propagate them
                "source": pa.array(
                    [
                        ["s0", "crawl-20240101120000", None][i % 3]
                        for i, _ in texts
                    ],
                    pa.string(),
                ),
                "n_chars": pa.array(
                    [len(t) if t else 0 for _, t in texts], pa.int64()
                ),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )
    return d


@pytest.mark.parametrize("name", _DOC_QUERIES)
def test_dedup_family_on_pathological_docs(
    spark, patho_docs_dir, patho_docs_small_dir, name
):
    q = REGISTRY[name]
    assert q.sql, f"{name} has no oracle SQL"
    d = (
        patho_docs_small_dir
        if name in _MODEL_ORACLE_QUERIES
        else patho_docs_dir
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    res = compare_frames(q.spark(spark, d).toPandas(), con.sql(q.sql).df())
    assert res["values_match"], (name, res["diff"])
