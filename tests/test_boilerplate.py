"""Boilerplate block classification (qf_boilerplate_blocks): the
hand-computed contract corpus, the promotion semantics, the damage
classes, and Spark↔DuckDB hash parity on all of them.

Contract under test (plans/queries.py, the shared rule text):
  bad  if len < 30 OR 3*lch > len
  good if len >= 80 AND 20*lch <= 3*len
  near otherwise; near promotes iff an ADJACENT RAW class is good.
"""

from __future__ import annotations

import unittest.mock as mock

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import eugl_spark.plans.queries as Q
from eugl_spark.corpus import generate_boiler_docs
from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY

G = "g" * 100  # a guaranteed-good block body
N = "n" * 50  # a guaranteed-near block body (30 <= 50 < 80, no links)

MICRO = [
    # (doc_id, html) — expectations asserted by doc_id below
    (0, "<p>" + "a" * 100 + "</p>"),  # single good block
    (1, '<div><a href="/">Home</a> <a href="/b">About</a></div>'),  # nav
    (2, f"<p>{G}</p><p>{N}</p>"),  # near beside good → promoted
    (3, f"<p>{N}</p>"),  # isolated near → demoted
    # promotion does NOT chain: [near, near, good] → only the middle
    # near (adjacent to the good) promotes; the first stays bad
    (4, f"<p>{'x' * 50}</p><p>{'y' * 50}</p><p>{G}</p>"),
    # UPPERCASE anchor counts as link text (case-insensitive contract):
    # the <A> block is link-dense → bad, NOT near-promoted-by-neighbor
    (5, f'<p>{G}</p><div><A HREF="/x">{"t" * 40}</A></div>'),
    (6, "w" * 90),  # tagless page: one chunk, still content
    (7, None),  # null html
    (8, ""),  # empty html
    # entity decode happens BEFORE the length test: '&amp;' counts as
    # 1 char → 13+3+13=29 < 30 → bad. Undecoded (33 chars) it would be
    # near and promote off the good neighbor.
    (9, f"<p>{G}</p><p>{'a' * 13} &amp; {'b' * 13}</p>"),
    # CRLF + runs of whitespace collapse to single spaces
    (10, "<p>aa\r\n\t bb" + " cc" * 40 + "</p>"),
    # nested inline tags inside a block strip cleanly
    (11, f"<p><b>bold</b> <i>ital</i> {G}</p>"),
    # anchor with no closing </a> before the block tag: group [^<]*
    # can't cross a tag → 0 link chars, deterministic in both engines
    (12, f"<p><a href='/x'>{G}</p>"),
    # empty anchors contribute 0 link chars
    (13, f'<p><a href="/x"></a>{G}</p>'),
    # huge block (50k chars) — no pathological blowup
    (14, "<p>" + "h" * 50000 + "</p>"),
    # 200-anchor link farm
    (15, "<div>" + "".join(f'<a href="/{j}">w{j}</a>' for j in range(200))
         + "</div>"),
    # '>' inside a quoted attribute ends the tag early (documented
    # regex-not-parser contract; both engines agree byte-for-byte)
    (16, f'<p><a href="/x" title="a>b">t</a> {G}</p>'),
]


@pytest.fixture(scope="module")
def micro_path(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("boiler") / "micro.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [{"doc_id": i, "url": f"https://m.example/{i}", "html": h}
             for i, h in MICRO],
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("html", pa.string())]
            ),
        ),
        path,
    )
    return path


@pytest.fixture(scope="module")
def micro_rows(spark, micro_path):
    import unittest.mock as mock

    with mock.patch.object(Q, "ensure_boiler_docs", lambda: micro_path):
        rows = REGISTRY["qf_boilerplate_blocks"].spark(spark, "").collect()
    return {r["doc_id"]: r for r in rows}


def test_single_good_block(micro_rows):
    r = micro_rows[0]
    assert (r["n_blocks"], r["n_good_raw"], r["n_content"]) == (1, 1, 1)
    assert r["content_text"] == "a" * 100
    assert r["content_chars"] == 100


def test_nav_is_boilerplate(micro_rows):
    r = micro_rows[1]
    assert r["n_content"] == 0 and r["content_text"] == ""


def test_near_promotes_beside_good(micro_rows):
    r = micro_rows[2]
    assert (r["n_good_raw"], r["n_promoted"], r["n_content"]) == (1, 1, 2)
    assert r["content_text"] == G + "\n" + N
    assert r["content_chars"] == 150


def test_isolated_near_demotes(micro_rows):
    assert micro_rows[3]["n_content"] == 0


def test_promotion_does_not_chain(micro_rows):
    r = micro_rows[4]
    assert (r["n_blocks"], r["n_good_raw"], r["n_promoted"]) == (3, 1, 1)
    assert r["content_text"] == "y" * 50 + "\n" + G


def test_uppercase_anchor_counts_as_link(micro_rows):
    r = micro_rows[5]
    assert r["n_content"] == 1  # the <A>-farm block is bad, not near
    assert r["content_text"] == G


def test_tagless_page_is_one_content_block(micro_rows):
    r = micro_rows[6]
    assert (r["n_blocks"], r["n_content"]) == (1, 1)


def test_null_and_empty_html(micro_rows):
    for i in (7, 8):
        r = micro_rows[i]
        assert (r["n_blocks"], r["n_content"], r["content_chars"]) == (0, 0, 0)
        assert r["content_text"] == ""


def test_entity_decodes_before_length_gate(micro_rows):
    assert micro_rows[9]["n_content"] == 1


def test_whitespace_collapse(micro_rows):
    r = micro_rows[10]
    assert r["content_text"] == "aa bb" + " cc" * 40
    assert "\r" not in r["content_text"]


def test_nested_inline_tags_strip(micro_rows):
    assert micro_rows[11]["content_text"] == f"bold ital {G}"


def test_link_farm_rejected(micro_rows):
    assert micro_rows[15]["n_content"] == 0


def test_huge_block_kept(micro_rows):
    r = micro_rows[14]
    assert r["n_content"] == 1 and r["content_chars"] == 50000


def test_micro_corpus_parity(spark, micro_path):
    """The full driver-gate comparison (rows + columns + values) on the
    micro corpus — including the regex-not-parser edge docs 12/13/16."""
    import unittest.mock as mock

    with mock.patch.object(Q, "ensure_boiler_docs", lambda: micro_path):
        got = REGISTRY["qf_boilerplate_blocks"].spark(spark, "").toPandas()
    con = duckdb.connect()
    want = con.sql(Q._boiler_blocks_sql(micro_path)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]
    assert len(got) == len(MICRO)


def test_clean_corpus_parity_on_micro(spark, micro_path):
    """The composed capstone (boiler → NFC → C4 lines) through the
    driver gate on the micro corpus."""
    with mock.patch.object(Q, "ensure_boiler_docs", lambda: micro_path):
        got = REGISTRY["qf_clean_corpus"].spark(spark, "").toPandas()
    con = duckdb.connect()
    want = con.sql(Q._clean_corpus_sql(micro_path)).df()
    res = compare_frames(got, want)
    assert res["values_match"], res["diff"]


def test_clean_corpus_reasons_on_fixture(spark):
    """Every doc gate fires on the committed fixture: KEEP, brace,
    lorem_ipsum, no_content, too_few_sentences all present; kept
    clean_text never carries markup or boilerplate anchors."""
    got = REGISTRY["qf_clean_corpus"].spark(spark, "").toPandas()
    reasons = set(got["clean_reason"])
    assert reasons == {
        "KEEP", "brace", "lorem_ipsum", "no_content", "too_few_sentences"
    }
    kept = got[got.clean_reason == "KEEP"]["clean_text"]
    assert len(kept) > 50
    assert not kept.str.contains("<").any()
    assert not kept.str.contains("Home About Contact", regex=False).any()


def _fuzz_html(rng) -> str:
    """Random tag soup stressing the shared regex contract: split tags
    in mixed case, unclosed/nested/empty anchors, '>' inside quoted
    attributes, entities, CRLF / \\x0B / tab whitespace, unicode."""
    TAGS = ["p", "div", "li", "h1", "h2", "h3", "span", "b", "table"]
    WORDS = ["alpha", "beta", "gamma", "delta", "käse", "ón", "word"]
    parts = []
    for _ in range(int(rng.randint(1, 30))):
        r = int(rng.randint(0, 10))
        tag = TAGS[int(rng.randint(0, len(TAGS)))]
        if int(rng.randint(0, 2)):
            tag = tag.upper()
        words = " ".join(
            WORDS[int(rng.randint(0, len(WORDS)))]
            for _ in range(int(rng.randint(0, 25)))
        )
        if r < 4:
            parts.append(f"<{tag}>{words}</{tag}>")
        elif r == 4:
            parts.append(f"<{tag}>{words}")  # unclosed
        elif r == 5:
            parts.append(f'<a href="/x/{int(rng.randint(99))}">{words}</a>')
        elif r == 6:
            parts.append(f'<A HREF="/y" title="a>b">{words}</A>')
        elif r == 7:
            parts.append(f"<{tag}>{words} &amp; more &amp;</{tag}>")
        elif r == 8:
            parts.append("<a>" + words)  # anchor never closed
        else:
            parts.append(words)
        ws = ["\n", "\r\n", "\t", "\x0b", " ", ""]
        parts.append(ws[int(rng.randint(0, len(ws)))])
    return "".join(parts)


def test_fuzz_parity_200_random_docs(spark, tmp_path):
    """200 random tag-soup docs through BOTH engines — the fuzz twin
    of the hand matrix (the WARC-framing-fuzz precedent)."""
    import numpy as np

    rng = np.random.RandomState(661)
    docs = [
        {"doc_id": i, "url": f"https://f.example/{i}", "html": _fuzz_html(rng)}
        for i in range(200)
    ]
    path = str(tmp_path / "fuzz.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            docs,
            schema=pa.schema(
                [("doc_id", pa.int64()), ("url", pa.string()),
                 ("html", pa.string())]
            ),
        ),
        path,
    )
    with mock.patch.object(Q, "ensure_boiler_docs", lambda: path):
        got = REGISTRY["qf_boilerplate_blocks"].spark(spark, "").toPandas()
        cc = REGISTRY["qf_clean_corpus"].spark(spark, "").toPandas()
    con = duckdb.connect()
    res = compare_frames(got, con.sql(Q._boiler_blocks_sql(path)).df())
    assert res["values_match"], res["diff"]
    res2 = compare_frames(cc, con.sql(Q._clean_corpus_sql(path)).df())
    assert res2["values_match"], res2["diff"]
    assert got["n_content"].sum() > 0  # non-vacuous


def test_pipeline_boilerplate_mode_matches_oracle(spark, pages_path):
    """apply_pipeline(boilerplate=True) == label_frame(boilerplate=True)
    row for row on the pages fixture (which carries html-only rows with
    nav/script boilerplate), and the mode actually changes extraction
    vs the default whole-page strip."""
    import pandas as pd

    from eugl_spark.oracle import label_frame
    from eugl_spark.pipeline import apply_pipeline

    pages = spark.read.parquet(pages_path).drop("_case")
    got = (
        apply_pipeline(pages, repartition_to=0, boilerplate=True)
        .select("url", "text_extracted", "keep", "drop_reason")
        .toPandas()
        .set_index("url")
        .sort_index()
    )
    raw = pd.read_parquet(pages_path).drop(columns=["_case"])
    want = (
        label_frame(raw, boilerplate=True)
        .set_index("url")
        .sort_index()
    )
    assert (got["keep"] == want["keep"]).all()
    assert (
        got["drop_reason"].fillna("K") == want["drop_reason"].fillna("K")
    ).all()
    assert (
        got["text_extracted"].fillna("∅") == want["text_extracted"].fillna("∅")
    ).all()
    # the mode is not a no-op: html-only rows extract differently
    default = label_frame(raw, boilerplate=False).set_index("url").sort_index()
    changed = (
        want["text_extracted"].fillna("∅") != default["text_extracted"].fillna("∅")
    )
    assert changed.sum() > 10, int(changed.sum())


def test_fixture_generator_deterministic_and_covering():
    a = generate_boiler_docs(160, seed=23)
    b = generate_boiler_docs(160, seed=23)
    assert a.equals(b)
    # damage classes present
    assert a["html"].isna().sum() > 0
    assert (a["html"] == "").sum() > 0
    # most pages carry nav + footer boilerplate AND real content
    assert a["html"].str.contains("class=\"nav\"", regex=False).sum() > 100
