"""The consolidated per-document QA kernel: ONE Arrow boundary.

Measured on this pipeline, the JVM string path (UTF8String→java.lang
.String round-trips per regexp call, ~14 passes/row) is memory-
bandwidth-bound: 4 independent pinned 8-core JVMs aggregate only
2.25× one JVM's throughput on this host. The north-star architecture
("all expressed as vectorized pandas/Arrow UDFs", BASELINE.json) is
also the bandwidth-efficient one: documents cross into Python ONCE as
UTF-8 Arrow batches; extraction, tokenization, metrics, langid,
perplexity and scrubbing run in a single kernel (numpy for the model
math, compiled-sre for the regex work — identical engines to the
oracle, making byte-parity structural); only scalar metrics and the
two text outputs return.

Catalyst keeps what it is good at: gating/verdict when-chains,
hashing/bucketing, joins, aggregation, pruning (the qa-struct and
keep columns stay native, so keep-only consumers never touch Python).

Mirrors oracle.label_row exactly: shared constants, same rule
precedence (constants.DROP_PRECEDENCE), count-based float formulas.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eugl_spark import constants as C
from eugl_spark.models.langid import _ALPHA, _CHARMAP, _LUT
from eugl_spark.models.scoring import _EDGES, _G, _GIDX

# C.RE_FLAGS (re.ASCII): pins \d/\s/\w/\b to the Java/RE2 semantics —
# see the contract note in constants.py
_TOKEN = re.compile(C.TOKEN_RE, C.RE_FLAGS)
_SYMBOL = re.compile(C.SYMBOL_RE, C.RE_FLAGS)
_SCRUB = [(re.compile(p, C.RE_FLAGS), r) for p, r in C.SCRUB_RULES]
# superset gate: every scrub pattern needs '@' or a digit (email/ip/
# phone) or a literal toxic term, so one character-class scan plus
# C-level substring checks clears the clean majority without running
# the four pattern passes (which still define the semantics). The hint
# compiles with the SAME flags as the rules, so \d here matches
# exactly what the rules' \d can — the gate stays a superset by
# construction whatever the flags say
_SCRUB_HINT = re.compile(r"[@\d]", C.RE_FLAGS)


def _maybe_scrub(t: str) -> bool:
    if _SCRUB_HINT.search(t) is not None:
        return True
    return any(term in t for term in C.TOXIC_TERMS)
_HTML = [(re.compile(p, C.RE_FLAGS), r) for p, r in C.HTML_STRIP_RULES]
_WS = re.compile(C.WHITESPACE_COLLAPSE_RE, C.RE_FLAGS)
_NL = re.compile(C.NEWLINE_COLLAPSE_RE, C.RE_FLAGS)
_TRIM = re.compile(C.TRIM_RE, C.RE_FLAGS)
# Exact numeric word encoding: a word of length L ≤ 13 over [a-z]
# maps injectively to Σ c_i·27^(K-1-i) (c=1..26, zero-padded tail),
# so vocabulary lookup, stop-word tests and bigram-edge membership are
# pure int64 array ops — no per-word Python string objects (measured:
# tokenizing 400k docs allocated ~24M small strings, the dominant
# allocator/bandwidth load under high worker concurrency).
_WORD_K = 13


def _word_code(w: str) -> int:
    code = 0
    for i in range(_WORD_K):
        code = code * 27 + (ord(w[i]) - 96 if i < len(w) else 0)
    return code


def _encode_vocab() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    # _word_code truncates at _WORD_K digits while the document side
    # marks longer tokens non-vocab (code = -1): a vocabulary word
    # over the cap would silently encode as its prefix and never match
    # (or collide with a real K-char word) — fail fast at model load
    too_long = [w for w in _GIDX if len(w) > _WORD_K]
    if too_long:  # ValueError, not assert: -O must not disable this
        raise ValueError(
            f"vocabulary words exceed _WORD_K={_WORD_K} chars: "
            f"{too_long[:5]} — raise _WORD_K (and re-verify int64 "
            "headroom: 27^K)"
        )
    items = sorted((_word_code(w), gid) for w, gid in _GIDX.items())
    codes = np.asarray([c for c, _ in items], dtype=np.int64)
    gids = np.asarray([g for _, g in items], dtype=np.int64)
    stop = np.asarray(
        sorted(_GIDX[w] for w in C.EN_STOPWORDS), dtype=np.int64
    )
    return codes, gids, stop


_VOCAB_CODES, _VOCAB_GIDS, _STOP_GIDS = _encode_vocab()
_NON_AZ = re.compile("[^a-z]+")


def _pack_luts() -> list[np.ndarray]:
    """Lane-packed trigram LUTs: 4 languages per int64 in 16-bit
    lanes, so the per-language trigram counting collapses from
    len(LANGS) full-buffer (bit-extract → astype → reduceat) passes
    to ceil(len/4) gather+reduceat passes. Lane safety: a lane
    accumulates at most one count per buffer position of a document,
    and the kernel only sends MIN_CHARS..MAX_CHARS (=8000) docs to
    the model stage, so per-lane sums stay < 2^16 — no carry into the
    neighboring language. (detect_batch in langid.py keeps the
    unpacked path: its standalone inputs are unbounded.)"""
    packs = []
    for g in range(0, len(C.LANGS), 4):
        p = np.zeros(_ALPHA**3, dtype=np.int64)
        for lane, i in enumerate(range(g, min(g + 4, len(C.LANGS)))):
            p |= ((_LUT >> i) & 1).astype(np.int64) << (16 * lane)
        packs.append(p)
    return packs


_LUT_PACKS = _pack_luts()
if C.MAX_CHARS + 2 >= 1 << 16:  # lane-overflow guard (see _pack_luts)
    raise ValueError("MAX_CHARS too large for 16-bit langid lanes")
# premultiplied charmaps for the trigram code (saves two full-buffer
# vector multiplies per batch)
_CM2 = _CHARMAP * (_ALPHA * _ALPHA)
_CM1 = _CHARMAP * _ALPHA

RESULT_TYPE = T.StructType(
    [
        T.StructField("text_extracted", T.StringType()),
        T.StructField("scrubbed_text", T.StringType()),
        T.StructField("n_chars", T.LongType()),
        T.StructField("symbol_ratio", T.DoubleType()),
        T.StructField("n_words", T.LongType()),
        T.StructField("mean_word_len", T.DoubleType()),
        T.StructField("dup_line_fraction", T.DoubleType()),
        T.StructField("stopword_fraction", T.DoubleType()),
        T.StructField("lang", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("avg_nll", T.DoubleType()),
    ]
)


def _extract(html) -> str | None:
    if html is None:
        return None
    t = bytes(html).decode("utf-8", errors="replace")
    for pat, rep in _HTML:
        t = pat.sub(rep, t)
    for ent, ch in C.HTML_ENTITIES:
        t = t.replace(ent, ch)
    t = _WS.sub(" ", t)
    t = _NL.sub("\n", t)
    return _TRIM.sub("", t)


def qa_batch(text: pd.Series, html: pd.Series) -> pd.DataFrame:
    n = len(text)
    te: list[str | None] = [
        t if t is not None else _extract(h)
        for t, h in zip(text.tolist(), html.tolist())
    ]

    n_chars = np.array(
        [len(t) if t is not None else -1 for t in te], dtype=np.int64
    )
    out = {
        "text_extracted": te,
        "scrubbed_text": [None] * n,
        "n_chars": [None] * n,
        "symbol_ratio": np.full(n, np.nan),
        "n_words": np.full(n, -1, dtype=np.int64),
        "mean_word_len": np.full(n, np.nan),
        "dup_line_fraction": np.full(n, np.nan),
        "stopword_fraction": np.full(n, np.nan),
        "lang": [None] * n,
        "confidence": np.full(n, np.nan),
        "avg_nll": np.full(n, np.nan),
    }

    # cheap rules (no_content / too_short / too_long / symbol / dup)
    # computed per doc; expensive model stages only for survivors —
    # the land/ocean cheap-first gating, inside one kernel.
    tok_strs: list[str] = []
    tok_rows: list[int] = []
    scrubbed = out["scrubbed_text"]
    # Scrub slow path, batched: all hint-positive docs are joined with
    # a NUL sentinel and each rule runs ONCE over the joined string —
    # the regex engine scans the same bytes either way, but ~4 calls
    # per batch replace 4 calls per doc (measured ~0.4s/20k docs of
    # pure call overhead). Safe because every scrub pattern is
    # NUL-opaque: character classes exclude \x00 and \b treats it as
    # a non-word char, exactly like the string edges it replaces. The
    # rare doc CONTAINING a NUL keeps the per-doc path (join/split
    # would mis-align), preserving byte-identical oracle semantics.
    slow_rows: list[int] = []
    for i, t in enumerate(te):
        if t is None or t == "":
            continue
        if not _maybe_scrub(t):
            scrubbed[i] = t
        elif "\x00" in t:
            scrubbed_t = t
            for pat, rep in _SCRUB:
                scrubbed_t = pat.sub(rep, scrubbed_t)
            scrubbed[i] = scrubbed_t
        else:
            slow_rows.append(i)
    if slow_rows:
        joined = "\x00".join(te[i] for i in slow_rows)
        for pat, rep in _SCRUB:
            joined = pat.sub(rep, joined)
        for i, s in zip(slow_rows, joined.split("\x00")):
            scrubbed[i] = s
    for i, t in enumerate(te):
        if t is None or t == "":
            continue
        nc = n_chars[i]
        out["n_chars"][i] = int(nc)
        if nc < C.MIN_CHARS or nc > C.MAX_CHARS:
            continue
        sym = len(_SYMBOL.findall(t)) / nc
        out["symbol_ratio"][i] = sym
        if sym > C.MAX_SYMBOL_RATIO:
            continue
        lines = t.split("\n")
        dup = 1.0 - len(set(lines)) / len(lines)
        out["dup_line_fraction"][i] = dup
        if dup > C.MAX_DUP_LINE_FRACTION:
            continue
        # one regex pass builds the canonical token string; identical
        # to " ".join(TOKEN_RE.findall(t.lower())) — the oracle's form
        tok_strs.append(_NON_AZ.sub(" ", t.lower()).strip(" "))
        tok_rows.append(i)

    if tok_rows:
        rows = np.asarray(tok_rows, dtype=np.int64)
        m = _model_stage(tok_strs)
        out["n_words"][rows] = m["n_words"]
        ok = m["n_words"] >= C.MIN_WORDS
        out["mean_word_len"][rows[ok]] = m["mean_word_len"][ok]
        wl_ok = ok & (
            (m["mean_word_len"] >= C.MIN_MEAN_WORD_LEN)
            & (m["mean_word_len"] <= C.MAX_MEAN_WORD_LEN)
        )
        lang_rows = rows[wl_ok]
        langs = m["lang"]
        for j in np.flatnonzero(wl_ok):
            out["lang"][rows[j]] = langs[j]
        out["confidence"][lang_rows] = m["confidence"][wl_ok]
        in_target = np.asarray(
            [l in C.TARGET_LANGS for l in langs], dtype=bool
        )
        sw_mask = wl_ok & in_target
        out["stopword_fraction"][rows[sw_mask]] = m["stopword_fraction"][sw_mask]
        nll_mask = sw_mask & (
            m["stopword_fraction"] >= C.MIN_STOPWORD_FRACTION
        )
        out["avg_nll"][rows[nll_mask]] = m["avg_nll"][nll_mask]

    nw = out["n_words"]
    out["n_words"] = [int(v) if v >= 0 else None for v in nw]
    return pd.DataFrame(out)


def _model_stage(tok_strs: list[str]) -> dict[str, np.ndarray]:
    """Vectorized token metrics + langid + perplexity over token strings.

    Everything below is numpy over one shared byte buffer: trigram
    counting for langid, numeric word codes for vocabulary/stop-word/
    bigram work. No per-word Python objects."""
    n_docs = len(tok_strs)
    lens = np.fromiter(
        (len(x) + 2 for x in tok_strs), dtype=np.int64, count=n_docs
    )
    buf = np.frombuffer(
        ("".join(" " + x + " " for x in tok_strs) + "  ").encode("ascii"),
        dtype=np.uint8,
    )

    # word spans: maximal non-space runs (docs are space-delimited and
    # space-padded, so runs never cross documents). The buffer starts
    # and ends with spaces, so letter/space transitions strictly
    # ALTERNATE start,end,start,end… — ONE transition scan + even/odd
    # split replaces the two per-direction flatnonzero passes
    is_letter = buf != 32
    trans = np.flatnonzero(is_letter[1:] != is_letter[:-1]) + 1
    w_starts = trans[0::2]
    w_ends = trans[1::2]
    w_len = w_ends - w_starts
    doc_starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=doc_starts[1:])
    doc_of = np.searchsorted(doc_starts, w_starts, side="right") - 1

    n_words = np.bincount(doc_of, minlength=n_docs).astype(np.int64)
    sum_len = np.bincount(doc_of, weights=w_len, minlength=n_docs).astype(
        np.int64
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        mean_word_len = np.where(n_words > 0, sum_len / n_words, np.nan)

    # numeric word codes (Horner over K zero-padded base-27 digits)
    code = np.zeros(len(w_starts), dtype=np.int64)
    for i in range(_WORD_K):
        idx = w_starts + i
        ch = np.where(
            i < w_len, _CHARMAP[buf[np.minimum(idx, len(buf) - 1)]], 0
        ).astype(np.int64)
        code = code * 27 + ch
    # words longer than K can't be vocabulary words
    code[w_len > _WORD_K] = -1
    pos = np.searchsorted(_VOCAB_CODES, code)
    pos_c = np.minimum(pos, len(_VOCAB_CODES) - 1)
    in_vocab = (_VOCAB_CODES[pos_c] == code) & (code >= 0)
    gid = np.where(in_vocab, _VOCAB_GIDS[pos_c], -1)

    # langid (see models/langid.py for the trigram-LUT design notes)
    # premultiplied charmaps (_CM2/_CM1): three gathers + two adds,
    # no vector multiplies
    codes3 = _CM2[buf[:-2]] + _CM1[buf[1:-1]] + _CHARMAP[buf[2:]]
    starts = doc_starts  # same cumsum-of-lens boundaries as the word pass
    n_grams = np.maximum(lens - 2, 0)
    counts = np.empty((len(C.LANGS), n_docs), dtype=np.int64)
    # lane-packed counting (see _pack_luts): one gather + one reduceat
    # per GROUP of 4 languages instead of per language
    for g, pack in enumerate(_LUT_PACKS):
        sums = np.add.reduceat(pack[codes3], starts)
        for lane in range(min(4, len(C.LANGS) - 4 * g)):
            counts[4 * g + lane] = (sums >> (16 * lane)) & 0xFFFF
    counts[:, n_grams == 0] = 0
    best_i = counts.argmax(axis=0)
    best_n = counts[best_i, np.arange(n_docs)]
    with np.errstate(divide="ignore", invalid="ignore"):
        conf = np.where(n_grams > 0, best_n / n_grams, np.nan)
    langs = np.asarray(C.LANGS, dtype=object)[best_i]
    und = (n_grams == 0) | (conf < C.MIN_LANGID_CONFIDENCE)
    langs[und] = "und"

    # stopword fraction + bigram NLL over the numeric word ids
    is_stop = np.isin(gid, _STOP_GIDS)
    n_stop = np.bincount(doc_of[is_stop], minlength=n_docs)
    with np.errstate(divide="ignore", invalid="ignore"):
        stopword_fraction = np.where(n_words > 0, n_stop / n_words, np.nan)

    avg_nll = np.full(n_docs, np.nan)
    if len(gid) >= 2:
        a, b = gid[:-1], gid[1:]
        same = doc_of[:-1] == doc_of[1:]
        known = (a >= 0) & (b >= 0)
        pair_codes = np.where(known, a * _G + b, -1)
        pair_doc = doc_of[1:]
        n_pairs = np.bincount(pair_doc[same], minlength=n_docs)
        for l in C.LANGS:
            mask_docs = langs == l
            if not mask_docs.any():
                continue
            seen = np.isin(pair_codes, _EDGES[l]) & same
            n_seen = np.bincount(pair_doc[seen], minlength=n_docs)
            with np.errstate(divide="ignore", invalid="ignore"):
                vals = -(
                    n_seen * C.SEEN_LOGPROB
                    + (n_pairs - n_seen) * C.UNSEEN_LOGPROB
                ) / n_pairs
            okm = mask_docs & (n_pairs > 0)
            avg_nll[okm] = vals[okm]

    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "stopword_fraction": stopword_fraction,
        "lang": langs,
        "confidence": conf,
        "avg_nll": avg_nll,
    }


@F.pandas_udf(RESULT_TYPE)
def qa_kernel_udf(text: pd.Series, html: pd.Series) -> pd.DataFrame:
    return qa_batch(text, html)


def _check_math():
    assert math.isfinite(C.SEEN_LOGPROB)


_check_math()
