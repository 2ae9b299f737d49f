"""Combined langid + perplexity scoring kernel (one Arrow boundary).

The two model stages (M1 fastText-style langid, M2 KenLM-style
bigram LM) share their tokenization, so evaluating them in one pandas
UDF halves the JVM↔Python crossings and — more importantly at scale —
takes ONE narrow string column through the Python node instead of an
array<string> column per stage: pass-through row width at an
ArrowEvalPython node is pure memory traffic, measured as the dominant
cost of the chained-UDF design at 100k docs.

Outputs struct(lang, confidence, avg_nll). avg_nll is computed for
every document whose detected language has a model; the pipeline's
precedence masking decides what is exposed (oracle parity is on the
masked struct).

All arithmetic is integer counting + one float expression, identical
to oracle.detect_lang / oracle.avg_nll — bit-exact by construction.
"""

from __future__ import annotations

from itertools import chain

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eugl_spark import constants as C
from eugl_spark.models.langid import _ALPHA, _CHARMAP, _LUT


def _global_vocab() -> tuple[dict[str, int], dict[str, np.ndarray], int]:
    words = sorted({w for l in C.LANGS for w in C.WORDS[l]})
    gidx = {w: i for i, w in enumerate(words)}
    g = len(words)
    edges = {}
    for lang in C.LANGS:
        codes = sorted(
            gidx[a] * g + gidx[b] for a, b in C.BIGRAM_TABLES[lang]
        )
        edges[lang] = np.asarray(codes, dtype=np.int64)
    return gidx, edges, g


_GIDX, _EDGES, _G = _global_vocab()

RESULT_TYPE = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
        T.StructField("avg_nll", T.DoubleType()),
    ]
)


def score_batch(token_str: pd.Series) -> pd.DataFrame:
    """token_str: space-joined lowercase [a-z]+ tokens (null ⇒ gated)."""
    n_docs = len(token_str)
    s = token_str.fillna("")
    vals = s.to_numpy(dtype=object)

    # ---- langid: trigram bitmask counting over one byte buffer ----
    # (two sentinel spaces: every doc owns exactly len_i trigram
    # positions, and boundary-spanning trigrams have a mid-space so
    # they hit no profile — see models/langid.py)
    lens = np.fromiter(
        (len(x) + 2 for x in vals), dtype=np.int64, count=n_docs
    )
    buf = np.frombuffer(
        ("".join(" " + x + " " for x in vals) + "  ").encode("ascii"),
        dtype=np.uint8,
    )

    nan = float("nan")
    if len(buf) < 5:
        return pd.DataFrame(
            {
                "lang": ["und"] * n_docs,
                "confidence": [nan] * n_docs,
                "avg_nll": [nan] * n_docs,
            }
        )

    codes3 = (
        _CHARMAP[buf[:-2]] * (_ALPHA * _ALPHA)
        + _CHARMAP[buf[1:-1]] * _ALPHA
        + _CHARMAP[buf[2:]]
    )
    bits = _LUT[codes3]
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])
    n_grams = np.maximum(lens - 2, 0)

    counts = np.zeros((len(C.LANGS), n_docs), dtype=np.int64)
    for i in range(len(C.LANGS)):
        hits = ((bits >> i) & 1).astype(np.int32)
        counts[i] = np.add.reduceat(hits, starts)
        counts[i][n_grams == 0] = 0

    best_i = counts.argmax(axis=0)
    best_n = counts[best_i, np.arange(n_docs)]
    with np.errstate(divide="ignore", invalid="ignore"):
        conf = np.where(n_grams > 0, best_n / n_grams, np.nan)
    langs = np.asarray(C.LANGS, dtype=object)[best_i]
    und = (n_grams == 0) | (conf < C.MIN_LANGID_CONFIDENCE)
    langs[und] = "und"

    # ---- perplexity: word-bigram membership over the global vocab ----
    word_lists = [x.split(" ") if x else [] for x in vals]
    n_words = np.fromiter(
        (len(w) for w in word_lists), dtype=np.int64, count=n_docs
    )
    flat = list(chain.from_iterable(word_lists))
    gid = np.fromiter(
        (_GIDX.get(w, -1) for w in flat), dtype=np.int64, count=len(flat)
    )
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_words)

    nll = np.full(n_docs, np.nan, dtype=np.float64)
    if len(gid) >= 2:
        a, b = gid[:-1], gid[1:]
        same = doc_of[:-1] == doc_of[1:]
        known = (a >= 0) & (b >= 0)
        pair_codes = np.where(known, a * _G + b, -1)
        pair_doc = doc_of[1:]
        n_pairs = np.bincount(pair_doc[same], minlength=n_docs)
        lang_arr = langs  # object array
        for l in C.LANGS:
            mask_docs = lang_arr == l
            if not mask_docs.any():
                continue
            seen = np.isin(pair_codes, _EDGES[l]) & same
            n_seen = np.bincount(pair_doc[seen], minlength=n_docs)
            with np.errstate(divide="ignore", invalid="ignore"):
                vals_l = -(
                    n_seen * C.SEEN_LOGPROB
                    + (n_pairs - n_seen) * C.UNSEEN_LOGPROB
                ) / n_pairs
            ok = mask_docs & (n_pairs > 0)
            nll[ok] = vals_l[ok]

    return pd.DataFrame({"lang": langs, "confidence": conf, "avg_nll": nll})


@F.pandas_udf(RESULT_TYPE)
def scoring_udf(token_str: pd.Series) -> pd.DataFrame:
    return score_batch(token_str)
