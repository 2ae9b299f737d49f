"""Language-ID model: character-trigram profiles, Arrow-vectorized.

The fastText-style per-document classifier slot (M1 in SURVEY.md
§2.10, mirroring the per-granule fmask kernel at
/root/reference/eugl/fmask.py:592-692). The "model" is a frozen set of
char trigrams per language (constants.TRIGRAM_PROFILES); scoring is a
trigram-membership count, argmax over languages with deterministic
tie-break (LANGS order), and a confidence gate to "und".

Implementation is batch-vectorized numpy over Arrow batches — the
whole batch's token strings are concatenated into one byte buffer,
trigram codes are computed with integer arithmetic, and membership is
one `np.isin` per language. No per-row Python (input_hint mandate).
Profiles are tiny (<1k trigrams/lang) and are module-level constants:
they ship to executors once inside the pickled UDF closure, the
broadcast-once pattern of SURVEY.md §4.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eugl_spark import constants as C


# Token strings contain only [a-z ] (constants.TOKEN_RE): a 27-symbol
# alphabet, so the trigram space is 27^3 = 19,683 — the bitmask LUT
# (bit i ⇔ trigram in LANGS[i]'s profile) fits in L1/L2 cache and the
# per-batch gather is cache-resident rather than thrashing a 2^24
# table. Built once at module import (workers import the shipped pkg).
_ALPHA = 27


def _charmap() -> np.ndarray:
    m = np.zeros(256, dtype=np.int32)  # space and everything else → 0
    for i in range(26):
        m[ord("a") + i] = i + 1
    return m


def _build_lut() -> np.ndarray:
    lut = np.zeros(_ALPHA**3, dtype=np.uint8)
    cm = _charmap()
    for i, lang in enumerate(C.LANGS):
        for g in C.TRIGRAM_PROFILES[lang]:
            code = (
                cm[ord(g[0])] * _ALPHA * _ALPHA
                + cm[ord(g[1])] * _ALPHA
                + cm[ord(g[2])]
            )
            lut[code] |= np.uint8(1 << i)
    return lut


_CHARMAP = _charmap()
_LUT = _build_lut()

RESULT_TYPE = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("confidence", T.DoubleType()),
    ]
)


def detect_batch(token_str: pd.Series) -> pd.DataFrame:
    """Vectorized langid over a batch of token-joined strings.

    token_str: space-joined lowercase [a-z]+ tokens (null ⇒ gated row).
    Returns DataFrame(lang, confidence); "und" when no trigrams or
    confidence < MIN_LANGID_CONFIDENCE; NaN confidence when no trigrams.
    """
    n_docs = len(token_str)
    s = token_str.fillna("")
    padded = (" " + s + " ").to_numpy(dtype=object)
    lens = np.fromiter((len(x) for x in padded), dtype=np.int64, count=n_docs)
    # two sentinel spaces so every doc owns exactly len_i trigram
    # positions and reduceat boundaries never fall off the end
    buf = np.frombuffer(
        ("".join(padded) + "  ").encode("ascii"), dtype=np.uint8
    )

    if len(buf) < 5:
        return pd.DataFrame(
            {"lang": ["und"] * n_docs, "confidence": [np.nan] * n_docs}
        )

    # doc i's positions are [start_i, start_i + len_i); trigrams that
    # span a doc boundary necessarily contain a mid-trigram space and
    # are in no profile (profiles pad single words), so they add 0 to
    # every hit count — no per-position doc-id array needed.
    c0 = _CHARMAP[buf[:-2]]
    codes = c0 * (_ALPHA * _ALPHA) + _CHARMAP[buf[1:-1]] * _ALPHA + _CHARMAP[buf[2:]]
    bits = _LUT[codes]
    starts = np.zeros(n_docs, dtype=np.int64)
    np.cumsum(lens[:-1], out=starts[1:])

    n_grams = np.maximum(lens - 2, 0)  # == oracle's len(padded_str) - 2
    counts = np.zeros((len(C.LANGS), n_docs), dtype=np.int64)
    for i in range(len(C.LANGS)):
        hits = ((bits >> i) & 1).astype(np.int32)
        counts[i] = np.add.reduceat(hits, starts)
        counts[i][n_grams == 0] = 0

    best_i = counts.argmax(axis=0)  # first max wins — LANGS-order tie-break
    best_n = counts[best_i, np.arange(n_docs)]
    with np.errstate(divide="ignore", invalid="ignore"):
        conf = np.where(n_grams > 0, best_n / n_grams, np.nan)
    langs = np.asarray(C.LANGS, dtype=object)[best_i]
    und = (n_grams == 0) | (conf < C.MIN_LANGID_CONFIDENCE)
    langs[und] = "und"
    return pd.DataFrame({"lang": langs, "confidence": conf})


@F.pandas_udf(RESULT_TYPE)
def langid_udf(token_str: pd.Series) -> pd.DataFrame:
    return detect_batch(token_str)
