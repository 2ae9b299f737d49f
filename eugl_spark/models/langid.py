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


def _encode_profiles() -> dict[str, np.ndarray]:
    out = {}
    for lang in C.LANGS:
        codes = sorted(
            (ord(g[0]) << 16) | (ord(g[1]) << 8) | ord(g[2])
            for g in C.TRIGRAM_PROFILES[lang]
        )
        out[lang] = np.asarray(codes, dtype=np.int64)
    return out


_PROFILE_CODES = _encode_profiles()

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
    buf = np.frombuffer("".join(padded).encode("ascii"), dtype=np.uint8)
    total = int(lens.sum())

    if total < 3:
        return pd.DataFrame(
            {"lang": ["und"] * n_docs, "confidence": [np.nan] * n_docs}
        )

    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
    codes = (
        (buf[:-2].astype(np.int64) << 16)
        | (buf[1:-1].astype(np.int64) << 8)
        | buf[2:].astype(np.int64)
    )
    # a trigram at position p belongs to a doc iff p and p+2 are in it
    valid = doc_of[:-2] == doc_of[2:]
    tri_doc = doc_of[:-2][valid]
    tri_codes = codes[valid]

    n_grams = np.bincount(tri_doc, minlength=n_docs).astype(np.int64)
    counts = np.zeros((len(C.LANGS), n_docs), dtype=np.int64)
    for i, lang in enumerate(C.LANGS):
        hit = np.isin(tri_codes, _PROFILE_CODES[lang])
        counts[i] = np.bincount(tri_doc[hit], minlength=n_docs)

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
