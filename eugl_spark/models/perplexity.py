"""Perplexity scorer: word-bigram LM over a fixed edge table.

The KenLM-style n-gram scorer slot (M2 in SURVEY.md §2.10, mirroring
the s2cloudless probability map + threshold at
/root/reference/eugl/s2cl.py:32-51 — the model scores here, the
threshold stays a native `when()` in the pipeline).

Model = per-language frozen bigram edge set (constants.BIGRAM_TABLES)
with log P(seen)=−log 4, log P(unseen)=−10. The mean NLL is computed
from *integer* seen/unseen counts so the oracle reproduces it
bit-exactly. Batch-vectorized: tokens explode once per batch, word→id
via one vectorized dict map, edge membership via one np.isin per
language present in the batch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from eugl_spark import constants as C


def _encode_edges() -> tuple[dict[str, dict[str, int]], dict[str, np.ndarray]]:
    vocab_idx: dict[str, dict[str, int]] = {}
    edge_codes: dict[str, np.ndarray] = {}
    for lang in C.LANGS:
        vocab = C.WORDS[lang]
        idx = {w: i for i, w in enumerate(vocab)}
        vocab_idx[lang] = idx
        codes = sorted(
            idx[a] * len(vocab) + idx[b] for a, b in C.BIGRAM_TABLES[lang]
        )
        edge_codes[lang] = np.asarray(codes, dtype=np.int64)
    return vocab_idx, edge_codes


_VOCAB_IDX, _EDGE_CODES = _encode_edges()


def score_batch(tokens: pd.Series, lang: pd.Series) -> pd.Series:
    """Mean word-bigram NLL per doc under the doc's language model.

    tokens: array<string> column (None ⇒ gated row ⇒ NaN);
    lang: detected language (unknown/absent model ⇒ NaN).
    """
    out = np.full(len(tokens), np.nan, dtype=np.float64)
    if len(tokens) == 0:
        return pd.Series(out)
    tok = tokens.reset_index(drop=True)
    lng = lang.reset_index(drop=True).fillna("und")

    for l in pd.unique(lng):
        if l not in _VOCAB_IDX:
            continue
        rows = np.flatnonzero((lng == l).to_numpy())
        sub = tok.iloc[rows]
        nonnull = sub.notna().to_numpy()
        sub = sub[nonnull]
        rows = rows[nonnull]
        if len(rows) == 0:
            continue
        flat = sub.explode()
        if flat.isna().all():
            continue
        pos_of_row = {r: p for p, r in enumerate(rows)}
        doc = flat.index.map(pos_of_row).to_numpy(dtype=np.int64)
        ids = (
            flat.map(_VOCAB_IDX[l])
            .fillna(-1)
            .to_numpy(dtype=np.int64, na_value=-1)
        )
        n_vocab = len(C.WORDS[l])
        same_doc = doc[1:] == doc[:-1]
        a, b = ids[:-1], ids[1:]
        known = (a >= 0) & (b >= 0)
        pair_mask = same_doc
        codes = np.where(known, a * n_vocab + b, -1)
        seen = np.isin(codes, _EDGE_CODES[l]) & known & pair_mask
        n_docs = len(rows)
        n_pairs = np.bincount(doc[1:][pair_mask], minlength=n_docs)
        n_seen = np.bincount(doc[1:][seen], minlength=n_docs)
        with np.errstate(divide="ignore", invalid="ignore"):
            nll = -(
                n_seen * C.SEEN_LOGPROB
                + (n_pairs - n_seen) * C.UNSEEN_LOGPROB
            ) / n_pairs
        nll = np.where(n_pairs > 0, nll, np.nan)
        out[rows] = nll
    return pd.Series(out)


@F.pandas_udf(T.DoubleType())
def perplexity_udf(tokens: pd.Series, lang: pd.Series) -> pd.Series:
    return score_batch(tokens, lang)
