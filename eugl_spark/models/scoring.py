"""Shared global vocabulary for the model stages.

The langid + perplexity kernels (fused in models/doc_kernel.py, and
standalone in models/langid.py / models/perplexity.py) all index words
against ONE sorted global vocabulary so word→id codes and bigram-edge
codes agree across stages and with the SQL oracles' list positions.
This module holds that single definition; an earlier fused scoring UDF
that lived here was dead code duplicating doc_kernel's logic and was
removed (keeping two hand-synced copies of the trigram/bigram math is
how the kernels and oracle drift apart).
"""

from __future__ import annotations

import numpy as np

from eugl_spark import constants as C


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
