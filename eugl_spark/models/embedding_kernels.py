"""Vectorized embedding kernels: LSH buckets, IVF cells, cosine.

The ANN queries originally computed plane/centroid dot products with
Catalyst higher-order functions — ``F.aggregate(F.zip_with(...))`` is
interpreted per element (no whole-stage codegen for lambda
expressions), so 8 planes × 64 dims per row dominated the ANN bench
times. These kernels do the same math as one numpy pass per Arrow
batch (the consolidated-kernel pattern of models/doc_kernel.py; the
coarse-assign-then-exact-verify structure they feed mirrors the
reference's gverify chip matching, coarse grid → correlate,
/root/reference/eugl/gqa/tasks.py:235-280).

Determinism contract — bit-identical to the Catalyst/DuckDB oracles:
floating-point addition is not associative, so the reductions are
written as a COLUMN LOOP over the 64 dims (``acc += E[:, i] * w[i]``),
which reproduces exactly the sequential left-fold order of
``F.aggregate`` and DuckDB's ``list_sum`` — parity is structural, not
luck. Inputs are cast float32→float64 BEFORE multiplying, matching the
``CAST(x AS DOUBLE)`` in both SQL forms.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

N_DIM = 64
N_PLANES = 8
N_CENTROIDS = 8

# integer plane/centroid families — same formulas as plans/queries.py
_LSH_W = np.array(
    [[((j * 131 + d * 31) % 17) - 8 for j in range(N_PLANES)] for d in range(N_DIM)],
    dtype=np.float64,
)
_IVF_W = np.array(
    [[((c * 37 + d * 13) % 15) - 7 for c in range(N_CENTROIDS)] for d in range(N_DIM)],
    dtype=np.float64,
)


def _stack(emb: pd.Series) -> np.ndarray:
    """(n, 64) float64 matrix from an Arrow list<float> column."""
    return np.stack(emb.to_numpy()).astype(np.float64)


def _seq_dots(E: np.ndarray, W: np.ndarray) -> np.ndarray:
    """E @ W with the left-fold summation order of F.aggregate/list_sum:
    vectorized over rows, strictly sequential over the 64 dims."""
    acc = np.zeros((E.shape[0], W.shape[1]), dtype=np.float64)
    for i in range(E.shape[1]):
        acc += E[:, i : i + 1] * W[i]
    return acc


def _seq_dot_pair(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * B[:, i]
    return acc


def _seq_norm(A: np.ndarray) -> np.ndarray:
    acc = np.zeros(A.shape[0], dtype=np.float64)
    for i in range(A.shape[1]):
        acc += A[:, i] * A[:, i]
    return np.sqrt(acc)


def lsh_bucket_batch(emb: pd.Series) -> pd.Series:
    """Sign-bit bucket over the 8 hyperplanes (bit j ⇔ dot_j > 0)."""
    bits = _seq_dots(_stack(emb), _LSH_W) > 0
    vals = (bits.astype(np.int64) << np.arange(N_PLANES, dtype=np.int64)).sum(
        axis=1
    )
    return pd.Series(vals)


def ivf_cell_batch(emb: pd.Series) -> pd.Series:
    """Nearest pseudo-centroid (argmax dot; ties → smallest id, which
    np.argmax's first-max rule gives for columns built in id order)."""
    d = _seq_dots(_stack(emb), _IVF_W)
    return pd.Series(d.argmax(axis=1).astype(np.int64))


def ivf_probes_batch(emb: pd.Series, nprobe: int) -> pd.Series:
    """The nprobe nearest centroid ids, ordered (dot desc, id asc)."""
    d = _seq_dots(_stack(emb), _IVF_W)
    # stable sort on -dot: equal dots keep ascending id order
    order = np.argsort(-d, axis=1, kind="stable")[:, :nprobe].astype(np.int64)
    return pd.Series(list(order))


def cosine_batch(va: pd.Series, vb: pd.Series) -> pd.Series:
    A, B = _stack(va), _stack(vb)
    return pd.Series(_seq_dot_pair(A, B) / (_seq_norm(A) * _seq_norm(B)))


@F.pandas_udf(T.LongType())
def lsh_bucket_udf(emb: pd.Series) -> pd.Series:
    return lsh_bucket_batch(emb)


@F.pandas_udf(T.LongType())
def ivf_cell_udf(emb: pd.Series) -> pd.Series:
    return ivf_cell_batch(emb)


@F.pandas_udf(T.ArrayType(T.LongType()))
def ivf_probes2_udf(emb: pd.Series) -> pd.Series:
    return ivf_probes_batch(emb, 2)


@F.pandas_udf(T.DoubleType())
def cosine_udf(va: pd.Series, vb: pd.Series) -> pd.Series:
    return cosine_batch(va, vb)
