"""Hard-input sweep for the embeddings-table queries — the ANN twin
of test_pathological_pages: zero vectors (cosine 0/0), exact
duplicates, opposite pairs, extreme magnitudes, one-hots and
all-equal components, each run through every oracle-backed ANN /
embedding-dedup query Spark-vs-DuckDB."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY

_DIM = 64


def _vec(fill=0.0, **at):
    v = np.full(_DIM, fill, dtype=np.float32)
    for idx, val in at.items():
        v[int(idx[1:])] = val
    return v


def _base(i, scale=1.0):
    """Deterministic varied vector (seeded per id)."""
    rng = np.random.RandomState(100 + i)
    return (rng.standard_normal(_DIM) * scale).astype(np.float32)


# (vec_id, embedding, label) — ids 0-7 seed the k-means init
# (vec_id < 8) and ids < 10 are the ANN query side, so the hard cases
# sit in BOTH roles
_VECS = [
    (0, _vec(), 0),  # zero vector as centroid seed AND query
    (1, _base(1), 1),
    (2, -_base(1), 2),  # exact opposite of id 1 (cosine -1)
    (3, _base(3), 0),
    (4, _base(3), 1),  # exact duplicate of id 3 (cosine 1, dist 0)
    (5, _vec(i7=1.0), 2),  # one-hot
    (6, _vec(fill=0.25), 0),  # all-equal components
    (7, _base(7, scale=1e18), 1),  # huge magnitude
    (8, _base(8, scale=1e-30), 2),  # tiny magnitude
    (9, _vec(), 0),  # second zero vector (zero-zero pair)
    (10, _base(3), 2),  # another duplicate of id 3
    (11, _vec(i0=1.0), 1),
    (12, _vec(i0=-1.0), 0),  # opposite one-hot
] + [(13 + k, _base(13 + k), k % 3) for k in range(12)]

_EMB_QUERIES = [
    "ann_topk_bruteforce",
    "ann_cosine_pairs",
    "ann_lsh_buckets",
    "ann_lsh_pairs",
    "ann_ivf_cells",
    "ann_ivf_topk",
    "ann_kmeans_cells",
    "ann_kmeans_topk",
    "ann_pq_codes",
    "ann_pq_topk",
    "ann_knn_label_vote",
    "dedup_embedding_clusters",
    "embedding_stats",
]


@pytest.fixture(scope="module")
def patho_emb_dir(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("patho_emb"))
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([i for i, _, _ in _VECS], pa.int64()),
                "embedding": pa.array(
                    [v.tolist() for _, v, _ in _VECS],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([l for _, _, l in _VECS], pa.int32()),
            }
        ),
        os.path.join(d, "embeddings.parquet"),
    )
    return d


@pytest.mark.parametrize("name", _EMB_QUERIES)
def test_ann_family_on_pathological_embeddings(spark, patho_emb_dir, name):
    q = REGISTRY[name]
    assert q.sql, f"{name} has no oracle SQL"
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{patho_emb_dir}/embeddings.parquet'"
    )
    res = compare_frames(
        q.spark(spark, patho_emb_dir).toPandas(), con.sql(q.sql).df()
    )
    assert res["values_match"], (name, res["diff"])
