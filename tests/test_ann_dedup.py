"""End-to-end bucketed ANN + near-dup clustering (VERDICT r1 items 2-3).

The bucketed paths must (a) emit actual neighbors/clusters, (b) never
plan a full-table cross join, (c) recover a pinned fraction of the
brute-force oracle's answers, and (d) pick correct keepers on planted
near-duplicate families — the candidate-then-verify pattern of the
reference's gverify chip matching (/root/reference/eugl/gqa/tasks.py:235-280).
"""

from __future__ import annotations

import itertools
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from eugl_spark.plans.compare import compare_frames
from eugl_spark.plans.queries import REGISTRY


def _pairs(df, a="id_a", b="id_b"):
    return {(r[a], r[b]) for r in df.collect()}


def test_lsh_pairs_subset_and_recall(spark, sf_dir):
    brute = _pairs(REGISTRY["ann_cosine_pairs"].spark(spark, sf_dir))
    lsh = _pairs(REGISTRY["ann_lsh_pairs"].spark(spark, sf_dir))
    # every LSH pair is exact-verified at the same threshold → subset
    assert lsh <= brute
    # measured 0.42 at sf0.01 on near-uniform synthetic embeddings
    # (the hardest case for LSH: no cluster structure); pin a floor
    assert len(lsh & brute) / max(len(brute), 1) >= 0.30


def test_kmeans_topk_recall_beats_fixed_quantizer(spark, sf_dir):
    """Training the quantizer must pay: measured 0.86 recall@5 at
    sf0.01 (vs 0.34 for the fixed pseudo-centroids) while still
    scanning only nprobe/K ≈ 25% of the table."""
    brute = {
        (r.q_id, r.n_id)
        for r in REGISTRY["ann_topk_bruteforce"].spark(spark, sf_dir).collect()
    }
    km = {
        (r.q_id, r.n_id)
        for r in REGISTRY["ann_kmeans_topk"].spark(spark, sf_dir).collect()
    }
    assert len(km & brute) / len(brute) >= 0.70


def test_ivf_topk_recall(spark, sf_dir):
    brute = {
        (r.q_id, r.n_id)
        for r in REGISTRY["ann_topk_bruteforce"].spark(spark, sf_dir).collect()
    }
    ivf = {
        (r.q_id, r.n_id)
        for r in REGISTRY["ann_ivf_topk"].spark(spark, sf_dir).collect()
    }
    # nprobe=2 of 8 cells scans ~25% of the table; measured 0.34 recall
    # at sf0.01 (uniform vectors — no real cluster structure to exploit)
    assert len(ivf & brute) / len(brute) >= 0.25


@pytest.mark.parametrize(
    "name", ["ann_lsh_pairs", "ann_ivf_topk", "dedup_minhash_bands"]
)
def test_no_full_table_crossjoin(spark, sf_dir, name):
    df = REGISTRY[name].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_planted_families_cluster_and_keep(spark, tmp_path):
    """Chain a-b-c (a~b, b~c similar; a~c below threshold) must merge
    into ONE cluster via label propagation; identical pair forms its
    own; singletons never appear."""
    words = ["".join(t) for t in itertools.product("abcdefg", repeat=3)]
    fam1 = {
        1: " ".join(words[0:20]),
        2: " ".join(words[5:25]),   # jaccard(1,2) = 13/23 ≈ 0.57
        3: " ".join(words[10:30]),  # jaccard(2,3) ≈ 0.57; jaccard(1,3) ≈ 0.29
    }
    fam2 = {10: " ".join(words[40:50]), 11: " ".join(words[40:50])}
    single = {20: " ".join(words[60:80])}
    docs = {**fam1, **fam2, **single}
    d = str(tmp_path / "planted")
    os.makedirs(d)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(docs), pa.int64()),
                "text": [docs[k] for k in sorted(docs)],
                "lang": ["en"] * len(docs),
                "source": ["t"] * len(docs),
            }
        ),
        os.path.join(d, "documents.parquet"),
    )

    got = REGISTRY["dedup_clusters"].spark(spark, d).toPandas()
    by_doc = dict(zip(got.doc_id, got.cluster))
    assert by_doc == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}  # 20 absent
    keepers = set(got[got.keep].doc_id)
    drops = set(got[~got.keep].doc_id)
    assert keepers == {1, 10} and drops == {2, 3, 11}

    # and the DuckDB recursive-CTE oracle agrees on the same corpus
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    res = compare_frames(got, con.sql(REGISTRY["dedup_clusters"].sql).df())
    assert res["values_match"], res["diff"]


def test_lsh_clusters_recall_vs_exact(spark, sf_dir):
    """The banded scale path (candidates → verify → CC) must recover
    nearly all duplicate docs the exact all-pairs path finds, and may
    never invent a duplicate the exact path doesn't know."""
    exact = REGISTRY["dedup_clusters"].spark(spark, sf_dir).toPandas()
    lsh = REGISTRY["dedup_clusters_lsh"].spark(spark, sf_dir).toPandas()
    exact_docs, lsh_docs = set(exact.doc_id), set(lsh.doc_id)
    assert lsh_docs <= exact_docs  # banded edges ⊆ exact edges
    assert len(lsh_docs) / max(len(exact_docs), 1) >= 0.9
    # keeper rule holds on the banded output too
    per_cluster = lsh.groupby("cluster").agg(
        n_keep=("keep", "sum"), min_id=("doc_id", "min")
    )
    assert (per_cluster.n_keep == 1).all()
    assert (per_cluster.index == per_cluster.min_id).all()


def test_cluster_output_is_actionable_drop_set(spark, sf_dir):
    """north_rule analog: the clustering must yield a verdict — for
    every cluster exactly one keeper, and it is the min doc_id."""
    got = REGISTRY["dedup_clusters"].spark(spark, sf_dir).toPandas()
    if len(got) == 0:
        pytest.skip("no near-dup pairs at this SF")
    per_cluster = got.groupby("cluster").agg(
        n_keep=("keep", "sum"), min_id=("doc_id", "min")
    )
    assert (per_cluster.n_keep == 1).all()
    assert (per_cluster.index == per_cluster.min_id).all()


def test_pq_adc_recall_beats_random_floor(spark, sf_dir):
    """PQ ADC top-5 must carry real signal: recall@5 vs the EXACT
    euclidean top-5 ≥ 0.1 — ≥10× the ≈0.01 expectation of drawing 5
    random neighbors from the 499 candidates. The toy codebook (M=2
    subspaces × K=8 centroids = 64 cells over 500 vectors) is
    deliberately coarse — production PQ is M=8..16 × K=256 — so the
    pinned floor is a signal gate, not a quality claim; and the code
    histogram must show the codebooks actually partition (≥ half the
    theoretical cells occupied, no cell holding the majority)."""
    import numpy as np

    from eugl_spark.plans.queries import REGISTRY

    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    exact = {
        qid: {
            n
            for _, n in sorted(
                (float(np.sum((emb[qid] - emb[n]) ** 2)), n)
                for n in emb
                if n != qid
            )[:5]
        }
        for qid in range(10)
    }
    got: dict[int, set] = {}
    for r in REGISTRY["ann_pq_topk"].spark(spark, sf_dir).collect():
        got.setdefault(r["q_id"], set()).add(r["n_id"])
    recall = sum(len(got[q] & exact[q]) for q in exact) / (5 * len(exact))
    assert recall >= 0.1, f"ADC recall@5 {recall} below the signal floor"

    hist = REGISTRY["ann_pq_codes"].spark(spark, sf_dir).collect()
    n_total = sum(r["n"] for r in hist)
    assert n_total == len(emb)
    assert len(hist) >= 32, f"only {len(hist)}/64 code cells occupied"
    assert max(r["n"] for r in hist) < n_total / 2
