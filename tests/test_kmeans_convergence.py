"""Library-mode k-means: tol-based convergence stop (the registry query
keeps the fixed-2 unroll so its SQL twin mirrors it CTE-for-CTE)."""

from __future__ import annotations

from pyspark.sql import functions as F

from eugl_spark.plans.queries import _kmeans_assign, _kmeans_centroids, _kmeans_update, _t


def _shift(spark, old, new) -> float:
    return (
        old.select("cell", F.col("cvec").alias("old_cvec"))
        .join(new, "cell")
        .select(
            F.aggregate(
                F.zip_with("old_cvec", "cvec", lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d2")
        )
        .agg(F.sum("d2"))
        .collect()[0][0]
    )


def test_convergence_reaches_fixpoint(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    c = _kmeans_centroids(emb, tol=1e-9)
    # converged: one more Lloyd round moves the centroids < tol
    # (6dp rounding quantizes updates, so a true fixpoint is reachable)
    again = _kmeans_update(_kmeans_assign(emb, c))
    assert _shift(spark, c, again) < 1e-9


def test_huge_tol_stops_after_one_round(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    one = _kmeans_centroids(emb, iters=1)
    early = _kmeans_centroids(emb, tol=1e12)  # any shift passes
    assert _shift(spark, one, early) == 0.0


def test_fixed_mode_unchanged_by_new_signature(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = _kmeans_centroids(emb).toPandas().sort_values("cell")
    b = _kmeans_centroids(emb, iters=2).toPandas().sort_values("cell")
    assert [tuple(v) for v in a.cvec] == [tuple(v) for v in b.cvec]


def test_centroid_shift_counts_vanished_cells(spark):
    """A cell that loses all members must register as a huge shift,
    not silently drop out of the convergence probe (inner-join bug)."""
    from eugl_spark.plans.queries import _centroid_shift

    old = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "cell int, cvec array<double>"
    )
    same = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "cell int, cvec array<double>"
    )
    assert _centroid_shift(old, same) == 0.0
    moved = spark.createDataFrame(
        [(0, [0.5, 0.0]), (1, [1.0, 1.0])], "cell int, cvec array<double>"
    )
    assert abs(_centroid_shift(old, moved) - 0.25) < 1e-12
    vanished = spark.createDataFrame(
        [(0, [0.0, 0.0])], "cell int, cvec array<double>"
    )
    assert _centroid_shift(old, vanished) >= 1.0e18


def _topk5(spark, emb, centroids):
    """The ann_kmeans_topk search shape against a given centroid set."""
    from pyspark.sql import Window as W

    from eugl_spark.models.embedding_kernels import cosine_udf
    from eugl_spark.operators.checkpoint import checkpoint_df
    from eugl_spark.plans.queries import _IVF_NPROBE

    assigned = checkpoint_df(_kmeans_assign(emb, centroids))
    probes = _kmeans_assign(
        emb.filter(F.col("vec_id") < 10), centroids, top_n=_IVF_NPROBE
    ).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("qv"), "cell"
    )
    cands = assigned.select(
        F.col("vec_id").alias("n_id"), F.col("embedding").alias("nv"), "cell"
    )
    pairs = (
        probes.join(cands, "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        .withColumn("cos", cosine_udf(F.col("qv"), F.col("nv")))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    rows = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "n_id")
        .collect()
    )
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["q_id"], set()).add(r["n_id"])
    return out


def test_sample_trained_centroids_recall_floor(spark, sf_dir):
    """train_fraction trains Lloyd on a deterministic hash-sample while
    assignment still covers the full table — sampled-vs-full top-5
    recall must stay above a floor (VERDICT r3 #7)."""
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    full = _topk5(spark, emb, _kmeans_centroids(emb))
    sampled = _topk5(
        spark, emb, _kmeans_centroids(emb, train_fraction=0.5)
    )
    assert set(full) == set(sampled)
    hits = total = 0
    for q, want in full.items():
        hits += len(want & sampled[q])
        total += len(want)
    assert total > 0 and hits / total >= 0.6, (hits, total)


def test_train_fraction_default_changes_nothing(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    a = {
        (r["cell"], tuple(r["cvec"]))
        for r in _kmeans_centroids(emb).collect()
    }
    b = {
        (r["cell"], tuple(r["cvec"]))
        for r in _kmeans_centroids(emb, train_fraction=1.0).collect()
    }
    assert a == b


def test_train_fraction_below_resolution_raises(spark, sf_dir):
    import pytest

    emb = _t(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    with pytest.raises(ValueError, match="samples nothing"):
        _kmeans_centroids(emb, train_fraction=0.00001)
