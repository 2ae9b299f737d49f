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
