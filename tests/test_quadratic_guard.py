"""O(n²) baseline guard: the brute-force oracles must refuse above a
configurable row count and point at their sub-quadratic twin."""

from __future__ import annotations

import pytest

from eugl_spark import constants as C
from eugl_spark.plans.queries import REGISTRY, _guard_quadratic


def test_guard_passes_under_limit(spark):
    df = spark.range(10)
    out = _guard_quadratic(df, "op", "alt")
    assert out is df  # unchanged frame → identical plan and hash


def test_guard_refuses_above_limit(spark, monkeypatch):
    monkeypatch.setattr(C, "QUADRATIC_ROW_LIMIT", 5)
    with pytest.raises(ValueError, match="sub-quadratic twin `the_alt`"):
        _guard_quadratic(spark.range(6), "the_op", "the_alt")


def test_guard_disabled_by_zero(spark, monkeypatch):
    monkeypatch.setattr(C, "QUADRATIC_ROW_LIMIT", 0)
    df = spark.range(1000)
    assert _guard_quadratic(df, "op", "alt") is df


@pytest.mark.parametrize(
    "name,twin",
    [
        ("ann_topk_bruteforce", "ann_ivf_topk"),
        ("ann_cosine_pairs", "ann_lsh_pairs"),
        ("dedup_ngram_jaccard", "dedup_minhash_bands"),
    ],
)
def test_quadratic_queries_are_guarded(spark, sf_dir, name, twin, monkeypatch):
    monkeypatch.setattr(C, "QUADRATIC_ROW_LIMIT", 3)
    with pytest.raises(ValueError, match=twin):
        REGISTRY[name].spark(spark, sf_dir).collect()
