"""Connected-components algorithms: both implementations must agree
with a plain union-find reference on arbitrary graphs, and the star
algorithm must converge in few rounds on the long chains that would
starve min-label propagation."""

from __future__ import annotations

import random

import pytest

from eugl_spark.operators.graph import (
    connected_components_minlabel,
    connected_components_star,
)


def _union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def _run(spark, fn, pairs):
    df = spark.createDataFrame(pairs, ["doc_a", "doc_b"])
    got = fn(df).collect()
    return {r["doc_id"]: r["cluster"] for r in got}, {
        r["doc_id"] for r in got if r["keep"]
    }


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "fn", [connected_components_minlabel, connected_components_star]
)
def test_cc_matches_union_find_on_random_graphs(spark, fn, seed):
    rng = random.Random(seed)
    n = 60
    pairs = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(40)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    want = _union_find(pairs)
    got, keepers = _run(spark, fn, pairs)
    assert got == want
    assert keepers == {r for r in want.values()}


@pytest.mark.parametrize(
    "fn", [connected_components_minlabel, connected_components_star]
)
def test_cc_long_chain(spark, fn):
    """A 120-node path: one component, min label 0. This is the shape
    where label propagation needs O(n) supersteps and the star
    algorithm needs O(log n) rounds."""
    pairs = [(i, i + 1) for i in range(120)]
    got, keepers = _run(spark, fn, pairs)
    assert set(got.values()) == {0}
    assert keepers == {0}


def test_star_equals_minlabel_on_disjoint_components(spark):
    pairs = (
        [(i, i + 1) for i in range(0, 10)]          # chain 0..10
        + [(100 + i, 100 + (i + 1) % 5) for i in range(5)]  # cycle
        + [(200, 201), (203, 202), (201, 203)]      # zigzag
    )
    a, _ = _run(spark, connected_components_minlabel, pairs)
    b, _ = _run(spark, connected_components_star, pairs)
    assert a == b


def test_star_keeps_self_pair_only_nodes(spark):
    """A doc appearing only in self-pairs has no edges but IS a node:
    both CC implementations must emit it as a singleton cluster."""
    from eugl_spark.operators.graph import (
        connected_components_minlabel,
        connected_components_star,
    )

    pairs = spark.createDataFrame(
        [(5, 5), (1, 2)], "doc_a long, doc_b long"
    )
    for fn in (connected_components_minlabel, connected_components_star):
        got = {
            r["doc_id"]: r["cluster"] for r in fn(pairs).collect()
        }
        assert got.get(5) == 5, (fn.__name__, got)
        assert got.get(1) == got.get(2) == 1, (fn.__name__, got)


@pytest.mark.parametrize(
    "fn", [connected_components_minlabel, connected_components_star]
)
def test_cc_near_max_long_ids_no_ansi_overflow(spark, fn):
    """Hash-derived doc_ids are 63-bit; the fixpoint/convergence probes
    must not abort with ARITHMETIC_OVERFLOW under ANSI when summing
    them (decimal sums). Two ids near 2^62 summed as long overflow."""
    big = 1 << 62
    pairs = [(big + 1, big + 2), (big + 3, big + 4), (big + 2, big + 3),
             (big + 10, big + 11)]
    df = spark.createDataFrame(pairs, "doc_a: long, doc_b: long")
    got = {r["doc_id"]: r["cluster"] for r in fn(df).collect()}
    want = _union_find(pairs)
    assert got == want
