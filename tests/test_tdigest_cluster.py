"""Parity tests for the per-item clustering insert paths: ports of the
reference's add_cluster tests (t_digest.rs:839-892) plus KeyedSumTree's
own tests (keyed_sum_tree.rs:342-423) and cross-path agreement. These
paths exist for API parity only — the engine's default is the batched
merge-compaction (PARITY.md §2.2)."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.keyed_sum_tree import KeyedSumTree
from approximate_quantiles_ray.sketches.tdigest import TDigest


# ---------------------------------------------------------- KeyedSumTree


def test_keyed_sum_tree_manual():
    """keyed_sum_tree.rs:342-379, verbatim expectations."""
    tree = KeyedSumTree()
    assert tree.less_than_sum(0.0) is None
    assert tree.less_than_sum(1_000_000.0) is None

    tree.insert(1.0, 1.0)
    assert tree.less_than_sum(1.0) == 0.0
    assert tree.less_than_sum(2.0) == 1.0

    tree.delete(1.0)
    assert tree.less_than_sum(0.0) is None
    assert tree.less_than_sum(1_000_000.0) is None

    tree.insert(1.0, 1.0)
    tree.insert(13.0, 100.0)
    tree.insert(25.0, 1.0)
    tree.insert(-100.0, 5.0)
    assert tree.size() == 4

    assert tree.less_than_sum(-101.0) == 0.0
    assert tree.less_than_sum(-100.0) == 0.0
    assert tree.less_than_sum(-99.0) == 5.0
    assert tree.less_than_sum(0.0) == 5.0
    assert tree.less_than_sum(1.0) == 5.0
    assert tree.less_than_sum(2.0) == 6.0
    assert tree.less_than_sum(12.0) == 6.0
    assert tree.less_than_sum(13.0) == 6.0
    assert tree.less_than_sum(14.0) == 106.0
    assert tree.less_than_sum(24.0) == 106.0
    assert tree.less_than_sum(25.0) == 106.0
    assert tree.less_than_sum(26.0) == 107.0


def test_keyed_sum_tree_uniform_insert_delete():
    """keyed_sum_tree.rs:381-423: prefix-sum consistency under random
    insert then delete of half the keys (seeded here)."""
    rng = np.random.default_rng(11)
    means = rng.uniform(0, 1001, 1000)
    weights = rng.uniform(0.1, 10.0, 1000)
    tree = KeyedSumTree()
    for m, w in zip(means, weights):
        tree.insert(float(m), float(w))
    assert tree.size() == 1000

    order = np.argsort(means)
    sm, sw = means[order], weights[order]
    s = 0.0
    for m, w in zip(sm, sw):
        assert tree.less_than_sum(float(m)) == pytest.approx(s, abs=1e-7)
        s += float(w)

    keep, drop = (sm[:500], sw[:500]), sm[500:]
    for m in drop:
        tree.delete(float(m))
    assert tree.size() == 500
    s = 0.0
    for m, w in zip(*keep):
        assert tree.less_than_sum(float(m)) == pytest.approx(s, abs=1e-7)
        s += float(w)


def test_closest_keys_tolerance_band():
    tree = KeyedSumTree()
    for m in (1.0, 2.0, 2.0005, 5.0):
        tree.insert(m, 1.0)
    got = sorted(k for k, _ in tree.closest_keys(2.0002))
    # both 2.0 and 2.0005 are within 1e-3 of the minimum distance
    assert got == [2.0, 2.0005]
    assert tree.closest_keys(100.0) == [(5.0, 1.0)]
    assert KeyedSumTree().closest_keys(1.0) == []


# ------------------------------------------------------------- add_cluster


def test_add_cluster_with_single_centroid():
    """t_digest.rs:839-851."""
    d = TDigest(delta=1.0, scale="k0")
    d.add_cluster([1.0], [1.0], growth_limit=3.0)
    assert len(d.means) == 1
    assert d.means[0] == 1.0 and d.weights[0] == 1.0
    assert d.total_weight() == 1.0


@pytest.mark.parametrize(
    "delta, growth", [(100.0, 3.0), (20.0, 10.0)]
)
def test_add_cluster_many_centroids(delta, growth):
    """t_digest.rs:853-892: 0..1000 weight-1 centroids, k1 scale —
    quantile epsilons from the reference test, weight conserved."""
    means = np.arange(1001, dtype=np.float64)
    d = TDigest(delta=delta, scale="k1")
    d.add_cluster(means, np.ones(1001), growth_limit=growth)
    assert d.total_weight() == 1001.0
    assert d.est_value_at_quantile(0.0) == 0.0
    assert d.est_value_at_quantile(0.25) == pytest.approx(250.0, abs=1.0)
    assert d.est_value_at_quantile(0.5) == pytest.approx(500.0, abs=2.0)
    assert d.est_value_at_quantile(0.75) == pytest.approx(750.0, abs=1.0)
    assert d.est_value_at_quantile(1.0) == 1000.0
    # digest stayed bounded by the growth limit + one compress
    assert len(d.means) <= growth * delta + 1


@pytest.mark.parametrize("path", ["add_cluster", "add_cluster_tree"])
def test_cluster_paths_match_batch_path_accuracy(path):
    """Both clustering inserts must answer within the same tolerance as
    the batched path on uniform data (the reference's accuracy frame)."""
    rng = np.random.default_rng(3)
    vals = rng.uniform(0, 1001, 20_000)
    d = TDigest(delta=200.0, scale="k2")
    getattr(d, path)(vals, np.ones(len(vals)), 5.0)
    batch = TDigest(delta=200.0, scale="k2").update(vals)
    exact = np.sort(vals)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        want = exact[int(q * (len(exact) - 1))]
        assert d.est_value_at_quantile(q) == pytest.approx(want, rel=0.02, abs=2.0)
        assert batch.est_value_at_quantile(q) == pytest.approx(want, rel=0.02, abs=2.0)
    assert d.count == len(vals)
    assert d.total_weight() == pytest.approx(len(vals))


def test_add_cluster_tree_single_and_count():
    d = TDigest(delta=1.0, scale="k0")
    d.add_cluster_tree([1.0], [1.0], growth_limit=3.0)
    assert len(d.means) == 1 and d.means[0] == 1.0
    assert d.total_weight() == 1.0


def test_find_closest_centroids_quirks():
    """t_digest.rs:527-575 incl. the signed-diff minimum quirk."""
    d = TDigest(delta=10.0, scale="k0")
    d._add_weighted(np.array([1.0, 2.0, 2.0, 5.0]), np.ones(4))
    d._materialize()
    # empty digest -> None
    assert TDigest().find_closest_centroids(1.0) is None
    # below the minimum: range starts at 0
    rng_idx = d.find_closest_centroids(0.0)
    assert rng_idx[0] == 0
    # above the maximum: the last centroid
    n = len(d.means)
    assert d.find_closest_centroids(100.0) == (n - 1, n)
