"""KLL (RCSketch2 semantics) conformance tests.

Bounds from /root/reference/src/rc_sketch/rc_sketch2.rs:322-618
(tabulated in BASELINE.md §3).
"""

import numpy as np
import pytest

from approximate_quantiles_ray import ExactDigest, KLL


def test_insert_rank_small():
    """rc_sketch2.rs:331-360 — exact ranks while below capacity."""
    sk = KLL(k=8, seed=0)
    sk.update(np.array([1.0]))
    assert sk.interpolate_rank(1.0) == 1
    sk2 = KLL(k=8, seed=0)
    sk2.update(np.arange(10.0))
    assert sk2.interpolate_rank(0.0) == 1
    assert sk2.interpolate_rank(1.0) == 2
    assert sk2.interpolate_rank(9.0) == 10


def test_ascending_1000():
    """rc_sketch2.rs ascending test: exact first ranks, bounded later."""
    sk = KLL(k=8, seed=0)
    sk.update(np.arange(1000.0))
    assert sk.interpolate_rank(0.0) == 1
    assert sk.interpolate_rank(1.0) == 2
    assert sk.interpolate_rank(10.0) == 11
    assert abs(sk.interpolate_rank(500.0) - 501) <= 10
    assert abs(sk.interpolate_rank(999.0) - 1000) <= 30


def test_descending_1000():
    """rc_sketch.rs:339-360 — descending order robustness."""
    sk = KLL(k=8, seed=0)
    sk.update(np.arange(1000.0)[::-1].copy())
    assert sk.interpolate_rank(0.0) == 1
    assert sk.interpolate_rank(1.0) == 2
    assert sk.interpolate_rank(10.0) == 11
    assert abs(sk.interpolate_rank(500.0) - 501) <= 10
    assert abs(sk.interpolate_rank(999.0) - 1000) <= 30


def test_uniform_both_queries(uniform_1m):
    """rc_sketch2.rs:422-618 — k=200, both queries rel-err <= 0.005."""
    sk = KLL(k=200, seed=42)
    sk.update(uniform_1m)
    ex = ExactDigest().update(uniform_1m)
    assert sk.count == len(uniform_1m)
    for q in (0.001, 0.01, 0.25, 0.5, 0.75, 1.0):
        ratio = sk.est_value_at_quantile(q) / ex.est_value_at_quantile(q)
        assert ratio == pytest.approx(1.0, abs=0.005), q
    for v in (1.0, 10.0, 250.0, 500.0, 750.0, 1000.0):
        ratio = sk.est_quantile_at_value(v) / ex.est_quantile_at_value(v)
        assert ratio == pytest.approx(1.0, abs=0.005), v


def test_merge_pairwise_commutative(uniform_1m):
    """Seeded coin + canonical sort make pairwise merge exactly
    commutative (deliberate improvement over thread_rng,
    rc_sketch2.rs:265-268)."""
    a = KLL(k=200, seed=1).update(uniform_1m[:400_000])
    b = KLL(k=200, seed=2).update(uniform_1m[400_000:])
    ab = KLL.from_bytes(a.to_bytes()).merge(KLL.from_bytes(b.to_bytes()))
    ba = KLL.from_bytes(b.to_bytes()).merge(KLL.from_bytes(a.to_bytes()))
    va, wa = ab._weighted_values()
    vb, wb = ba._weighted_values()
    np.testing.assert_array_equal(va, vb)
    np.testing.assert_array_equal(wa, wb)
    assert ab.count == ba.count == len(uniform_1m)


def test_merge_permutation_tolerance(uniform_1m):
    ex = ExactDigest().update(uniform_1m)
    parts = np.array_split(uniform_1m, 16)
    sketches = [KLL(k=200, seed=100 + i).update(p) for i, p in enumerate(parts)]
    rng = np.random.default_rng(5)
    for trial in range(5):
        order = rng.permutation(16)
        merged = KLL.from_bytes(sketches[order[0]].to_bytes())
        for i in order[1:]:
            merged.merge(KLL.from_bytes(sketches[i].to_bytes()))
        assert merged.count == len(uniform_1m)
        for q in (0.01, 0.5, 0.99):
            ratio = merged.est_value_at_quantile(q) / ex.est_value_at_quantile(q)
            assert ratio == pytest.approx(1.0, abs=0.01), (trial, q)


def test_merge_skewed_partitions(uniform_1m):
    """One partition holding ~50% of the data (FIXTURES.md §C)."""
    ex = ExactDigest().update(uniform_1m)
    cuts = [500_000, 750_000, 900_000, 980_000]
    parts = np.split(uniform_1m, cuts)
    merged = KLL(k=200, seed=0)
    for i, p in enumerate(parts):
        merged.merge(KLL(k=200, seed=i).update(p))
    for q in (0.01, 0.5, 0.99):
        ratio = merged.est_value_at_quantile(q) / ex.est_value_at_quantile(q)
        assert ratio == pytest.approx(1.0, abs=0.01), q


def test_merge_empty_tiny():
    big = KLL(k=50, seed=0).update(np.arange(10_000.0))
    big.merge(KLL(k=50, seed=1))  # empty
    big.merge(KLL(k=50, seed=2).update(np.array([5.0])))
    assert big.count == 10_001


def test_determinism_and_serde(uniform_1m):
    a = KLL(k=100, seed=9).update(uniform_1m[:200_000])
    b = KLL(k=100, seed=9).update(uniform_1m[:200_000])
    va, _ = a._weighted_values()
    vb, _ = b._weighted_values()
    np.testing.assert_array_equal(va, vb)
    back = KLL.from_bytes(a.to_bytes())
    vc, _ = back._weighted_values()
    np.testing.assert_array_equal(va, vc)
    assert back.count == a.count


def test_weight_conservation(uniform_1m):
    """Stored weight sum stays within the discarded-half accounting:
    count is tracked exactly (int64), independent of float weights."""
    sk = KLL(k=200, seed=0).update(uniform_1m[:500_000])
    _, w = sk._weighted_values()
    # stored weighted mass approximates n (compaction drops half of
    # each compacted run, in expectation balanced)
    assert abs(w.sum() - 500_000) / 500_000 < 0.05
    assert sk.count == 500_000
