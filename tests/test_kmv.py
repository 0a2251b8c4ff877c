"""KMV bottom-k distinct sketch: exactness below saturation, ε-bounds
above it, EXACT merge associativity (bottom-k union is a true monoid,
unlike the quantile sketches' within-bound order sensitivity), and the
theta-framework set expressions vs numpy ground truth."""

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.kmv import (
    KMV,
    difference_estimate,
    intersection_estimate,
    jaccard_estimate,
    union_estimate,
)


def test_exact_below_saturation():
    s = KMV(k=256)
    s.update(np.arange(100, dtype=np.int64))
    s.update(np.arange(50, dtype=np.int64))  # re-adds are absorbed
    assert s.estimate() == 100.0
    assert s.count == 150
    assert s.theta == 1.0


def test_estimate_bound_saturated():
    rng = np.random.default_rng(7)
    n, k = 200_000, 1024
    values = rng.integers(0, n, size=3 * n)
    true = len(np.unique(values))
    s = KMV(k=k)
    for chunk in np.array_split(values, 7):  # incremental, multi-batch
        s.update(chunk)
    rel = abs(s.estimate() - true) / true
    assert rel < 5 / np.sqrt(k - 2)  # ~5σ of the 1/sqrt(k-2) rel. error


def test_merge_is_exact_and_order_insensitive():
    rng = np.random.default_rng(3)
    parts = [rng.integers(0, 10_000, size=4000) for _ in range(6)]
    sketches = [KMV(k=128).update(p) for p in parts]

    def fold(order):
        acc = KMV(k=128)
        for i in order:
            acc.merge(KMV.from_bytes(sketches[i].to_bytes()))
        return acc

    a = fold([0, 1, 2, 3, 4, 5])
    b = fold([5, 3, 1, 0, 4, 2])
    assert np.array_equal(a.values, b.values)  # bit-identical states
    assert a.estimate() == b.estimate()
    # merge must equal single-pass build on the concatenation
    c = KMV(k=128).update(np.concatenate(parts))
    assert np.array_equal(a.values, c.values)


def test_set_expressions_vs_truth():
    rng = np.random.default_rng(11)
    a_ids = rng.choice(1_000_000, size=60_000, replace=False)
    b_ids = np.concatenate([a_ids[:20_000], 1_000_000 + np.arange(40_000)])
    k = 2048
    sa = KMV(k=k).update(a_ids)
    sb = KMV(k=k).update(b_ids)
    true_union = len(np.union1d(a_ids, b_ids))
    true_inter = 20_000
    tol = 6 / np.sqrt(k)  # ~6σ of the sampling error
    assert abs(union_estimate(sa, sb) - true_union) / true_union < tol
    assert abs(intersection_estimate(sa, sb) - true_inter) / true_inter < 3 * tol
    assert abs(difference_estimate(sa, sb) - 40_000) / 40_000 < 3 * tol
    true_j = true_inter / true_union
    assert abs(jaccard_estimate(sa, sb) - true_j) < 3 * tol * true_j + 0.01


def test_set_expressions_exact_when_unsaturated():
    sa = KMV(k=1024).update(np.arange(100))
    sb = KMV(k=1024).update(np.arange(50, 200))
    assert union_estimate(sa, sb) == 200.0
    assert intersection_estimate(sa, sb) == 50.0
    assert difference_estimate(sa, sb) == 50.0
    assert jaccard_estimate(sa, sb) == 50.0 / 200.0


def test_serde_roundtrip_and_guards():
    s = KMV(k=64).update(np.arange(1000))
    r = KMV.from_bytes(s.to_bytes())
    assert np.array_equal(r.values, s.values)
    assert r.count == s.count and r.k == s.k and r.seed == s.seed
    with pytest.raises(ValueError):
        s.merge(KMV(k=32))
    with pytest.raises(ValueError):
        s.merge(KMV(k=64, seed=9))
    with pytest.raises(ValueError):
        KMV(k=4)


def test_string_and_empty_updates():
    s = KMV(k=64)
    s.update(np.array([], dtype=np.int64))
    assert s.estimate() == 0.0
    import pyarrow as pa

    s.update(pa.array(["a", "b", "a", "c"]))
    assert s.estimate() == 3.0
