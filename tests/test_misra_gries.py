"""Misra–Gries summary: the deterministic sandwich bound
est ≤ true ≤ est + err_bound, the n/(k+1) ceiling on err_bound,
guaranteed presence of all >n/(k+1) items, and merge bound
preservation (Agarwal et al. 2012 §3.1)."""

import numpy as np
import pyarrow as pa
import pytest

from approximate_quantiles_ray.sketches.misra_gries import MisraGries


def _zipf_batch(rng, n, n_keys=1000, a=1.5):
    ranks = np.minimum(rng.zipf(a, size=n), n_keys)
    return np.char.add("key_", ranks.astype(str))


def _true_counts(batches):
    from collections import Counter

    c = Counter()
    for b in batches:
        c.update(b.tolist())
    return c


def test_sandwich_bound_single_stream():
    rng = np.random.default_rng(5)
    batches = [_zipf_batch(rng, 20_000) for _ in range(5)]
    k = 32
    mg = MisraGries(k=k)
    for b in batches:
        mg.update(b)
    true = _true_counts(batches)
    n = sum(true.values())
    assert mg.count == n
    assert mg.err_bound <= n // (k + 1)
    for key, tc in true.items():
        est = mg.estimate(key)
        assert est <= tc <= est + mg.err_bound, key
    # every guaranteed-heavy item (> n/(k+1)) must be present
    for key, tc in true.items():
        if tc > n / (k + 1):
            assert mg.estimate(key) > 0, key


def test_merge_preserves_bound():
    rng = np.random.default_rng(9)
    batches = [_zipf_batch(rng, 15_000) for _ in range(6)]
    k = 16
    parts = [MisraGries(k=k).update(b) for b in batches]
    merged = MisraGries(k=k)
    for p in parts:
        merged.merge(MisraGries.from_bytes(p.to_bytes()))
    true = _true_counts(batches)
    n = sum(true.values())
    assert merged.count == n
    assert merged.err_bound <= n // (k + 1)
    for key, tc in true.items():
        est = merged.estimate(key)
        assert est <= tc <= est + merged.err_bound, key


def test_exact_when_under_capacity():
    mg = MisraGries(k=64)
    mg.update(pa.array(["a"] * 5 + ["b"] * 3 + ["c"]))
    assert mg.err_bound == 0
    assert mg.estimate("a") == 5 and mg.estimate("b") == 3 and mg.estimate("c") == 1
    assert mg.top(2) == [("a", 5, 5), ("b", 3, 3)]


def test_arrow_nulls_and_serde():
    mg = MisraGries(k=8)
    mg.update(pa.array(["x", None, "x", "y"]))
    assert mg.count == 3  # nulls dropped
    r = MisraGries.from_bytes(mg.to_bytes())
    assert r.counters == mg.counters and r.count == mg.count
    with pytest.raises(ValueError):
        mg.merge(MisraGries(k=4))


def test_int_keys_numpy_path():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 50, size=10_000)
    mg = MisraGries(k=16).update(vals)
    true = np.bincount(vals, minlength=50)
    n = len(vals)
    assert mg.err_bound <= n // 17
    for key in range(50):
        est = mg.estimate(int(key))
        assert est <= true[key] <= est + mg.err_bound
