"""KLLFixed (reference RCSketch semantics) — ports of the reference's
unit tests (rc_sketch.rs:311-607) plus merge/serde checks."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.kll_fixed import KLLFixed


def test_calc_buffer_size():
    """rc_sketch.rs:102-111."""
    assert KLLFixed.calc_buffer_size(1024, 8) == 2 * 8 * 7  # ceil(log2(128)) = 7
    assert KLLFixed.calc_buffer_size(10, 200) == 400  # floor: 2k


def test_insert_single_value():
    """rc_sketch.rs:311-317."""
    sk = KLLFixed(1024, 8)
    sk.update(np.array([1.0]))
    assert sk.interpolate_rank(1.0) == 1


@pytest.mark.parametrize("descending", [False, True])
def test_insert_multiple_values(descending):
    """rc_sketch.rs:319-360 incl. descending order robustness."""
    data = np.arange(1000, dtype=np.float64)
    if descending:
        data = data[::-1].copy()
    sk = KLLFixed(1024, 8, seed=3)
    sk.update(data)
    assert sk.count == 1000
    assert sk.interpolate_rank(0.0) == 1
    assert sk.interpolate_rank(1.0) == 2
    assert abs(sk.interpolate_rank(500.0) - 500) <= 10
    assert abs(sk.interpolate_rank(1000.0) - 1000) <= 30


def test_uniform_quantiles_vs_exact():
    """rc_sketch.rs:412+ shape: n=1e6 U[0,1001), k=200, rel-err ≤0.005."""
    rng = np.random.default_rng(9)
    data = rng.uniform(0, 1001, 1_000_000)
    exact = ExactDigest()
    exact.update(data)
    sk = KLLFixed(1_000_000, 200, seed=9)
    sk.update(data)
    for q in (0.001, 0.01, 0.1, 0.5, 0.9, 0.99):
        want = exact.est_value_at_quantile(q)
        assert sk.est_value_at_quantile(q) == pytest.approx(want, rel=0.005, abs=0.1), q
        assert sk.est_quantile_at_value(want) == pytest.approx(q, abs=0.005), q


def test_fast_and_average_variants():
    rng = np.random.default_rng(4)
    data = rng.uniform(0, 1001, 200_000)
    exact = ExactDigest()
    exact.update(data)
    for kw in ({"fast": True}, {"compaction": "average"}):
        sk = KLLFixed(200_000, 200, seed=1, **kw)
        sk.update(data)
        assert sk.count == 200_000
        for q in (0.1, 0.5, 0.9):
            assert sk.est_value_at_quantile(q) == pytest.approx(
                exact.est_value_at_quantile(q), rel=0.01
            ), (kw, q)


def test_merge_and_serde():
    rng = np.random.default_rng(6)
    data = rng.uniform(0, 100, 100_000)
    exact = ExactDigest()
    exact.update(data)
    parts = np.array_split(data, 4)
    merged = None
    for p in parts:
        sk = KLLFixed(100_000, 200, seed=2)
        sk.update(p)
        sk = KLLFixed.from_bytes(sk.to_bytes())  # round-trip each partial
        merged = sk if merged is None else merged.merge(sk)
    assert merged.count == 100_000
    for q in (0.1, 0.5, 0.9):
        assert merged.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.015
        ), q
