"""Sketch accuracy across the reference's adversarial distributions
(FIXTURES.md §B): heavy two-sided tails (tan), one-sided (reverse_exp),
plateaus (growing_blocks), monotone orders. Reference bounds:
t_digest.rs:736-785, rc_sketch2.rs:422-618.
"""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.functions.distributions import (
    DISTRIBUTIONS,
    growing_blocks,
    tan_dist,
)
from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

N = 100_000
MID_QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _exact(data):
    e = ExactDigest()
    e.update(data)
    return e


@pytest.mark.parametrize("dist", ["uniform", "reverse_exp", "ascending", "descending", "sin_abs"])
def test_tdigest_rank_error_bounded(dist):
    data = DISTRIBUTIONS[dist](N, seed=7)
    exact = _exact(data)
    sk = TDigest(delta=2000, scale="k2")
    sk.update(data)
    for q in MID_QS:
        want = exact.est_value_at_quantile(q)
        # rank error (scale-free — valid even for wild value ranges)
        assert abs(sk.est_quantile_at_value(want) - q) < 0.005, (dist, q)


@pytest.mark.parametrize("dist", ["uniform", "tan", "reverse_exp", "ascending", "descending"])
def test_kll_rank_error_bounded(dist):
    data = DISTRIBUTIONS[dist](N, seed=7)
    exact = _exact(data)
    sk = KLL(k=200, seed=7)
    sk.update(data)
    for q in MID_QS:
        want = exact.est_value_at_quantile(q)
        assert abs(sk.est_quantile_at_value(want) - q) < 0.01, (dist, q)


def test_tdigest_tails_on_tan():
    """Two-sided heavy tails: tail rank error must stay tight (the
    point of the k2 scale function)."""
    data = tan_dist(N, seed=3)
    exact = _exact(data)
    sk = TDigest(delta=2000, scale="k2")
    sk.update(data)
    for q in (0.001, 0.01, 0.99, 0.999):
        want = exact.est_value_at_quantile(q)
        assert abs(sk.est_quantile_at_value(want) - q) < 0.002, q


def test_growing_blocks_plateaus():
    """Plateau-heavy data (many duplicates) — the KLL-vs-tdigest
    adversarial case from the DataSketches comparison."""
    data = growing_blocks(N, seed=5)
    exact = _exact(data)
    td = TDigest(delta=2000, scale="k2")
    td.update(data)
    kll = KLL(k=200, seed=5)
    kll.update(data)
    # NOTE: rank conventions diverge on plateaus (KLL counts ≤ per
    # rc_sketch.rs:279-285; the exact oracle uses the mid-rank rule), so
    # the apples-to-apples check on duplicate-heavy data is the VALUE at
    # a quantile: it must land within one plateau step of exact.
    for q in (0.1, 0.5, 0.9):
        want = exact.est_value_at_quantile(q)
        assert abs(td.est_value_at_quantile(q) - want) <= 1.0, ("td", q)
        assert abs(kll.est_value_at_quantile(q) - want) <= 1.0, ("kll", q)


def test_accuracy_report_harness_smoke():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import accuracy_report

    rep = accuracy_report.run(n=2_000, trials=1)
    assert len(rep["results"]) == len(DISTRIBUTIONS) * len(accuracy_report.CONFIGS)
    for r in rep["results"]:
        assert r["nbytes"] > 0
        assert np.all(np.isfinite(r["rank_abs_err_max"]))
