"""Property-based drift checks: the distributed one-fold KS / W1
(pipelines/drift.drift_report over Ray Datasets) vs a brute-force
numpy reference on random integer samples — random values, sizes and
partitionings. Complements the DuckDB-matched fixed-data oracles with
adversarial random coverage (ties, singletons, disjoint supports)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


def _brute_ks_w1(a: np.ndarray, b: np.ndarray) -> tuple[float, float]:
    vals = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    ks = float(np.max(np.abs(fa - fb)))
    w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(vals)))
    return ks, w1


samples = st.lists(st.integers(0, 500), min_size=1, max_size=250)


@settings(max_examples=10, deadline=None)
@given(samples, samples, st.integers(1, 5))
def test_drift_report_matches_brute_force(ray_session, xs, ys, n_parts):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.drift import drift_report

    a = np.array(xs, np.int64)
    b = np.array(ys, np.int64)
    ds_a = rd.from_arrow(pa.table({"v": a.astype(np.float64)})).repartition(n_parts)
    ds_b = rd.from_arrow(pa.table({"v": b.astype(np.float64)})).repartition(n_parts)
    rep = drift_report(ds_a, ds_b, "v")
    ks, w1 = _brute_ks_w1(a, b)
    assert rep["n_a"] == len(a) and rep["n_b"] == len(b)
    assert abs(rep["ks"] - ks) < 1e-12, (rep["ks"], ks)
    assert abs(rep["w1"] - w1) < 1e-9, (rep["w1"], w1)
