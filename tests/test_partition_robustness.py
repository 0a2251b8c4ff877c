"""FIXTURES.md §C partition fixtures: empty/tiny partitions merged with
large ones, and Zipf-skewed partition layouts — estimates must be
partition-layout-independent (within sketch ε; counts exactly)."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest


@pytest.fixture(scope="module")
def data():
    return np.random.default_rng(11).uniform(0, 1001, 200_000)


def _merge_layout(data, sizes, make):
    """Build per-partition sketches for a given layout and merge."""
    assert sum(sizes) == len(data)
    merged = None
    start = 0
    for s in sizes:
        sk = make()
        if s:
            sk.update(data[start : start + s])
        start += s
        merged = sk if merged is None else merged.merge(sk)
    return merged


LAYOUTS = {
    "even": [50_000] * 4,
    "empty_and_tiny": [0, 1, 0, 199_999 - 2, 1, 1],  # t_digest.rs:681-694 edges
    "zipf_skew": [100_000, 60_000, 25_000, 10_000, 4_000, 1_000, 0, 0, 0, 0],
}


@pytest.mark.parametrize("layout", list(LAYOUTS))
def test_tdigest_layout_independent(data, layout):
    exact = ExactDigest()
    exact.update(data)
    sk = _merge_layout(data, LAYOUTS[layout], lambda: TDigest(delta=500, scale="k2"))
    assert sk.count == len(data)
    for q in (0.01, 0.5, 0.99):
        assert sk.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.01, abs=1.0
        ), (layout, q)


@pytest.mark.parametrize("layout", list(LAYOUTS))
def test_kll_layout_independent(data, layout):
    exact = ExactDigest()
    exact.update(data)
    sk = _merge_layout(data, LAYOUTS[layout], lambda: KLL(k=200, seed=4))
    assert sk.count == len(data)
    for q in (0.01, 0.5, 0.99):
        assert sk.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.015, abs=1.5
        ), (layout, q)


def test_hll_layout_exactly_invariant(data):
    """HLL max-merge: registers must be BIT-identical across layouts."""
    from approximate_quantiles_ray.functions.hashing import hash_int64

    h = hash_int64((data * 1000).astype(np.int64))
    regs = []
    for layout in LAYOUTS.values():
        sk = _merge_layout(h, layout, lambda: HLL(p=12, seed=3))
        regs.append(sk.registers.copy())
    for r in regs[1:]:
        np.testing.assert_array_equal(regs[0], r)


def test_ray_empty_and_single_row_blocks(ray_session):
    """The Ray path with degenerate blocks: empty + 1-row parquet files."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns_streaming

    d = "/tmp/aqr_degenerate"
    os.makedirs(d, exist_ok=True)
    schema = pa.schema([pa.field("x", pa.float64())])
    pq.write_table(pa.table({"x": pa.array([], pa.float64())}), f"{d}/empty.parquet")
    pq.write_table(pa.table({"x": [42.0]}), f"{d}/one.parquet")
    vals = np.random.default_rng(2).uniform(0, 100, 5_000)
    pq.write_table(pa.table({"x": vals}), f"{d}/big.parquet")

    specs = [SketchSpec(key="td", factory=lambda: TDigest(delta=200), on="x")]
    merged = sketch_columns_streaming(rd.read_parquet(d), specs)
    assert merged["td"].count == 5_001
    all_vals = np.append(vals, 42.0)
    assert merged["td"].est_value_at_quantile(0.5) == pytest.approx(
        np.median(all_vals), rel=0.05
    )
