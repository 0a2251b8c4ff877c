"""Sketch-driven range partitioner: balance on skewed data (where
equal-width splitting collapses), layout round-trip, and range
correctness of the written parts."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.engine.partitioning import (
    assign_partition,
    quantile_bounds,
    range_partition_stats,
    write_range_partitioned,
)


def _skewed_ds(n=100_000, seed=7):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    # lognormal: heavy right tail — equal-width bounds put almost
    # everything in partition 0
    vals = rng.lognormal(mean=0.0, sigma=2.0, size=n)
    return rd.from_arrow(
        pa.table({"v": vals, "i": np.arange(n, dtype=np.int64)})
    ).repartition(16)


def test_balanced_on_skew_where_equal_width_fails(ray_session):
    n, parts = 100_000, 8
    ds = _skewed_ds(n)
    bounds, counts = range_partition_stats(ds, "v", parts)
    assert counts.sum() == n
    ideal = n / parts
    # sketch bounds: every partition within ±30% of ideal
    assert counts.max() <= ideal * 1.3, counts
    assert counts.min() >= ideal * 0.7, counts
    # equal-width bounds on the same data: catastrophically unbalanced
    vals = np.concatenate(
        [b["v"].to_numpy() for b in ds.iter_batches(batch_format="pandas")]
    )
    ew = np.linspace(vals.min(), vals.max(), parts + 1)[1:-1]
    ew_counts = np.bincount(assign_partition(vals, ew), minlength=parts)
    assert ew_counts.max() > ideal * 4  # the failure the sketch fixes


def test_layout_roundtrip_and_range_correctness(ray_session, tmp_path):
    parts = 4
    ds = _skewed_ds(20_000)
    out = str(tmp_path / "layout")
    bounds = write_range_partitioned(ds, "v", out, parts)
    assert len(bounds) == parts - 1 and (np.diff(bounds) >= 0).all()
    t = pads.dataset(out, partitioning="hive").to_table()
    assert t.num_rows == 20_000
    assert len(np.unique(t.column("i").to_numpy())) == 20_000  # nothing lost
    part = t.column("part").to_numpy()
    v = t.column("v").to_numpy()
    # every row's value lies inside its partition's range
    full = np.concatenate([[-np.inf], bounds, [np.inf]])
    assert (v >= full[part]).all()
    assert (v <= full[part + 1]).all()  # boundary values go low side


def test_bounds_monotone_and_sane(ray_session):
    ds = _skewed_ds(50_000)
    b = quantile_bounds(ds, "v", 10)
    assert len(b) == 9
    assert (np.diff(b) >= 0).all()
    # median bound should be near exp(0)=1 for lognormal(0, 2)
    assert 0.7 < b[4] < 1.4
