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


def test_zorder_layout_prunes_both_dimensions(ray_session, tmp_path):
    """Z-order layout: per-file min/max ranges must be tight on BOTH
    columns (each file covers a small rank-space rectangle), where a
    single-column sort leaves the second column's ranges at ~full
    width — the pruning win the layout exists for."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.partitioning import write_zordered

    rng = np.random.default_rng(13)
    n = 32_000
    x = rng.lognormal(0.0, 2.0, n)          # skewed
    y = rng.uniform(0.0, 1000.0, n)         # uniform
    ds = rd.from_arrow(
        pa.table({"x": x, "y": y, "i": np.arange(n, dtype=np.int64)})
    ).repartition(8)

    zdir = str(tmp_path / "z")
    write_zordered(ds, "x", "y", zdir, cells_per_dim=64, rows_per_file=2000)

    def rank_coverage(dir_path, col, ref):
        """Mean per-file fraction of the column's RANK range covered."""
        import pyarrow.parquet as pqt

        ref_sorted = np.sort(ref)
        covs = []
        frag_dir = Path(dir_path)
        files = sorted(frag_dir.rglob("*.parquet"))
        assert len(files) >= 8
        for f in files:
            c = pqt.read_table(str(f), columns=[col]).column(col).to_numpy()
            lo, hi = np.searchsorted(ref_sorted, [c.min(), c.max()])
            covs.append((hi - lo) / len(ref_sorted))
        return float(np.mean(covs))

    zx = rank_coverage(zdir, "x", x)
    zy = rank_coverage(zdir, "y", y)
    assert zx < 0.5 and zy < 0.5, (zx, zy)  # both dims prune

    # baseline: sort by x only — y ranges stay ~full-width
    xdir = str(tmp_path / "xsort")
    ds.sort("x").write_parquet(xdir, max_rows_per_file=2000, min_rows_per_file=2000)
    bx = rank_coverage(xdir, "x", x)
    by = rank_coverage(xdir, "y", y)
    assert bx < 0.2          # the sorted column is perfectly tight
    assert by > 0.8          # ...but the other column cannot prune
    # conservation
    t = pads.dataset(zdir).to_table()
    assert t.num_rows == n
    assert len(np.unique(t.column("i").to_numpy())) == n
