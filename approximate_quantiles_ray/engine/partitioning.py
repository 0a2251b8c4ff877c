"""Sketch-driven range partitioning — the quantile library applied to
the engine's own core problem.

A balanced range partitioner is THE canonical production use of a
mergeable quantile sketch (Spark's RangePartitioner, DuckDB's radix
ranges): to range-split a 100 TB sort or layout without first sorting,
you need the column's quantiles, and an exact pass is exactly what you
cannot afford. One streaming t-digest fold (``engine.udaf``, shuffle-
free, KB of state) yields cut points that bound every partition within
the sketch's rank error — independent of how skewed the distribution
is, which is precisely where naive equal-width splitting collapses.

Reference relationship: the reference library (/root/reference, Rust
t-digest/RC sketches) provides the estimator; wiring it into a
partitioner is the Ray-Data-native extension (SURVEY §2.6 —
partitioning/skew handling is mandated by BASELINE.json north_rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns
from approximate_quantiles_ray.sketches.tdigest import TDigest


def quantile_bounds(ds, col: str, n_parts: int, delta: int = 500) -> np.ndarray:
    """n_parts-1 range cut points for ``col`` from ONE streaming
    t-digest fold (no sort, no shuffle; driver state = one digest)."""
    if n_parts < 2:
        return np.zeros(0, np.float64)
    spec = SketchSpec(key="bounds", factory=lambda: TDigest(delta), on=col)
    sk = sketch_columns(ds, [spec])["bounds"]
    qs = np.arange(1, n_parts) / n_parts
    return np.array([sk.est_value_at_quantile(float(q)) for q in qs], np.float64)


def assign_partition(values: np.ndarray, bounds: np.ndarray) -> np.ndarray:
    """Partition index per value: searchsorted against the cut points
    (right-closed: value == bound goes to the lower partition)."""
    return np.searchsorted(bounds, values, side="left").astype(np.int64)


def write_range_partitioned(
    ds,
    col: str,
    out_dir: str,
    n_parts: int,
    bounds: np.ndarray | None = None,
    delta: int = 500,
) -> np.ndarray:
    """Write ``ds`` as a hive range-partitioned layout on ``col``.

    Pays one sketch fold + one streaming write — never a global sort.
    The layout gives downstream consumers partition pruning on range
    predicates (read only the parts overlapping [lo, hi]) and
    near-uniform part sizes even on heavily skewed columns. Returns
    the cut points so readers can route predicates.
    """
    if bounds is None:
        bounds = quantile_bounds(ds, col, n_parts, delta)
    b = bounds

    def assign(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).combine_chunks().to_numpy(zero_copy_only=False)
        return tbl.append_column("part", pa.array(assign_partition(v, b)))

    ds.map_batches(assign, batch_format="pyarrow", zero_copy_batch=True).write_parquet(
        out_dir, partition_cols=["part"]
    )
    return bounds


def range_partition_stats(ds, col: str, n_parts: int, delta: int = 500):
    """Per-partition row counts under sketch-derived bounds (the
    balance audit): one sketch fold + one counting pass, both
    streaming. Returns (bounds, counts ndarray of length n_parts)."""
    bounds = quantile_bounds(ds, col, n_parts, delta)

    def block_counts(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col).combine_chunks().to_numpy(zero_copy_only=False)
        c = np.bincount(assign_partition(v, bounds), minlength=n_parts)
        return pa.table(
            {
                "part": pa.array(np.arange(n_parts, dtype=np.int64)),
                "n": pa.array(c.astype(np.int64)),
            }
        )

    import pandas as pd

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    counts = (
        part.to_pandas().groupby("part")["n"].sum().reindex(range(n_parts), fill_value=0)
    )
    return bounds, counts.to_numpy(np.int64)


def _morton_interleave(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave the low 32 bits of two uint64 rank arrays into one
    uint64 Morton (Z-order) code, fully vectorized (magic-number bit
    spreading)."""

    def spread(x: np.ndarray) -> np.ndarray:
        x = x.astype(np.uint64) & np.uint64(0xFFFFFFFF)
        x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
        x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
        return x

    return spread(a) | (spread(b) << np.uint64(1))


def zorder_values(x: np.ndarray, y: np.ndarray,
                  x_bounds: np.ndarray, y_bounds: np.ndarray) -> np.ndarray:
    """Z-order codes from two value arrays: each value is first mapped
    to its sketch-derived quantile CELL (rank-space, so skew cannot
    collapse the curve the way raw-value bit-slicing does), then the
    two cell indices interleave into one Morton code."""
    xr = np.searchsorted(x_bounds, x, side="left").astype(np.uint64)
    yr = np.searchsorted(y_bounds, y, side="left").astype(np.uint64)
    return _morton_interleave(xr, yr)


def write_zordered(
    ds,
    col_x: str,
    col_y: str,
    out_dir: str,
    cells_per_dim: int = 256,
    rows_per_file: int = 100_000,
    delta: int = 500,
):
    """Z-ORDER layout: sort by the Morton interleave of the two
    columns' sketch-derived quantile cells, so BOTH columns' per-file
    min/max ranges stay tight and range predicates on EITHER column
    prune files — the multi-dimensional clustering a single-column
    sort cannot give (Delta/Iceberg OPTIMIZE ZORDER, built here from
    the library's own t-digest rank mapping).

    One fold per column for the cell bounds, one range sort on the
    code, one partitioned write. Returns (x_bounds, y_bounds).
    """
    import pyarrow as pa

    if cells_per_dim > (1 << 20):
        # keeps the interleaved code under 2^62 so the int64 view used
        # for the Ray sort preserves the uint64 order
        raise ValueError("cells_per_dim must be <= 2^20")
    xb = quantile_bounds(ds, col_x, cells_per_dim, delta)
    yb = quantile_bounds(ds, col_y, cells_per_dim, delta)

    def add_code(tbl: pa.Table) -> pa.Table:
        x = tbl.column(col_x).combine_chunks().to_numpy(zero_copy_only=False)
        y = tbl.column(col_y).combine_chunks().to_numpy(zero_copy_only=False)
        z = zorder_values(x, y, xb, yb)
        return tbl.append_column("zcode", pa.array(z.view(np.int64)))

    (
        ds.map_batches(add_code, batch_format="pyarrow", zero_copy_batch=True)
        .sort("zcode")
        .write_parquet(out_dir, max_rows_per_file=rows_per_file,
                       min_rows_per_file=rows_per_file)
    )
    return xb, yb
