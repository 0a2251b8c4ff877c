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
