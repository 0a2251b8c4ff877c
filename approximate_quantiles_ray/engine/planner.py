"""Sketch-assisted physical planning.

The three planning questions a distributed engine answers before a
wide operation — how many distinct keys (broadcast or shuffle?), which
keys are hot (salt them), where are the quantiles (range bounds) — are
exactly what this library's sketches answer in one cheap streaming
pass each, without materializing anything key-set-sized:

- :func:`estimate_distinct` — HLL fold (KB of state, ±~1% at p=14);
- :func:`choose_semi_join_strategy` — broadcast vs shuffle from the
  HLL estimate, decided BEFORE any key set is materialized;
- :func:`detect_hot_keys` — count-min + per-block candidates
  (engine.topk.heavy_hitters) thresholded at a share of total rows,
  feeding targeted salting (``grouped_sketches_salted(hot_keys=...)``);
- range bounds live in :mod:`engine.partitioning` (t-digest).

Reference relationship: the sketches are the reference library's
(/root/reference); pointing them at the planner is the Ray-native
extension (SURVEY §4 skew/partitioning design rows).
"""

from __future__ import annotations

import numpy as np

from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns
from approximate_quantiles_ray.sketches.hll import HLL


def estimate_distinct(ds, col: str, p: int = 14, seed: int = 11) -> float:
    """Approximate COUNT(DISTINCT col) from one streaming HLL fold —
    no shuffle, no key-set materialization, KB of driver state."""
    spec = SketchSpec(
        key="d", factory=lambda: HLL(p=p, seed=seed), on=col, kind="hash",
        dedup_per_batch=True,
    )
    return float(sketch_columns(ds, [spec])["d"].estimate())


def choose_semi_join_strategy(
    build_ds, col: str, broadcast_key_cap: int = 4_000_000
) -> tuple[str, float]:
    """'broadcast' when the HLL estimate (padded by its ~2% error band)
    fits the cap, else 'shuffle'. The point of deciding from a sketch:
    the wrong-side key set never has to be collected just to discover
    it was too big to collect."""
    est = estimate_distinct(build_ds, col)
    return ("broadcast" if est * 1.05 <= broadcast_key_cap else "shuffle"), est


def detect_hot_keys(
    ds, col: str, total_rows: int | None = None, share_permille: int = 20, k: int = 64
) -> list:
    """Keys whose estimated frequency is at least share_permille/1000
    of all rows — the salting set for a skewed groupby. One pass:
    per-block candidates + count-min partials (CMS over-estimates, so
    recall is safe; a rare false positive only costs one needlessly
    salted key)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from approximate_quantiles_ray.engine.topk import heavy_hitters

    if total_rows is None:
        total_rows = ds.count()
    orig_type = ds.schema().base_schema.field(col).type

    def to_str(tbl: pa.Table) -> pa.Table:
        i = tbl.column_names.index(col)
        return tbl.set_column(i, col, pc.cast(tbl.column(col), pa.string()))

    # the CMS/top-k kernel hashes strings; cast through and back so any
    # key dtype works and callers get native-typed hot keys
    hh = heavy_hitters(
        ds.map_batches(to_str, batch_format="pyarrow", zero_copy_batch=True), col, k=k
    )
    if not len(hh):
        return []
    thresh = total_rows * share_permille / 1000
    vals = hh.loc[hh["est_count"].to_numpy() >= thresh, "value"].tolist()
    return pa.array(vals, pa.string()).cast(orig_type).to_pylist()
