"""Adaptive grouped aggregation over per-block partials.

Measured on this sandbox (BASELINE.md §5.4): Ray's hash
``groupby().aggregate()`` pays ~11 s of all-to-all stage latency per
1M partial rows at 200 blocks — an order of magnitude over a pandas
fold of the same partials on the driver. Every exact grouped pipeline
therefore reduces each block to its distinct-key partial rows first
(Arrow C++ group_by inside map_batches — this is the part that MUST be
distributed), then picks the combine plan by the materialized partial's
row count (free metadata):

- ≤ ``cap`` rows (default 4M ≈ bounded driver memory): one vectorized
  pandas groupby on the driver — no shuffle at all;
- above the cap: Ray's distributed groupby — the 100 TB path, where
  partial rows are ∝ #groups × #blocks and a driver fold would not fit.

The cap check is conservative: partial rows over-count distinct groups.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_PANDAS_AGG = {"sum": "sum", "min": "min", "max": "max", "count": "sum"}


def _ts_columns(part) -> dict[str, "pa.DataType"]:
    """Timestamp columns of a materialized Dataset (by arrow schema)."""
    try:
        sch = part.schema().base_schema
    except Exception:
        return {}
    if sch is None:
        return {}
    return {f.name: f.type for f in sch if pa.types.is_timestamp(f.type)}


def _encode_ts(ds, cols: dict):
    """Cast timestamp columns to int64 µs ticks. Ray's hash groupby
    round-trips timestamp values through coarser precision (measured:
    [s] — windows.py round-2 note), which would silently corrupt
    µs-precision MIN/MAX anchors on the over-cap path (round-2 ADVICE
    item 2); min/max/compare on int64 ticks are loss-free."""
    if not cols:
        return ds

    def enc(t: pa.Table) -> pa.Table:
        for c, _ in cols.items():
            if c in t.column_names:
                i = t.column_names.index(c)
                col = t.column(c).combine_chunks().cast(pa.timestamp("us")).cast(pa.int64())
                t = t.set_column(i, c, col)
        return t

    return ds.map_batches(enc, batch_format="pyarrow", zero_copy_batch=True)


def _decode_ts(obj, cols: dict):
    """Restore int64 µs ticks to the original timestamp types, on a
    Dataset or a pandas DataFrame."""
    if not cols:
        return obj
    if isinstance(obj, pd.DataFrame):
        for c, typ in cols.items():
            if c in obj.columns:
                unit = getattr(typ, "unit", "us")
                obj[c] = pd.to_datetime(obj[c], unit="us").astype(f"datetime64[{unit}]")
        return obj

    def dec(t: pa.Table) -> pa.Table:
        for c, typ in cols.items():
            if c in t.column_names:
                i = t.column_names.index(c)
                col = t.column(c).combine_chunks().cast(pa.timestamp("us")).cast(typ)
                t = t.set_column(i, c, col)
        return t

    return obj.map_batches(dec, batch_format="pyarrow", zero_copy_batch=True)


def _ray_aggs(spec: dict[str, str]):
    from ray.data.aggregate import Max, Min, Sum

    ray_aggs, renames = [], {}
    for c, kind in spec.items():
        if kind in ("sum", "count"):
            ray_aggs.append(Sum(c))
            renames[f"sum({c})"] = c
        elif kind == "min":
            ray_aggs.append(Min(c))
            renames[f"min({c})"] = c
        else:
            ray_aggs.append(Max(c))
            renames[f"max({c})"] = c
    return ray_aggs, renames


def _nan_to_null(ds, spec: dict[str, str]):
    """NaN partials (a block whose group had no valid values) must fold
    like SQL NULL: pandas min/max skip NaN, but Arrow/Ray MIN treats
    NaN as a comparable value (an all-NaN group folds to ±inf) — so on
    the over-cap path NaN min/max partials become nulls first, making
    both paths agree (and match DuckDB's NULL-skipping aggregates)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cols = [c for c, k in spec.items() if k in ("min", "max")]
    if not cols:
        return ds

    def fix(tbl: pa.Table) -> pa.Table:
        for c in cols:
            col = tbl.column(c)
            if pa.types.is_floating(col.type):
                i = tbl.column_names.index(c)
                col = col.combine_chunks()
                tbl = tbl.set_column(
                    i, c, pc.if_else(pc.is_nan(col), pa.scalar(None, col.type), col)
                )
        return tbl

    return ds.map_batches(fix, batch_format="pyarrow", zero_copy_batch=True)


def adaptive_grouped_agg_ds(
    part_ds,
    keys: list[str],
    spec: dict[str, str],
    cap: int = 1 << 22,
):
    """Like :func:`adaptive_grouped_agg` but the over-cap path returns
    the grouped Ray Dataset WITHOUT materializing it on the driver —
    the right entry when the per-group result itself is big (per-conv
    rows at 10^12 turns) and the caller will ``write_parquet`` or keep
    reducing. Returns (result, is_dataset)."""
    part = part_ds.materialize()
    if part.count() <= cap:
        df = part.to_pandas()
        if len(df):
            df = df.groupby(keys, as_index=False).agg(
                {c: _PANDAS_AGG[kind] for c, kind in spec.items()}
            )[keys + list(spec)]
        return df, False
    ray_aggs, renames = _ray_aggs(spec)
    ts_cols = _ts_columns(part)  # µs-safe over-cap path (ADVICE r2 item 2)
    enc = _nan_to_null(_encode_ts(part, ts_cols), spec)
    grouped = enc.groupby(keys).aggregate(*ray_aggs)
    return _decode_ts(grouped.rename_columns(renames), ts_cols), True


def adaptive_grouped_agg(
    part_ds,
    keys: list[str],
    spec: dict[str, str],
    cap: int = 1 << 22,
) -> pd.DataFrame:
    """Combine per-block partial rows into final per-group aggregates.

    ``spec`` maps column → "sum" | "min" | "max" ("count" partials are
    summed — counting happened in the per-block reduction). Returns a
    pandas DataFrame with columns ``keys + list(spec)`` — i.e. the
    FINAL result lands on the driver either way, which is fine for the
    oracle-gated query surface (small outputs) but wrong for per-group
    results that are themselves corpus-scale: use
    :func:`adaptive_grouped_agg_ds` there and write the Dataset out.
    """
    out, is_ds = adaptive_grouped_agg_ds(part_ds, keys, spec, cap)
    if is_ds:
        out = out.to_pandas()[keys + list(spec)]
    return out


def adaptive_distinct_stats(
    part_ds,
    group_keys: list[str],
    distinct_key: str,
    spec: dict[str, str],
    cap: int = 1 << 22,
) -> pd.DataFrame:
    """Per-group aggregates PLUS an exact distinct count, from per-block
    partial rows keyed by (group_keys…, distinct_key).

    Level 1 combines partials per (group, distinct) — the wide step;
    level 2 collapses to one row per group, counting level-1 rows as
    ``n_distinct``. Below ``cap`` both levels are pandas on the driver
    (no shuffle); above it both run as Ray groupbys and only the final
    per-group rows (tiny) reach the driver.
    """
    all_keys = group_keys + [distinct_key]
    part = part_ds.materialize()
    if part.count() <= cap:
        df = part.to_pandas()
        if not len(df):
            return df
        pagg = {c: _PANDAS_AGG[k] for c, k in spec.items()}
        lvl1 = df.groupby(all_keys, as_index=False).agg(pagg)
        out = lvl1.groupby(group_keys, as_index=False).agg(pagg)
        out["n_distinct"] = lvl1.groupby(group_keys).size().to_numpy()
        return out[group_keys + list(spec) + ["n_distinct"]]

    from ray.data.aggregate import Count

    aggs1, ren1 = _ray_aggs(spec)
    ts_cols = _ts_columns(part)  # µs-safe over-cap path (ADVICE r2 item 2)
    lvl1 = (
        _nan_to_null(_encode_ts(part, ts_cols), spec)
        .groupby(all_keys)
        .aggregate(*aggs1)
        .rename_columns(ren1)
    )
    aggs2, ren2 = _ray_aggs(spec)
    out = (
        lvl1.groupby(group_keys)
        .aggregate(*aggs2, Count())
        .rename_columns({**ren2, "count()": "n_distinct"})
        .to_pandas()
    )
    return _decode_ts(out, ts_cols)[group_keys + list(spec) + ["n_distinct"]]


def adaptive_distinct_pairs(part_ds, cols: list[str], cap: int = 1 << 22) -> pd.DataFrame:
    """DISTINCT rows of integer key columns from per-block partials —
    the degenerate fold where no aggregate survives, only membership
    (FK audits, semi-join key sets).

    Below ``cap`` the combine is one numpy lexsort + neighbor-diff over
    the arrow columns (no pandas hash table — measured ~5× cheaper than
    groupby on the FK audit's 1.3M sf0.1 partial rows); above it a Ray
    distributed groupby dedups on the cluster and only distinct rows
    reach the driver.
    """
    import numpy as np
    import pyarrow as pa

    part = part_ds.materialize()
    if part.count() <= cap:
        tbl = pa.concat_tables(
            part.iter_batches(batch_format="pyarrow", batch_size=None)
        )
        if tbl.num_rows == 0:
            return pd.DataFrame({c: np.zeros(0, np.int64) for c in cols})
        arrs = [
            tbl.column(c).combine_chunks().to_numpy(zero_copy_only=False)
            for c in cols
        ]
        order = np.lexsort(tuple(reversed(arrs)))
        sorted_arrs = [a[order] for a in arrs]
        keep = np.zeros(len(order), bool)
        keep[0] = True
        for a in sorted_arrs:
            keep[1:] |= a[1:] != a[:-1]
        return pd.DataFrame({c: a[keep] for c, a in zip(cols, sorted_arrs)})

    from ray.data.aggregate import Count

    out = part.groupby(cols).aggregate(Count()).to_pandas()
    return out[cols]
