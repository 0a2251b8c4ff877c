"""Tumbling-window aggregates over timestamp columns.

The reference has no window semantics (SURVEY.md §2.6); a transcript /
event engine needs them. A tumbling window is just a derived grouping
key — ``floor_temporal(ts, unit)`` via the Arrow kernel — so windowed
aggregation reuses the grouped machinery: exact counts per window
(oracle-matched vs DuckDB date_trunc) and per-window *sketches*
(grouped_sketches with the window as the key). Windows partition time,
so per-window partial states combine exactly like any group — no
watermarks needed for bounded (batch) data.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.engine.udaf import (
    SketchSpec,
    grouped_sketches,
    text_length_transform,
)
from approximate_quantiles_ray.sketches.base import sketch_from_bytes
from approximate_quantiles_ray.sketches.tdigest import TDigest


def add_window_column(tbl: pa.Table, ts_col: str, unit: str, name: str = "window_start") -> pa.Table:
    """Append the tumbling-window start (ts floored to ``unit``:
    'hour' | 'day' | 'week' ...)."""
    # cast to µs so the pandas dtype (datetime64[us]) matches DuckDB's
    # date_trunc output exactly — the driver's value hash is dtype-aware
    w = pc.floor_temporal(tbl.column(ts_col), unit=unit).cast(pa.timestamp("us"))
    return tbl.append_column(name, w)


def events_hourly_stats(sf_dir: str) -> pd.DataFrame:
    """Per (hour, event_type): count, distinct users, min/max value —
    exact, bit-identical to the DuckDB date_trunc oracle."""
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Min

    ds = rd.read_parquet(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id", "value"]
    ).map_batches(
        lambda t: add_window_column(t, "ts", "hour").drop_columns(["ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    base = (
        ds.groupby(["window_start", "event_type"])
        .aggregate(Count(), Min("value"), Max("value"))
        .rename_columns(
            {"count()": "n_events", "min(value)": "value_min", "max(value)": "value_max"}
        )
        .to_pandas()
    )
    dist = (
        ds.select_columns(["window_start", "event_type", "user_id"])
        .groupby(["window_start", "event_type", "user_id"])
        .count()
        .groupby(["window_start", "event_type"])
        .count()
        .rename_columns({"count()": "n_users"})
        .to_pandas()
    )
    out = base.merge(dist, on=["window_start", "event_type"])
    out = out[["window_start", "event_type", "n_events", "n_users", "value_min", "value_max"]]
    # Ray's hash-groupby round-trips timestamps through [s]; restore µs
    # so the pandas dtype matches DuckDB date_trunc (dtype-aware hash)
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def transcript_daily_text_len(sf_dir: str) -> pd.DataFrame:
    """Windowed SKETCH aggregate: one t-digest of text length per day
    (grouped_sketches with the window as key) → per-day p50/p99."""
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.transcript_exact import transcripts_dir_for

    ds = rd.read_parquet(transcripts_dir_for(sf_dir), columns=["ts", "text"]).map_batches(
        lambda t: add_window_column(t, "ts", "day").drop_columns(["ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    text_len = text_length_transform("text")
    spec = SketchSpec(
        key="len_td", factory=lambda: TDigest(delta=300, scale="k2"), transform=text_len
    )
    agg = grouped_sketches(ds, "window_start", [spec]).to_pandas()
    rows = []
    for _, row in agg.iterrows():
        sk = sketch_from_bytes(row["len_td"])
        rows.append(
            {
                "window_start": row["window_start"],
                "n_turns": int(sk.count),
                "len_p50": sk.est_value_at_quantile(0.5),
                "len_p99": sk.est_value_at_quantile(0.99),
            }
        )
    return pd.DataFrame(rows).sort_values("window_start").reset_index(drop=True)


ORACLE_SQL = {
    "events_hourly_stats": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               MIN(value) AS value_min, MAX(value) AS value_max
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
}

QUERIES = {
    "events_hourly_stats": events_hourly_stats,
    "transcript_daily_text_len": transcript_daily_text_len,
}
