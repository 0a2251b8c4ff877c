"""Sessionization: segment per-user event streams by inactivity gaps.

Classic training-data / analytics operator the reference lacks: a
session break is an inter-event gap > timeout within a user's stream.
Implemented on the segmented-lag engine (engine/segmented.py): one
(user, ts) range sort → vectorized per-block gap extraction *keyed by
user* → per-user count of super-timeout gaps (groupby over gap rows —
already ~1 row per event, keys attached) → n_sessions = 1 + #breaks.
Boundary gaps (block-straddling) are stitched exactly on the driver and
folded into the per-user break counts.

Oracle-matched vs the DuckDB LAG window (integer math end-to-end; tie
timestamps are safe because the multiset of diffs of a sorted sequence
is permutation-invariant under equal keys).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

SESSION_TIMEOUT_US = 30 * 60 * 1_000_000  # 30 min


def events_sessions(sf_dir: str, timeout_us: int = SESSION_TIMEOUT_US) -> pd.DataFrame:
    """Per user: event count and session count (gap > timeout ⇒ break)."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.segmented import segmented_gaps

    def project(tbl: pa.Table) -> pa.Table:
        us = tbl.column("ts").combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(tbl.column("user_id"), pa.string()),
                "order_us": us,
                "ts": tbl.column("ts"),
            }
        )

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    gaps_ds, boundary = segmented_gaps(
        ds, key_col="user_id", order_col="order_us", ts_col="ts", keep_gap_keys=True
    )

    # per-user break counts: filter big gaps first (tiny result), then count
    breaks = (
        gaps_ds.filter(expr=f"gap_us > {timeout_us}")
        .groupby("conv_id")
        .count()
        .rename_columns({"count()": "n_breaks", "conv_id": "user_id"})
        .to_pandas()
    )
    big_bnd = boundary[boundary["gap_us"] > timeout_us]
    if len(big_bnd):
        extra = big_bnd.groupby("conv_id").size().reset_index(name="n_breaks")
        extra = extra.rename(columns={"conv_id": "user_id"})
        breaks = (
            pd.concat([breaks, extra])
            .groupby("user_id", as_index=False)["n_breaks"]
            .sum()
        )

    counts = (
        rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id"])
        .groupby("user_id")
        .count()
        .rename_columns({"count()": "n_events"})
        .to_pandas()
    )
    counts["user_id"] = counts["user_id"].astype(np.int64)
    breaks["user_id"] = breaks["user_id"].astype(np.int64)
    out = counts.merge(breaks, on="user_id", how="left")
    out["n_sessions"] = (out["n_breaks"].fillna(0) + 1).astype(np.int64)
    out = out[["user_id", "n_events", "n_sessions"]]
    return out.sort_values("user_id").reset_index(drop=True)


ORACLE_SQL = {
    "events_sessions": f"""
        SELECT user_id,
               COUNT(*) AS n_events,
               1 + COUNT(CASE WHEN gap_us > {SESSION_TIMEOUT_US} THEN 1 END) AS n_sessions
        FROM (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER (
                       PARTITION BY user_id ORDER BY ts) AS gap_us
            FROM events
        ) GROUP BY user_id ORDER BY user_id
    """,
}

QUERIES = {"events_sessions": events_sessions}
