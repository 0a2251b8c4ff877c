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

from approximate_quantiles_ray.sources.read import read_parquet_sized

SESSION_TIMEOUT_US = 30 * 60 * 1_000_000  # 30 min


def events_sessions(sf_dir: str, timeout_us: int = SESSION_TIMEOUT_US) -> pd.DataFrame:
    """Per user: event count and session count (gap > timeout ⇒ break).

    Fused single pass (round 2): one (user, ts) sort → one map_batches
    that emits per-block (user, n_events, n_breaks) partials + boundary
    rows (engine/segmented.segmented_session_partials) → adaptive fold.
    Nothing row-scale leaves a block; the old version materialized one
    gap row per event and read the table twice.
    """

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg
    from approximate_quantiles_ray.engine.segmented import segmented_session_partials

    def project(tbl: pa.Table) -> pa.Table:
        us = tbl.column("ts").combine_chunks().cast(pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(tbl.column("user_id"), pa.string()),
                "order_us": us,
                "ts": tbl.column("ts"),
            }
        )

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
    part, boundary = segmented_session_partials(
        ds, key_col="user_id", order_col="order_us", ts_col="ts", timeout_us=timeout_us
    )
    out = adaptive_grouped_agg(part, ["key"], {"n_events": "sum", "n_breaks": "sum"})
    out = out.rename(columns={"key": "user_id"})

    big_bnd = boundary[boundary["gap_us"] > timeout_us]
    if len(big_bnd):
        extra = big_bnd.groupby("conv_id").size()
        idx = out.set_index("user_id")
        idx.loc[extra.index, "n_breaks"] = idx.loc[extra.index, "n_breaks"] + extra
        out = idx.reset_index()

    out["user_id"] = out["user_id"].astype(np.int64)
    out["n_sessions"] = (out["n_breaks"] + 1).astype(np.int64)
    out = out[["user_id", "n_events", "n_sessions"]]
    return out.sort_values("user_id").reset_index(drop=True)


def events_sessions_stream(
    sf_dir: str, timeout_us: int = SESSION_TIMEOUT_US, engine: str = "distributed"
) -> pd.DataFrame:
    """Session-window engine, oracle-checked against the same LAG SQL
    as the batch path, then reduced to (user_id, n_events, n_sessions).

    ``engine="distributed"`` (default, the scale path): session windows
    are mergeable gap-interval unions, so each block reduces to per-key
    merged intervals and a fold re-sweeps
    (engine/streaming.stream_sessions_distributed) — events never reach
    the driver. ``engine="replay"`` drives the micro-batch
    SessionStreamAggregator with unbounded lateness (nothing finalizes
    early → exact); both produce identical sessions (equivalence is
    pytest-gated in tests/test_streaming.py).

    Equivalence note: a session's event count by interval merging
    equals the batch rule's (gap > timeout ⇒ break) when "extends"
    means ts within ``timeout_us`` of the session span INCLUSIVE — the
    batch break is strict (>), so the streaming gap uses the same
    convention (events exactly timeout apart stay in one session).
    """
    from approximate_quantiles_ray.engine.streaming import (
        stream_sessions,
        stream_sessions_distributed,
    )

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])
    if engine == "distributed":
        sess = stream_sessions_distributed(
            ds, ["user_id"], ts_col="ts", gap_us=timeout_us
        )
    else:
        sess = stream_sessions(
            ds, ["user_id"], ts_col="ts", gap_us=timeout_us, allowed_lateness_us=1 << 62
        )
    if not len(sess):
        return pd.DataFrame(
            {
                "user_id": pd.Series(dtype=np.int64),
                "n_events": pd.Series(dtype=np.int64),
                "n_sessions": pd.Series(dtype=np.int64),
            }
        )
    out = (
        sess.groupby("user_id", as_index=False)
        .agg(n_events=("n_events", "sum"), n_sessions=("session_start_us", "size"))
        .astype({"user_id": np.int64, "n_events": np.int64, "n_sessions": np.int64})
    )
    return out.sort_values("user_id").reset_index(drop=True)


ORACLE_SQL = {
    "events_sessions_stream": f"""
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

QUERIES = {
    "events_sessions": events_sessions,
    "events_sessions_stream": events_sessions_stream,
}


DEDUP_WINDOW_US = 3_600_000_000  # 1 h repeat-suppression window


def events_windowed_dedup(sf_dir: str, window_us: int = DEDUP_WINDOW_US) -> pd.DataFrame:
    """WINDOWED EVENT DEDUP (oracle-matched vs LAG): per event type,
    how many events are repeats — the same (user, type) firing again
    within ``window_us`` of the PREVIOUS occurrence — and how many
    survive suppression. The repeat-event filter every ingest runs
    before counting anything.

    Plan: one (type|user, ts) range sort through the fused segmented
    engine (segmented_session_partials with the dedup window as the
    "timeout"): a repeat is exactly a gap ≤ window, so per-key
    ``n_dups = (n − 1) − breaks`` where breaks counts gaps > window —
    in-block partials plus the 2-per-block boundary stitching, nothing
    row-scale leaves a block. The composite key splits back to the
    type for the final grouping.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg
    from approximate_quantiles_ray.engine.segmented import segmented_session_partials

    def project(tbl: pa.Table) -> pa.Table:
        us = tbl.column("ts").combine_chunks().cast(pa.int64())
        key = pc.binary_join_element_wise(
            tbl.column("event_type").combine_chunks(),
            pc.cast(tbl.column("user_id").combine_chunks(), pa.string()),
            "|",
        )
        return pa.table({"key": key, "order_us": us, "ts": tbl.column("ts")})

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type", "ts"]
    ).map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
    part, boundary = segmented_session_partials(
        ds, key_col="key", order_col="order_us", ts_col="ts", timeout_us=window_us
    )
    per_key = adaptive_grouped_agg(part, ["key"], {"n_events": "sum", "n_breaks": "sum"})

    big_bnd = boundary[boundary["gap_us"] > window_us]
    if len(big_bnd):
        extra = big_bnd.groupby("conv_id").size()
        idx = per_key.set_index("key")
        idx.loc[extra.index, "n_breaks"] = idx.loc[extra.index, "n_breaks"] + extra
        per_key = idx.reset_index()

    per_key["event_type"] = per_key["key"].str.split("|", n=1).str[0]
    per_key["n_dups"] = per_key["n_events"] - 1 - per_key["n_breaks"]
    out = per_key.groupby("event_type", as_index=False).agg(
        n_events=("n_events", "sum"), n_dups=("n_dups", "sum")
    )
    out["n_kept"] = (out["n_events"] - out["n_dups"]).astype(np.int64)
    out["n_events"] = out["n_events"].astype(np.int64)
    out["n_dups"] = out["n_dups"].astype(np.int64)
    return out.sort_values("event_type").reset_index(drop=True)


ORACLE_SQL["events_windowed_dedup"] = f"""
    WITH g AS (
        SELECT event_type,
               epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                   PARTITION BY user_id, event_type ORDER BY ts) AS gap_us
        FROM events)
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(*) FILTER (WHERE gap_us <= {DEDUP_WINDOW_US}) AS n_dups,
           COUNT(*) - COUNT(*) FILTER (WHERE gap_us <= {DEDUP_WINDOW_US}) AS n_kept
    FROM g GROUP BY 1 ORDER BY 1
"""
QUERIES["events_windowed_dedup"] = events_windowed_dedup
