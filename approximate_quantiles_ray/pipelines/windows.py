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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.engine.udaf import SketchSpec, text_length_transform
from approximate_quantiles_ray.sketches.tdigest import TDigest

from approximate_quantiles_ray.sources.read import read_parquet_sized


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

    from approximate_quantiles_ray.engine.folds import adaptive_distinct_stats

    def block_partials(tbl: pa.Table) -> pa.Table:
        t = add_window_column(tbl, "ts", "hour").drop_columns(["ts"])
        # count_all = COUNT(*) semantics (NULL values still count)
        agg = t.group_by(["window_start", "event_type", "user_id"]).aggregate(
            [([], "count_all"), ("value", "min"), ("value", "max")]
        )
        return agg.rename_columns(
            ["window_start", "event_type", "user_id", "n_events", "value_min", "value_max"]
        )

    ds = read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "user_id", "value"]
    )
    part = ds.map_batches(block_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = adaptive_distinct_stats(
        part,
        ["window_start", "event_type"],
        "user_id",
        {"n_events": "sum", "value_min": "min", "value_max": "max"},
    ).rename(columns={"n_distinct": "n_users"})
    out = out[["window_start", "event_type", "n_events", "n_users", "value_min", "value_max"]]
    # a Ray-groupby fold round-trips timestamps through [s]; restore µs
    # so the pandas dtype matches DuckDB date_trunc (dtype-aware hash)
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


def transcript_daily_text_len(sf_dir: str) -> pd.DataFrame:
    """Windowed SKETCH aggregate: one t-digest of text length per day
    (grouped_sketches with the window as key) → per-day p50/p99."""

    from approximate_quantiles_ray.pipelines.transcript_exact import transcripts_dir_for

    ds = read_parquet_sized(transcripts_dir_for(sf_dir), columns=["ts", "text"]).map_batches(
        lambda t: add_window_column(t, "ts", "day").drop_columns(["ts"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    from approximate_quantiles_ray.engine.udaf import grouped_sketches_partial

    text_len = text_length_transform("text")
    spec = SketchSpec(
        key="len_td", factory=lambda: TDigest(delta=300, scale="k2"), transform=text_len
    )
    # ~30 day-windows → the shuffle-free per-block-partial grouped path
    merged = grouped_sketches_partial(ds, "window_start", [spec])
    rows = []
    for g, sks in merged.items():
        sk = sks["len_td"]
        rows.append(
            {
                "window_start": g,
                "n_turns": int(sk.count),
                "len_p50": sk.est_value_at_quantile(0.5),
                "len_p99": sk.est_value_at_quantile(0.99),
            }
        )
    return pd.DataFrame(rows).sort_values("window_start").reset_index(drop=True)


def grouped_quantile_disc(ds, key_col: str, val_col: str, qs: tuple[float, ...]) -> pd.DataFrame:
    """Exact per-group quantile_disc + count + sum for a DISCRETE value
    column, in one pass.

    Plan: per-block Arrow ``group_by((key, val)).count`` reduces each
    block to its distinct (key, value) pairs → one Ray groupby sums the
    partials → the (small) per-group histograms come to the driver for
    the cumulative walk. Driver size is #groups × #distinct-values —
    the right plan when the value space is discrete (string lengths,
    token counts); for near-continuous values use
    relational.quantiles_from_histogram per group instead.

    Returns one row per key: (key, n, total, q_<q> ...) — counts and
    the value sum fall out of the same histogram (Σ v·n), so no second
    pass over the data.
    """
    import math

    def block_counts(tbl: pa.Table) -> pa.Table:
        agg = tbl.select([key_col, val_col]).group_by([key_col, val_col]).aggregate(
            [([], "count_all")]
        )
        return agg.rename_columns([key_col, val_col, "n"])

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    hist = adaptive_grouped_agg(part, [key_col, val_col], {"n": "sum"})
    hist = hist.sort_values([key_col, val_col]).reset_index(drop=True)
    rows = []
    for key, g in hist.groupby(key_col, sort=True):
        vals = g[val_col].to_numpy()
        cnt = g["n"].to_numpy()
        cum = np.cumsum(cnt)
        n = int(cum[-1])
        row = {key_col: key, "n": n, "total": int((vals * cnt).sum())}
        for q in qs:
            idx = max(0, math.ceil(q * n) - 1)
            row[f"q{q}"] = vals[int(np.searchsorted(cum, idx + 1))]
        rows.append(row)
    return pd.DataFrame(rows)


def transcript_daily_exact(sf_dir: str) -> pd.DataFrame:
    """Exact per-day turn count, total chars, and p50/p99 text length —
    the oracle-matched twin of transcript_daily_text_len's sketch path
    (DuckDB: date_trunc + CAST(SUM(...) AS BIGINT) + quantile_disc)."""

    from approximate_quantiles_ray.pipelines.transcript_exact import transcripts_dir_for

    ds = read_parquet_sized(transcripts_dir_for(sf_dir), columns=["ts", "text"]).map_batches(
        lambda t: add_window_column(t, "ts", "day")
        .append_column("len", pc.cast(pc.utf8_length(t.column("text")), pa.int64()))
        .drop_columns(["ts", "text"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    out = grouped_quantile_disc(ds, "window_start", "len", (0.5, 0.99))
    out = out.rename(
        columns={"n": "n_turns", "total": "total_chars", "q0.5": "len_p50", "q0.99": "len_p99"}
    )
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    out = out[["window_start", "n_turns", "total_chars", "len_p50", "len_p99"]]
    return out.sort_values("window_start").reset_index(drop=True)


def events_hourly_stream_counts(sf_dir: str) -> pd.DataFrame:
    """The STREAMING window engine (engine/streaming.py), oracle-checked:
    replay the events table through StreamingWindowAggregator with
    1-hour tumbling windows and unbounded allowed lateness — no window
    finalizes before flush, so per-window row counts are exact for ANY
    replay order (the late-data path is exercised separately with tight
    watermarks in tests/test_streaming.py). Output is bit-identical to
    the batch date_trunc oracle, proving the streaming state machinery
    (window assignment, per-window state, flush) agrees with SQL.
    """
    from approximate_quantiles_ray.engine.streaming import stream_windows

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])
    df = stream_windows(
        ds, [], ts_col="ts", window_us=3_600_000_000,
        allowed_lateness_us=1 << 62,  # nothing finalizes early → exact
    )
    out = pd.DataFrame(
        {
            "window_start": pd.to_datetime(df["window_start_us"], unit="us").astype(
                "datetime64[us]"
            ),
            "n_events": df["rows"].astype(np.int64),
        }
    )
    return out.sort_values("window_start").reset_index(drop=True)


def events_hourly_stream_counts_dist(sf_dir: str) -> pd.DataFrame:
    """The SAME hourly tumbling-window computation through the
    DISTRIBUTED global streaming path (per-block aggregators replayed in
    map_batches, one driver merge+flush of #blocks serialized states —
    event rows never reach the driver), oracle-checked against the same
    batch date_trunc SQL as the sequential replay."""
    from approximate_quantiles_ray.engine.streaming import stream_windows_distributed

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts"])
    df = stream_windows_distributed(ds, [], ts_col="ts", window_us=3_600_000_000)
    out = pd.DataFrame(
        {
            "window_start": pd.to_datetime(df["window_start_us"], unit="us").astype(
                "datetime64[us]"
            ),
            "n_events": df["rows"].astype(np.int64),
        }
    )
    return out.sort_values("window_start").reset_index(drop=True)


def events_hourly_keyed_stream_counts(sf_dir: str) -> pd.DataFrame:
    """The KEYED streaming engine (per event_type state), oracle-checked
    against the batch grouping: replay events through hourly tumbling
    windows keyed by event_type with unbounded lateness (nothing
    finalizes early → exact counts)."""
    from approximate_quantiles_ray.engine.streaming import stream_keyed_windows

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    df = stream_keyed_windows(
        ds, [], ["event_type"], ts_col="ts",
        window_us=3_600_000_000, allowed_lateness_us=1 << 62,
    )
    out = pd.DataFrame(
        {
            "window_start": pd.to_datetime(df["window_start_us"], unit="us").astype(
                "datetime64[us]"
            ),
            "event_type": df["event_type"].astype(str),
            "n_events": df["rows"].astype(np.int64),
        }
    )
    return out.sort_values(["window_start", "event_type"]).reset_index(drop=True)


_SLIDE_US = 900_000_000  # 15 min stride under a 1 h window (4 panes)


def events_sliding_stream_counts_demo(sf_dir: str) -> pd.DataFrame:
    """SLIDING windows (1 h window, 15 min slide — each event in 4
    windows), keyed by event_type, through the SEQUENTIAL streaming
    replay. Demo/pytest reference ONLY (driver micro-batch loop): the
    registered `events_sliding_stream_counts` runs the distributed
    plan; this stays as the sequential-equivalence ground truth."""
    from approximate_quantiles_ray.engine.streaming import stream_keyed_windows

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    df = stream_keyed_windows(
        ds, [], ["event_type"], ts_col="ts",
        window_us=3_600_000_000, slide_us=_SLIDE_US, allowed_lateness_us=1 << 62,
    )
    out = pd.DataFrame(
        {
            "window_start_us": df["window_start_us"].astype(np.int64),
            "event_type": df["event_type"].astype(str),
            "n_events": df["rows"].astype(np.int64),
        }
    )
    return out.sort_values(["window_start_us", "event_type"]).reset_index(drop=True)


def events_sliding_stream_counts_dist(sf_dir: str) -> pd.DataFrame:
    """The SAME sliding-window computation through the DISTRIBUTED
    streaming path (per-block aggregators replayed in map_batches, one
    driver merge+flush of #blocks serialized states — event rows never
    reach the driver), oracle-checked against the identical DuckDB
    pane-offset expansion as the sequential replay."""
    from approximate_quantiles_ray.engine.streaming import (
        stream_keyed_windows_distributed,
    )

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])
    df = stream_keyed_windows_distributed(
        ds, [], ["event_type"], ts_col="ts",
        window_us=3_600_000_000, slide_us=_SLIDE_US,
    )
    out = pd.DataFrame(
        {
            "window_start_us": df["window_start_us"].astype(np.int64),
            "event_type": df["event_type"].astype(str),
            "n_events": df["rows"].astype(np.int64),
        }
    )
    return out.sort_values(["window_start_us", "event_type"]).reset_index(drop=True)


def oracle_sql(sf_dir: str) -> dict[str, str]:
    """sf-dir-dependent oracles (the transcript table lives under /tmp,
    not in the driver's pre-registered views)."""
    from approximate_quantiles_ray.pipelines.transcript_exact import _tdir_glob

    return {
        "transcript_daily_exact": f"""
            SELECT date_trunc('day', ts) AS window_start,
                   COUNT(*) AS n_turns,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
                   quantile_disc(LENGTH(text), 0.5) AS len_p50,
                   quantile_disc(LENGTH(text), 0.99) AS len_p99
            FROM read_parquet('{_tdir_glob(sf_dir)}')
            GROUP BY 1 ORDER BY 1
        """,
    }


ORACLE_SQL = {
    "events_hourly_stream_counts": """
        SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_hourly_stream_counts_dist": """
        SELECT date_trunc('hour', ts) AS window_start, COUNT(*) AS n_events
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "events_hourly_keyed_stream_counts": """
        SELECT date_trunc('hour', ts) AS window_start, event_type,
               COUNT(*) AS n_events
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    # sliding panes: every event belongs to the 4 slide-aligned windows
    # covering it — expand with a pane-offset cross join
    "events_sliding_stream_counts": f"""
        WITH offs AS (SELECT UNNEST(range(0, 4)) AS i),
        e AS (SELECT epoch_us(ts) AS t, event_type FROM events)
        SELECT CAST((t // {_SLIDE_US}) * {_SLIDE_US} - i * {_SLIDE_US} AS BIGINT)
                   AS window_start_us,
               event_type, COUNT(*) AS n_events
        FROM e, offs GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "events_sliding_stream_counts_dist": f"""
        WITH offs AS (SELECT UNNEST(range(0, 4)) AS i),
        e AS (SELECT epoch_us(ts) AS t, event_type FROM events)
        SELECT CAST((t // {_SLIDE_US}) * {_SLIDE_US} - i * {_SLIDE_US} AS BIGINT)
                   AS window_start_us,
               event_type, COUNT(*) AS n_events
        FROM e, offs GROUP BY 1, 2 ORDER BY 1, 2
    """,
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
    "transcript_daily_exact": transcript_daily_exact,
    "events_hourly_stream_counts": events_hourly_stream_counts,
    "events_hourly_stream_counts_dist": events_hourly_stream_counts_dist,
    "events_hourly_keyed_stream_counts": events_hourly_keyed_stream_counts,
    # the registered sliding-window name runs the DISTRIBUTED plan
    # (round-3 verdict item 5); the sequential replay stays available as
    # events_sliding_stream_counts_demo for tests/equivalence only
    "events_sliding_stream_counts": events_sliding_stream_counts_dist,
    "events_sliding_stream_counts_dist": events_sliding_stream_counts_dist,
}


def docs_source_len_quartiles(sf_dir: str) -> pd.DataFrame:
    """GROUPED EXACT QUANTILES over documents (oracle-matched): per
    source, the exact quartiles of document length plus count and char
    sum — the per-source length-distribution audit of a corpus mix.
    Rides :func:`grouped_quantile_disc` (per-block (source, n_chars)
    histograms; one fold; driver walk is #sources × #distinct-lengths).
    """
    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["source", "n_chars"])
    out = grouped_quantile_disc(ds, "source", "n_chars", (0.25, 0.5, 0.75))
    out = out.rename(
        columns={
            "n": "n_docs", "total": "total_chars",
            "q0.25": "len_q1", "q0.5": "len_q2", "q0.75": "len_q3",
        }
    )
    out["n_docs"] = out["n_docs"].astype(np.int64)
    out["total_chars"] = out["total_chars"].astype(np.int64)
    for c in ("len_q1", "len_q2", "len_q3"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)[
        ["source", "n_docs", "total_chars", "len_q1", "len_q2", "len_q3"]
    ]


ORACLE_SQL["docs_source_len_quartiles"] = """
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           quantile_disc(n_chars, 0.25) AS len_q1,
           quantile_disc(n_chars, 0.5) AS len_q2,
           quantile_disc(n_chars, 0.75) AS len_q3
    FROM documents GROUP BY source ORDER BY source
"""
QUERIES["docs_source_len_quartiles"] = docs_source_len_quartiles


def grouped_weighted_quantile_disc(
    ds, key_col: str, val_col: str, weight_col: str, q_pcts: tuple[int, ...]
) -> pd.DataFrame:
    """Per-group WEIGHTED quantile_disc: within each group, the
    smallest value whose running weight reaches q·W_group. Same plan as
    :func:`grouped_quantile_disc` with weight-sums as the histogram
    mass; cuts use the integer-percent rule
    ``max(1, (qpct·W + 99) // 100)`` shared with
    ``relational.exact_weighted_quantiles`` so the SQL twin is
    bit-exact. Weights must be integral (validated per block).

    Returns one row per key: (key, units, wq<p>...).
    """

    def block_weighted(tbl: pa.Table) -> pa.Table:
        w = tbl.column(weight_col).cast(pa.float64())
        wi = pc.round(w).cast(pa.int64())
        if not pc.all(pc.equal(w, wi.cast(pa.float64()))).as_py():
            raise ValueError(f"{weight_col} must be integral for weighted quantiles")
        t = pa.table(
            {key_col: tbl.column(key_col), val_col: tbl.column(val_col), "w": wi}
        )
        agg = t.group_by([key_col, val_col]).aggregate([("w", "sum")])
        return agg.rename_columns([key_col, val_col, "n"])

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    part = ds.map_batches(block_weighted, batch_format="pyarrow", zero_copy_batch=True)
    hist = adaptive_grouped_agg(part, [key_col, val_col], {"n": "sum"})
    hist = hist.sort_values([key_col, val_col]).reset_index(drop=True)
    rows = []
    for key, g in hist.groupby(key_col, sort=True):
        vals = g[val_col].to_numpy()
        cum = np.cumsum(g["n"].to_numpy())
        W = int(cum[-1])
        row = {key_col: key, "units": W}
        for p in q_pcts:
            tgt = max(1, (p * W + 99) // 100)
            row[f"wq{p}"] = vals[int(np.searchsorted(cum, tgt))]
        rows.append(row)
    return pd.DataFrame(rows)


def lineitem_flag_weighted_price_quartiles(sf_dir: str) -> pd.DataFrame:
    """Per-returnflag quantity-weighted price quartiles (oracle-matched):
    the grouped form of the weighted-selection operator."""
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    ds = read_parquet_sized(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    )
    out = grouped_weighted_quantile_disc(
        ds, "l_returnflag", "l_extendedprice", "l_quantity", (25, 50, 75)
    )
    out["units"] = out["units"].astype("int64")
    return out.reset_index(drop=True)


ORACLE_SQL["lineitem_flag_weighted_price_quartiles"] = """
WITH h AS (
  SELECT l_returnflag AS key, l_extendedprice AS v,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS w
  FROM lineitem GROUP BY key, v
),
t AS (SELECT key, SUM(w) AS tw FROM h GROUP BY key),
c AS (SELECT key, v, SUM(w) OVER (PARTITION BY key ORDER BY v) AS cw FROM h)
SELECT t.key AS l_returnflag,
       CAST(t.tw AS BIGINT) AS units,
       (SELECT MIN(v) FROM c WHERE c.key = t.key
        AND c.cw >= GREATEST((25 * t.tw + 99) // 100, 1)) AS wq25,
       (SELECT MIN(v) FROM c WHERE c.key = t.key
        AND c.cw >= GREATEST((50 * t.tw + 99) // 100, 1)) AS wq50,
       (SELECT MIN(v) FROM c WHERE c.key = t.key
        AND c.cw >= GREATEST((75 * t.tw + 99) // 100, 1)) AS wq75
FROM t ORDER BY l_returnflag
"""
QUERIES["lineitem_flag_weighted_price_quartiles"] = lineitem_flag_weighted_price_quartiles
