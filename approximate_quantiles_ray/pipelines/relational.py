"""Exact relational operators over the test star schema (Ray Data).

These are the *validation-grade* exact counterparts to the sketch
layer: grouped aggregation, distinct counts, top-k, element-exact
quantiles, and a broadcast join — each designed so its result is
bit-identical to the DuckDB oracle SQL the driver runs side-by-side
(CORRECTNESS gate). Design rules that make float results hash-stable:

- money sums are per-element-rounded int64 cents (``ROUND(x*100)`` is
  deterministic per element; int64 addition is order-insensitive);
- float aggregates are limited to MIN/MAX and *element selection*
  (quantile_disc picks an element, no arithmetic) — never float sums,
  whose value depends on reduction order;
- every top-k has a total deterministic ORDER BY (tie-broken by key).

Scale notes are on each function: these run shuffle-light (partial
aggregation before any groupby; broadcast instead of shuffle joins;
exact quantile = distinct-value-count reduction, with the sketch layer
as the scale path for high-cardinality columns).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _read(sf_dir: str, table: str, columns: list[str] | None = None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def int_cents(tbl: pa.Table, src: str, dst: str) -> pa.Table:
    """Append ``dst`` = round(src*100) as int64 (exact money arithmetic)."""
    cents = pc.cast(pc.round(pc.multiply(tbl.column(src), 100.0)), pa.int64())
    return tbl.append_column(dst, cents)


# --------------------------------------------------------------- exact quantile


def exact_quantiles(
    ds, col: str, qs: tuple[float, ...], extra_values: np.ndarray | None = None
) -> pd.DataFrame:
    """Exact quantile_disc: value at sorted index ``max(0, ceil(q*n)-1)``.

    Distributed plan: ``groupby(col).count()`` reduces the dataset to
    its distinct-value histogram (partial per-block counts combine
    before the hash shuffle, so only (value, count) rows move); the
    driver walks the tiny histogram. Exact because quantile_disc is
    element *selection* — no float arithmetic to diverge on.

    Scale path: fine whenever #distinct ≪ #rows (ints, discretized
    metrics). For truly continuous columns at 100 TB use the t-digest /
    KLL sketches instead (pipelines/transcripts.py).
    """
    hist = ds.groupby(col).count().to_pandas()
    if extra_values is not None and len(extra_values):
        vals, cnts = np.unique(np.asarray(extra_values), return_counts=True)
        hist = (
            pd.concat([hist, pd.DataFrame({col: vals, "count()": cnts})])
            .groupby(col, as_index=False)["count()"]
            .sum()
        )
    hist = hist.sort_values(col).reset_index(drop=True)
    if not len(hist):  # empty input → empty result, not IndexError
        return pd.DataFrame({"q": pd.Series(dtype=float), "value": pd.Series(dtype=float)})
    counts = hist["count()"].to_numpy()
    cum = np.cumsum(counts)
    n = int(cum[-1])
    rows = []
    for q in qs:
        idx = max(0, math.ceil(q * n) - 1)
        pos = int(np.searchsorted(cum, idx + 1))
        rows.append({"q": float(q), "value": float(hist[col].iloc[pos])})
    return pd.DataFrame(rows)


# ------------------------------------------------------------------- pipelines


def events_type_stats(sf_dir: str) -> pd.DataFrame:
    """Per event_type: row count, exact distinct users, min/max value.

    Two-level distinct: groupby (type, user) [partial-combined per
    block] then count per type — the standard exact-distinct plan; the
    HLL sketch is the 100 TB alternative.
    """
    ds = _read(sf_dir, "events", ["event_type", "user_id", "value"])
    from ray.data.aggregate import Count, Max, Min

    base = ds.groupby("event_type").aggregate(Count(), Min("value"), Max("value")).to_pandas()
    dist = (
        ds.select_columns(["event_type", "user_id"])
        .groupby(["event_type", "user_id"])
        .count()
        .groupby("event_type")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n_users"})
    )
    out = base.rename(
        columns={"count()": "n_events", "min(value)": "value_min", "max(value)": "value_max"}
    ).merge(dist, on="event_type")
    out = out[["event_type", "n_events", "n_users", "value_min", "value_max"]]
    return out.sort_values("event_type").reset_index(drop=True)


def events_user_topk(sf_dir: str, k: int = 20) -> pd.DataFrame:
    """Top-k users by event count (ties → lower user_id). Grouped count
    reduces to one row per user before the driver-side k-selection."""
    ds = _read(sf_dir, "events", ["user_id"])
    counts = ds.groupby("user_id").count().rename_columns({"count()": "n_events"})
    top = counts.sort(["n_events", "user_id"], descending=[True, False]).limit(k)
    return top.to_pandas()


def events_value_quantiles(sf_dir: str) -> pd.DataFrame:
    ds = _read(sf_dir, "events", ["value"])
    return exact_quantiles(ds, "value", (0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99))


def lineitem_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1 shape with exact integer arithmetic (cents)."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice"],
    )

    def project(tbl: pa.Table) -> pa.Table:
        tbl = int_cents(tbl, "l_extendedprice", "price_cents")
        qty = pc.cast(pc.round(tbl.column("l_quantity")), pa.int64())
        tbl = tbl.append_column("qty", qty)
        return tbl.select(["l_returnflag", "l_linestatus", "qty", "price_cents"])

    from ray.data.aggregate import Count, Sum

    agg = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(Count(), Sum("qty"), Sum("price_cents"))
        .rename_columns(
            {"count()": "n_rows", "sum(qty)": "sum_qty", "sum(price_cents)": "sum_price_cents"}
        )
    )
    out = agg.to_pandas()
    return out.sort_values(["l_returnflag", "l_linestatus"]).reset_index(drop=True)


def orders_by_segment(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer (broadcast, no shuffle) → per-segment totals."""
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.engine.broadcast import broadcast_join

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: int_cents(t, "o_totalprice", "total_cents").select(["o_custkey", "total_cents"]),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    customer = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    joined = broadcast_join(orders, customer, "o_custkey", "c_custkey", how="inner")
    from ray.data.aggregate import Count, Sum

    out = (
        joined.groupby("c_mktsegment")
        .aggregate(Count(), Sum("total_cents"))
        .rename_columns({"count()": "n_orders", "sum(total_cents)": "total_cents"})
        .to_pandas()
    )
    return out.sort_values("c_mktsegment").reset_index(drop=True)


def docs_dedup_exact(sf_dir: str) -> pd.DataFrame:
    """Exact text dedup: keep MIN(doc_id) per distinct text + copy count.

    Plan: project (text-hash bucket would be the 100 TB key; here the
    text itself is the groupby key for oracle parity) → groupby(text)
    with per-block partial (min, count) combine → tiny result. See
    pipelines/dedup.py for the hash-partitioned scale variant.
    """
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    from ray.data.aggregate import Count, Min

    out = (
        ds.groupby("text")
        .aggregate(Min("doc_id"), Count())
        .rename_columns({"min(doc_id)": "doc_id", "count()": "n_copies"})
        .to_pandas()[["doc_id", "n_copies"]]
    )
    return out.sort_values("doc_id").reset_index(drop=True)


ORACLE_SQL: dict[str, str] = {
    "events_type_stats": """
        SELECT event_type,
               COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               MIN(value) AS value_min,
               MAX(value) AS value_max
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "events_user_topk": """
        SELECT user_id, COUNT(*) AS n_events
        FROM events GROUP BY user_id
        ORDER BY n_events DESC, user_id ASC LIMIT 20
    """,
    "events_value_quantiles": " UNION ALL ".join(
        f"SELECT {q} AS q, quantile_disc(value, {q}) AS value FROM events"
        for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)
    ),
    "lineitem_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows,
               CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
               CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_cents
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "orders_by_segment": """
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment ORDER BY c_mktsegment
    """,
    "docs_dedup_exact": """
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
        FROM documents GROUP BY text ORDER BY doc_id
    """,
}

QUERIES = {
    "events_type_stats": events_type_stats,
    "events_user_topk": events_user_topk,
    "events_value_quantiles": events_value_quantiles,
    "lineitem_pricing_summary": lineitem_pricing_summary,
    "orders_by_segment": orders_by_segment,
    "docs_dedup_exact": docs_dedup_exact,
}


def supplier_region_stats(sf_dir: str) -> pd.DataFrame:
    """supplier ⋈ nation ⋈ region via CHAINED broadcast joins (both
    dimension tables ship once via ray.put; no shuffle), then per-region
    totals with exact integer cents."""
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.engine.broadcast import broadcast_join

    suppliers = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey", "s_acctbal"]).map_batches(
        lambda t: int_cents(t, "s_acctbal", "acctbal_cents").select(
            ["s_suppkey", "s_nationkey", "acctbal_cents"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    joined = broadcast_join(suppliers, nation, "s_nationkey", "n_nationkey")
    joined = broadcast_join(joined, region, "n_regionkey", "r_regionkey")

    from ray.data.aggregate import Count, Sum

    out = (
        joined.groupby("r_name")
        .aggregate(Count(), Sum("acctbal_cents"))
        .rename_columns({"count()": "n_suppliers", "sum(acctbal_cents)": "acctbal_cents"})
        .to_pandas()
    )
    return out.sort_values("r_name").reset_index(drop=True)


ORACLE_SQL["supplier_region_stats"] = """
    SELECT r_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name ORDER BY r_name
"""
QUERIES["supplier_region_stats"] = supplier_region_stats
