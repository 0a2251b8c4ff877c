"""Distribution-drift operators: exact KS, Wasserstein-1 and medians
between two corpora (or two cohorts of one corpus) on an integral
column, from ONE shared histogram fold.

The data-QA pre-flight a training-data pipeline runs before mixing a
new crawl into an existing corpus: "did the length / score / value
distribution move, and by how much?" KS gives the max CDF gap
(scale-free), W1 the magnitude of the move (same units as the column).

All statistics are exact and SQL-reproducible because nothing is ever
a float until one final division per statistic (the same discipline as
relational.events_ks_statistic / events_wasserstein_value, which are
the single-table cohort forms of this module):

- the CDF gap is the cross-multiplied int64 |cum_a·n_b − cum_b·n_a|;
- W1 terms gap·Δv accumulate in Python arbitrary-precision ints;
- medians are element selection (ceil(q·n)−1) — no arithmetic at all.

Scale: the fold is distinct-VALUE bounded (domain-bounded for integral
columns like lengths, cents, counts — not corpus-bounded); for truly
continuous columns pass ``decimals`` to bucket first, the knob every
KS-at-scale implementation uses.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _block_tagged_counts(col: str, tag: str, decimals: int | None):
    """map_batches fn: per-block (v, ca, cb) distinct-value partials
    with the whole block's mass on the ``tag`` side."""

    def fn(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col)
        if decimals is not None:
            v = pc.cast(
                pc.round(pc.multiply(pc.cast(v, pa.float64()), float(10**decimals))),
                pa.int64(),
            )
        else:
            v = pc.cast(v, pa.int64())
        arr = v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v
        vc = arr.value_counts()
        n = pc.cast(vc.field("counts"), pa.int64())
        zero = pa.array(np.zeros(len(vc), np.int64))
        return pa.table(
            {
                "v": vc.field("values"),
                "ca": n if tag == "a" else zero,
                "cb": n if tag == "b" else zero,
            }
        )

    return fn


def drift_histogram(ds_a, ds_b, col: str, decimals: int | None = None) -> pd.DataFrame:
    """Fold both sides into one (v, ca, cb) distinct-value histogram.
    ``decimals``: scale floats by 10^decimals and round to integers
    (None = column is already integral)."""
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    part_a = ds_a.map_batches(
        _block_tagged_counts(col, "a", decimals), batch_format="pyarrow", zero_copy_batch=True
    )
    part_b = ds_b.map_batches(
        _block_tagged_counts(col, "b", decimals), batch_format="pyarrow", zero_copy_batch=True
    )
    hist = adaptive_grouped_agg(part_a.union(part_b), ["v"], {"ca": "sum", "cb": "sum"})
    return hist.sort_values("v").reset_index(drop=True)


def drift_stats(hist: pd.DataFrame, scale: float = 1.0) -> dict:
    """Exact drift statistics from a (v, ca, cb) histogram. ``scale``
    divides value-unit outputs back to the original units (e.g. 100.0
    when values were folded as cents)."""
    v = hist["v"].to_numpy(np.int64)
    ca = np.cumsum(hist["ca"].to_numpy(np.int64))
    cb = np.cumsum(hist["cb"].to_numpy(np.int64))
    na, nb = int(ca[-1]), int(cb[-1])
    if na == 0 or nb == 0:
        raise ValueError("both sides need at least one row")
    if na * nb < 2**62:
        gap = np.abs(ca * nb - cb * na)
    else:
        # cross-multiplied gap can reach na*nb and would wrap int64 past
        # ~3e9 rows per side; fall back to Python bigints (object dtype),
        # same as the W1 accumulation below
        gap = np.abs(ca.astype(object) * nb - cb.astype(object) * na)
    k = int(np.argmax(gap))
    w1_total = sum(
        int(g) * (int(v[i + 1]) - int(v[i])) for i, g in enumerate(gap[:-1]) if g
    )

    def median(cum, n):
        idx = max(0, math.ceil(0.5 * n) - 1)
        return int(v[int(np.searchsorted(cum, idx + 1))])

    return {
        "n_a": na,
        "n_b": nb,
        "ks_num": int(gap[k]),
        "ks": float(int(gap[k])) / float(na * nb),
        "ks_at": float(v[k]) / scale,
        "w1": float(w1_total) / float(na * nb) / scale,
        "median_a": float(median(ca, na)) / scale,
        "median_b": float(median(cb, nb)) / scale,
    }


def drift_report(ds_a, ds_b, col: str, decimals: int | None = None) -> dict:
    """One-fold drift report between two Datasets on an integral (or
    ``decimals``-bucketed float) column."""
    hist = drift_histogram(ds_a, ds_b, col, decimals)
    return drift_stats(hist, scale=float(10 ** (decimals or 0)))


def docs_len_drift(sf_dir: str, source_a: str = "src0", source_b: str = "src7") -> pd.DataFrame:
    """CORPUS-DRIFT QUERY (oracle-matched): exact KS + W1 + per-cohort
    medians between the document-LENGTH distributions of two sources —
    the "new crawl vs existing corpus" pre-flight, here between two
    cohorts of the documents table so a SQL twin can pin every number.
    """
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/documents.parquet", columns=["source", "text"])

    def pick(src):
        def fn(tbl: pa.Table) -> pa.Table:
            sub = tbl.filter(pc.equal(tbl.column("source"), src))
            return pa.table({"len": pc.cast(pc.utf8_length(sub.column("text")), pa.int64())})

        return fn

    a = ds.map_batches(pick(source_a), batch_format="pyarrow", zero_copy_batch=True)
    b = ds.map_batches(pick(source_b), batch_format="pyarrow", zero_copy_batch=True)
    st = drift_report(a, b, "len")
    return pd.DataFrame(
        {
            "n_a": np.array([st["n_a"]], np.int64),
            "n_b": np.array([st["n_b"]], np.int64),
            "ks_num": np.array([st["ks_num"]], np.int64),
            "ks": np.array([st["ks"]], np.float64),
            "w1": np.array([st["w1"]], np.float64),
            "median_a": np.array([int(st["median_a"])], np.int64),
            "median_b": np.array([int(st["median_b"])], np.int64),
        }
    )


ORACLE_SQL = {
    "docs_len_drift": """
WITH f AS (
  SELECT LENGTH(text) AS v,
         SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN source = 'src7' THEN 1 ELSE 0 END) AS cb
  FROM documents WHERE source IN ('src0', 'src7') GROUP BY v
),
c AS (
  SELECT v,
         SUM(ca) OVER (ORDER BY v) AS cum_a,
         SUM(cb) OVER (ORDER BY v) AS cum_b,
         LEAD(v) OVER (ORDER BY v) AS nxt
  FROM f
),
t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM f),
g AS (SELECT v, cum_a, cum_b, nxt, ABS(cum_a * t.nb - cum_b * t.na) AS gap FROM c, t),
m AS (SELECT MAX(gap) AS mg FROM g),
w AS (
  SELECT SUM(CAST(gap AS HUGEINT) * CAST(nxt - v AS HUGEINT)) AS total
  FROM g WHERE nxt IS NOT NULL
)
SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
       CAST(m.mg AS BIGINT) AS ks_num,
       CAST(m.mg AS DOUBLE) / CAST(t.na * t.nb AS DOUBLE) AS ks,
       CAST(w.total AS DOUBLE) / CAST(t.na * t.nb AS DOUBLE) AS w1,
       (SELECT quantile_disc(LENGTH(text), 0.5) FROM documents
        WHERE source = 'src0') AS median_a,
       (SELECT quantile_disc(LENGTH(text), 0.5) FROM documents
        WHERE source = 'src7') AS median_b
FROM t, m, w
""",
}

QUERIES = {"docs_len_drift": docs_len_drift}


def events_type_ks_matrix(sf_dir: str) -> pd.DataFrame:
    """PAIRWISE DRIFT MATRIX (oracle-matched): the exact KS statistic
    between the value distributions of EVERY pair of event types, from
    ONE fold — per-block (value, type) counts reduce once, the driver
    pivots the domain-bounded histogram to per-type cumulative counts
    and reads all C(k,2) cross-multiplied gaps off the same arrays.
    The SQL twin must scan the table once per pair; the engine's
    one-pass shape is the point at corpus scale.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def block_counts(tbl: pa.Table) -> pa.Table:
        agg = tbl.group_by(["value", "event_type"]).aggregate([([], "count_all")])
        return agg.rename_columns(["value", "event_type", "n"])

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    hist = adaptive_grouped_agg(part, ["value", "event_type"], {"n": "sum"})
    pivot = (
        hist.pivot_table(index="value", columns="event_type", values="n",
                         aggfunc="sum", fill_value=0)
        .sort_index()
    )
    types = sorted(pivot.columns)
    cums = {t: np.cumsum(pivot[t].to_numpy(np.int64)) for t in types}
    ns = {t: int(cums[t][-1]) for t in types}
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            gap = np.abs(cums[a] * ns[b] - cums[b] * ns[a])
            rows.append(
                {
                    "type_a": a,
                    "type_b": b,
                    "ks_num": int(gap.max()),
                    "ks": float(int(gap.max())) / float(ns[a] * ns[b]),
                }
            )
    out = pd.DataFrame(rows)
    out["ks_num"] = out["ks_num"].astype("int64")
    return out.sort_values(["type_a", "type_b"]).reset_index(drop=True)


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")

ORACLE_SQL["events_type_ks_matrix"] = " UNION ALL ".join(
    f"""
    SELECT '{a}' AS type_a, '{b}' AS type_b,
           CAST(MAX(gap) AS BIGINT) AS ks_num,
           CAST(MAX(gap) AS DOUBLE) / CAST(MAX(na) * MAX(nb) AS DOUBLE) AS ks
    FROM (
      SELECT ABS(SUM(ca) OVER (ORDER BY value) * t.nb
               - SUM(cb) OVER (ORDER BY value) * t.na) AS gap,
             t.na AS na, t.nb AS nb
      FROM (
        SELECT value,
               SUM(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS ca,
               SUM(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS cb
        FROM events WHERE event_type IN ('{a}', '{b}') GROUP BY value
      ) f, (
        SELECT SUM(CASE WHEN event_type = '{a}' THEN 1 ELSE 0 END) AS na,
               SUM(CASE WHEN event_type = '{b}' THEN 1 ELSE 0 END) AS nb
        FROM events WHERE event_type IN ('{a}', '{b}')
      ) t
    )
    """
    for i, a in enumerate(_EVENT_TYPES)
    for b in _EVENT_TYPES[i + 1:]
) + " ORDER BY type_a, type_b"

QUERIES["events_type_ks_matrix"] = events_type_ks_matrix


def ddsketch_drift(a, b) -> dict:
    """APPROXIMATE drift between two DDSketches: KS and W1 estimated on
    the union grid of both sketches' bucket representatives — the
    100 TB path when even a domain-bounded exact histogram is too much
    state (two α-relative sketches are KBs regardless of scale).

    Error model: each CDF is exact in RANK per bucket (counts are
    exact); the value grid carries α relative error, so KS inherits at
    most the mass of one bucket per side and W1 at most ~2α relative
    value error. Tests bound both against the exact statistics.
    """
    import math as _math

    def grid_of(sk):
        vals = []
        for store, sign in ((sk.pos, 1.0), (sk.neg, -1.0)):
            if len(store.counts):
                idx = np.flatnonzero(store.counts) + store.offset
                vals.append(sign * np.exp(idx * sk._log_gamma) * (1.0 - sk.alpha))
        if sk.zero_count:
            vals.append(np.array([0.0]))
        return np.concatenate(vals) if vals else np.zeros(0)

    grid = np.unique(np.concatenate([grid_of(a), grid_of(b)]))
    if not len(grid):
        return {"ks": 0.0, "w1": 0.0, "n_a": a.count, "n_b": b.count}
    fa = np.array([a.est_quantile_at_value(float(v)) for v in grid])
    fb = np.array([b.est_quantile_at_value(float(v)) for v in grid])
    gap = np.abs(fa - fb)
    # W1 = ∫|Fa−Fb| dv — left-Riemann over the bucket grid
    w1 = float(np.sum(gap[:-1] * np.diff(grid))) if len(grid) > 1 else 0.0
    return {
        "ks": float(gap.max()),
        "w1": w1,
        "n_a": a.count,
        "n_b": b.count,
    }


def events_type_drift_sketch(sf_dir: str, type_a: str = "click", type_b: str = "purchase",
                             alpha: float = 0.005) -> pd.DataFrame:
    """Sketch-path drift between two event types (no SQL oracle —
    approximation is the point; the exact twins are
    ``relational.events_ks_statistic`` / ``events_wasserstein_value``,
    and tests bound this against them): ONE shuffle-free streaming
    pass builds both DDSketches, the drift is read off their buckets.
    """
    from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns_streaming
    from approximate_quantiles_ray.sketches.ddsketch import DDSketch
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["event_type", "value"])

    def side(ty):
        def tf(tbl: pa.Table):
            sub = tbl.filter(pc.equal(tbl.column("event_type"), ty))
            return sub.column("value").to_numpy(zero_copy_only=False)

        return tf

    merged = sketch_columns_streaming(
        ds,
        [
            SketchSpec(key="a", factory=lambda: DDSketch(alpha=alpha), transform=side(type_a)),
            SketchSpec(key="b", factory=lambda: DDSketch(alpha=alpha), transform=side(type_b)),
        ],
    )
    st = ddsketch_drift(merged["a"], merged["b"])
    return pd.DataFrame(
        {
            "n_a": np.array([st["n_a"]], np.int64),
            "n_b": np.array([st["n_b"]], np.int64),
            "ks_est": np.array([st["ks"]], np.float64),
            "w1_est": np.array([st["w1"]], np.float64),
        }
    )


QUERIES["events_type_drift_sketch"] = events_type_drift_sketch


def events_daily_value_drift(sf_dir: str) -> pd.DataFrame:
    """DRIFT TIME SERIES (oracle-matched): for every day with a
    preceding day in the feed, the exact KS statistic between that
    day's value distribution and the previous day's — the monitoring
    query a feed-health dashboard polls. ONE fold of (day, value)
    counts; the driver pivots the domain-bounded histogram once and
    reads every consecutive-day pair off per-day cumulative arrays.
    Days are integer epoch-days (µs // 86 400 000 000) on both sides;
    only EXACTLY-consecutive day numbers pair (a gap day restarts the
    series), matching the SQL twin's ``day - 1`` join.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "value"])

    def block_counts(tbl: pa.Table) -> pa.Table:
        day = pc.divide(pc.cast(tbl.column("ts"), pa.int64()), 86_400_000_000)
        t = pa.table({"day": day, "value": tbl.column("value")})
        agg = t.group_by(["day", "value"]).aggregate([([], "count_all")])
        return agg.rename_columns(["day", "value", "n"])

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    hist = adaptive_grouped_agg(part, ["day", "value"], {"n": "sum"})
    pivot = (
        hist.pivot_table(index="value", columns="day", values="n",
                         aggfunc="sum", fill_value=0)
        .sort_index()
    )
    days = sorted(int(d) for d in pivot.columns)
    cums = {d: np.cumsum(pivot[d].to_numpy(np.int64)) for d in days}
    ns = {d: int(cums[d][-1]) for d in days}
    rows = []
    for prev, cur in zip(days, days[1:]):
        if cur != prev + 1:
            continue
        gap = np.abs(cums[cur] * ns[prev] - cums[prev] * ns[cur])
        rows.append(
            {
                "day": cur,
                "n_prev": ns[prev],
                "n_cur": ns[cur],
                "ks_num": int(gap.max()),
                "ks": float(int(gap.max())) / float(ns[cur] * ns[prev]),
            }
        )
    out = pd.DataFrame(rows, columns=["day", "n_prev", "n_cur", "ks_num", "ks"])
    for c in ("day", "n_prev", "n_cur", "ks_num"):
        out[c] = out[c].astype("int64")
    out["ks"] = out["ks"].astype(np.float64)
    return out.sort_values("day").reset_index(drop=True)


ORACLE_SQL["events_daily_value_drift"] = """
WITH h AS (
  SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day, value, COUNT(*) AS c
  FROM events GROUP BY day, value
),
days AS (SELECT DISTINCT day FROM h),
vals AS (SELECT DISTINCT value FROM h),
dense AS (
  SELECT d.day, v.value, COALESCE(h.c, 0) AS c
  FROM days d CROSS JOIN vals v
  LEFT JOIN h ON h.day = d.day AND h.value = v.value
),
c AS (SELECT day, value, SUM(c) OVER (PARTITION BY day ORDER BY value) AS cum FROM dense),
n AS (SELECT day, SUM(c) AS n FROM h GROUP BY day),
pair AS (
  SELECT c1.day AS day, c1.cum AS cum_cur, c0.cum AS cum_prev,
         n1.n AS n_cur, n0.n AS n_prev
  FROM c c1
  JOIN c c0 ON c0.day = c1.day - 1 AND c0.value = c1.value
  JOIN n n1 ON n1.day = c1.day
  JOIN n n0 ON n0.day = c1.day - 1
)
SELECT day,
       CAST(n_prev AS BIGINT) AS n_prev,
       CAST(n_cur AS BIGINT) AS n_cur,
       CAST(MAX(ABS(cum_cur * n_prev - cum_prev * n_cur)) AS BIGINT) AS ks_num,
       CAST(MAX(ABS(cum_cur * n_prev - cum_prev * n_cur)) AS DOUBLE)
         / CAST(n_cur * n_prev AS DOUBLE) AS ks
FROM pair GROUP BY day, n_prev, n_cur ORDER BY day
"""
QUERIES["events_daily_value_drift"] = events_daily_value_drift


_HALF_CUT_US = 1_705_363_200_000_000  # 2024-01-16T00:00:00Z in epoch µs


def events_user_share_drift(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """FREQUENCY-DRIFT TOP-K (oracle-matched): the users whose share of
    event volume moved most between the first and second half of the
    window — the "who changed behavior" companion to the value-
    distribution drift queries. Share changes are compared as the
    exact integer cross product |c_first·n_second − c_second·n_first|
    (the same no-float-until-reporting rule as the KS family), so
    ranking and ties (diff desc, user_id asc) are bit-stable.

    ONE fold of (user, half) counts; per-block partials bound the
    shuffle at distinct-users × 2 rows per block.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    ds = read_parquet_sized(f"{sf_dir}/events.parquet", columns=["ts", "user_id"])

    def block_counts(tbl: pa.Table) -> pa.Table:
        ts = pc.cast(tbl.column("ts"), pa.int64())
        second = pc.cast(pc.greater_equal(ts, _HALF_CUT_US), pa.int64())
        t = pa.table({"user_id": tbl.column("user_id"), "second": second})
        agg = t.group_by(["user_id", "second"]).aggregate([([], "count_all")])
        return agg.rename_columns(["user_id", "second", "n"])

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    folded = adaptive_grouped_agg(part, ["user_id", "second"], {"n": "sum"})
    pivot = (
        folded.pivot_table(index="user_id", columns="second", values="n",
                           aggfunc="sum", fill_value=0)
        .reindex(columns=[0, 1], fill_value=0)
    )
    c1 = pivot[0].to_numpy(np.int64)
    c2 = pivot[1].to_numpy(np.int64)
    n1, n2 = int(c1.sum()), int(c2.sum())
    diff = np.abs(c1 * n2 - c2 * n1)
    out = pd.DataFrame(
        {
            "user_id": pivot.index.to_numpy(np.int64),
            "n_first": c1,
            "n_second": c2,
            "share_diff_num": diff,
        }
    )
    out = out.sort_values(
        ["share_diff_num", "user_id"], ascending=[False, True]
    ).head(k).reset_index(drop=True)
    for c in out.columns:
        out[c] = out[c].astype("int64")
    return out


ORACLE_SQL["events_user_share_drift"] = """
WITH h AS (
  SELECT user_id,
         SUM(CASE WHEN epoch_us(ts) < 1705363200000000 THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN epoch_us(ts) >= 1705363200000000 THEN 1 ELSE 0 END) AS c2
  FROM events GROUP BY user_id
),
t AS (SELECT SUM(c1) AS n1, SUM(c2) AS n2 FROM h)
SELECT h.user_id,
       CAST(h.c1 AS BIGINT) AS n_first,
       CAST(h.c2 AS BIGINT) AS n_second,
       CAST(ABS(h.c1 * t.n2 - h.c2 * t.n1) AS BIGINT) AS share_diff_num
FROM h, t
ORDER BY share_diff_num DESC, user_id ASC LIMIT 10
"""
QUERIES["events_user_share_drift"] = events_user_share_drift
