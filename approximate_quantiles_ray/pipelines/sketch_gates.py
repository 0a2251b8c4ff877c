"""Oracle-matched GATES for the approximate/sketch queries.

Round-3 verdict item 1: the only driver-visible non-green rows were the
`no_oracle` sketch entries. Each gate here splits the SQL-checkable
invariants out of a sketch query and makes THEM the query result:

- every exact scalar in the output (counts, quantile_disc values,
  heavy-hitter identities) is hash-pinned against an independent DuckDB
  twin, and
- every approximation guarantee becomes a boolean law column computed
  in-query against the EXACT distributed answer (rank-interval sandwich
  for quantile sketches, relative-error bounds for HLL/KMV,
  candidate-set equality for heavy hitters, within-bound for DDSketch
  drift) that the SQL twin pins to TRUE.

A sketch regression that breaks the published bound flips a boolean and
hash-mismatches; a conservation bug (lost rows, wrong merge) shifts an
exact scalar and hash-mismatches. The raw estimate surfaces remain
available on the underlying pipeline functions for bench/pytest.

Rank semantics: a quantile estimate ``est`` passes at rank tolerance
``tol`` iff its exact rank interval [#(x<est)/n, #(x≤est)/n] overlaps
[q-tol, q+tol]. This is the correct discrete-domain criterion — a pure
value sandwich est ≤ v(q+tol) wrongly fails interpolating sketches
(t-digest means land BETWEEN domain values) whenever the ±tol rank
window sits inside one distinct value. Tolerance 0.02 (2% rank):
comfortably above the configured sketch errors (t-digest delta=300-500
k2, KLL k=200 both land well under 1% here) yet tight enough that a
broken compaction or merge fails it. Checked at three scales in
tests/test_sketch_gates.py.

Reference parity: the gates exercise the same accuracy surface as the
reference's harness (/root/reference/examples/accuracy.rs) but as
in-pipeline laws rather than offline plots.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.sources.read import read_parquet_sized

RANK_TOL = 0.02


def _concurrent(*thunks, raw=0):
    """Run independent gate legs (exact twin + approximate run, or the
    two runs of a determinism law) as concurrent driver threads: each
    leg is its own Ray Data pipeline, so overlapping them pipelines the
    fixed per-pipeline latency instead of serializing it. Results are
    unchanged — the legs share no state.

    ``raw``: index (or tuple of indices) of the thunk(s) that ARE the
    underlying data pipeline; the others are gate legs (exact twins,
    determinism re-runs). Per-leg walls accumulate in a module log that
    ``pop_leg_walls`` drains, so bench.py can report the raw pipeline's
    wall separately from gate overhead (r4 verdict item 3: folding the
    twins into each query made per-query BENCH numbers incomparable
    across rounds). Legs overlap on the same Ray session, so each leg's
    wall is an upper bound on its standalone cost under that session's
    concurrent load — the bias is shared by both legs and stable round
    to round, which is all cross-round comparability needs."""
    import time as _time
    from concurrent.futures import ThreadPoolExecutor

    raw_ix = {raw} if isinstance(raw, int) else set(raw)

    def timed(t):
        t0 = _time.perf_counter()
        r = t()
        return r, _time.perf_counter() - t0

    with ThreadPoolExecutor(len(thunks)) as ex:
        futures = [ex.submit(timed, t) for t in thunks]
        results = [f.result() for f in futures]
    _LEG_LOG.append(
        (
            sum(w for i, (_, w) in enumerate(results) if i in raw_ix),
            sum(w for i, (_, w) in enumerate(results) if i not in raw_ix),
        )
    )
    return [r for r, _ in results]


_LEG_LOG: list[tuple[float, float]] = []


def pop_leg_walls() -> dict | None:
    """Drain the per-leg walls accumulated by ``_concurrent`` since the
    last call. Returns ``{"raw": sec, "gate": sec}`` (summed across
    ``_concurrent`` calls — a gate may fan out more than once), or None
    if no gate leg ran (plain oracle queries)."""
    global _LEG_LOG
    legs, _LEG_LOG = _LEG_LOG, []
    if not legs:
        return None
    return {
        "raw": round(sum(r for r, _ in legs), 3),
        "gate": round(sum(g for _, g in legs), 3),
    }


def _rank_ok(vals: np.ndarray, cum: np.ndarray, est: float, q: float,
             tol: float = RANK_TOL) -> bool:
    """Step-widened rank sandwich for interpolating sketches on a
    DISCRETE domain: est must lie strictly between the distinct value
    below quantile_disc(q-tol) and the distinct value above
    quantile_disc(q+tol). An interpolating estimate legitimately lands
    anywhere inside the CDF step adjoining the tolerance window (e.g.
    p50 est 160.4 when 45-58% of the mass sits exactly at 160 — the
    inverse-quantile answer is sound even though the point-rank of
    160.4 is 0.58); crossing a real mass point beyond ±tol still
    fails."""
    n = int(cum[-1])
    lo_t = max(0, math.ceil(max(0.0, q - tol) * n) - 1)
    hi_t = max(0, math.ceil(min(1.0, q + tol) * n) - 1)
    v_lo = vals[int(np.searchsorted(cum, lo_t + 1))]
    v_hi = vals[int(np.searchsorted(cum, hi_t + 1))]
    i_lo = int(np.searchsorted(vals, v_lo, side="left"))
    lo_edge = vals[i_lo - 1] if i_lo > 0 else -np.inf
    i_hi = int(np.searchsorted(vals, v_hi, side="right"))
    hi_edge = vals[i_hi] if i_hi < len(vals) else np.inf
    return bool(lo_edge < est < hi_edge)


def _disc(vals: np.ndarray, cum: np.ndarray, q: float):
    """quantile_disc: value at sorted index max(0, ceil(q*n)-1)."""
    n = int(cum[-1])
    idx = max(0, math.ceil(q * n) - 1)
    return vals[int(np.searchsorted(cum, idx + 1))]


def _rank_of_partials(hist_ds, col: str, est: float,
                      extra_values: np.ndarray | None = None) -> tuple[float, float]:
    """Rank interval of ``est`` from a (possibly per-block-partial)
    (col, n) histogram Dataset — counts are linear, so partials need no
    global groupby: one streaming pass sums n below/at est."""

    def below_at(tbl: pa.Table) -> pa.Table:
        v = tbl.column(col)
        n = tbl.column("n")
        lt = pc.sum(pc.if_else(pc.less(v, est), n, pa.scalar(0, pa.int64()))).as_py() or 0
        le = pc.sum(pc.if_else(pc.less_equal(v, est), n, pa.scalar(0, pa.int64()))).as_py() or 0
        tot = pc.sum(n).as_py() or 0
        return pa.table(
            {"lt": pa.array([lt], pa.int64()), "le": pa.array([le], pa.int64()),
             "tot": pa.array([tot], pa.int64())}
        )

    agg = hist_ds.map_batches(
        below_at, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    lt, le, tot = int(agg["lt"].sum()), int(agg["le"].sum()), int(agg["tot"].sum())
    if extra_values is not None and len(extra_values):
        xv = np.asarray(extra_values, np.float64)
        lt += int((xv < est).sum())
        le += int((xv <= est).sum())
        tot += len(xv)
    return lt / tot, le / tot


def _grouped_len_hist(ds, key_col: str) -> pd.DataFrame:
    """(key, len, n) fold of LENGTH(text) per key — domain-bounded, so
    the combined histogram is driver-sized at any corpus scale."""
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    def block_counts(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                key_col: tbl.column(key_col),
                "len": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
            }
        )
        agg = t.group_by([key_col, "len"]).aggregate([([], "count_all")])
        return agg.rename_columns([key_col, "len", "n"])

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    hist = adaptive_grouped_agg(part, [key_col, "len"], {"n": "sum"})
    return hist.sort_values([key_col, "len"]).reset_index(drop=True)


# --------------------------------------------------------------- transcripts


def transcript_sketch_report_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED flagship gate: runs the full sketch suite
    (pipelines/transcripts.transcript_report) and emits

    - n_turns      — the t-digest COUNT (pins sketch count conservation
                     against SQL COUNT(*)),
    - n_convs      — exact distinct conversations (distributed fold),
    - n_gaps       — the latency engine's gap count (pins the segmented
                     /bucketed gap accounting against
                     COUNT(*) − COUNT(DISTINCT conv_id)),
    - len_p50/95/99 — EXACT quantile_disc of LENGTH(text),
    - five boolean laws: t-digest + KLL rank-interval sandwich (±2%
      rank), HLL within 5%, CMS top-5 candidate set == exact top-5,
      latency-p50 rank sandwich.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_distinct_pairs
    from approximate_quantiles_ray.pipelines.transcript_exact import (
        _gap_hist,
        tool_topk,
        transcripts_dir_for,
    )
    from approximate_quantiles_ray.pipelines.transcripts import transcript_report

    tdir = transcripts_dir_for(sf_dir)

    # exact text-length histogram (domain-bounded → driver walk)
    def _text_hist():
        ds_text = read_parquet_sized(tdir, columns=["text"]).map_batches(
            lambda t: pa.table(
                {"g": pa.array(np.zeros(t.num_rows, np.int8)), "text": t.column("text")}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return _grouped_len_hist(ds_text, "g")

    # exact distinct conversations via the degenerate distinct fold
    def _n_convs():
        conv_part = read_parquet_sized(tdir, columns=["conv_id"]).map_batches(
            lambda t: pa.table({"conv_id": pc.unique(t.column("conv_id"))}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return len(adaptive_distinct_pairs(conv_part, ["conv_id"]))

    # five independent legs (sketch suite + four exact oracles), each
    # its own Ray pipeline — overlapped, not serialized
    rep, hist, n_convs, top5, (gap_hist, boundary) = _concurrent(
        lambda: transcript_report(tdir).set_index("metric")["value"],
        _text_hist,
        _n_convs,
        lambda: tool_topk(sf_dir, k=5),
        lambda: _gap_hist(sf_dir),
    )
    vals = hist["len"].to_numpy(np.int64)
    cum = np.cumsum(hist["n"].to_numpy(np.int64))

    qs = (0.5, 0.95, 0.99)
    td_ok = all(
        _rank_ok(vals, cum, float(rep[f"text_len_p{int(q*100)}_tdigest"]), q) for q in qs
    )
    kll_ok = all(
        _rank_ok(vals, cum, float(rep[f"text_len_p{int(q*100)}_kll"]), q) for q in qs
    )
    hll_ok = abs(float(rep["distinct_conv_hll"]) - n_convs) <= 0.05 * n_convs

    # CMS top-5 candidate set vs exact top-5
    cms_tools = {m.split("_", 2)[2] for m in rep.index if m.startswith("tool_top")}
    cms_ok = cms_tools == set(top5["tool"])

    # latency p50 rank sandwich over the exact gap histogram (µs);
    # the gap histogram is near-continuous, so the rank interval is
    # summed from the partial fold in one streaming pass
    lo, hi = _rank_of_partials(
        gap_hist, "gap_us", float(rep["latency_p50_tdigest"]) * 1e6, boundary
    )
    lat_ok = lo <= 0.5 + RANK_TOL and hi >= 0.5 - RANK_TOL

    return pd.DataFrame(
        {
            "n_turns": np.array([int(rep["turns_count"])], np.int64),
            "n_convs": np.array([n_convs], np.int64),
            "n_gaps": np.array([int(rep["latency_gaps_count"])], np.int64),
            "len_p50": np.array([int(_disc(vals, cum, 0.5))], np.int64),
            "len_p95": np.array([int(_disc(vals, cum, 0.95))], np.int64),
            "len_p99": np.array([int(_disc(vals, cum, 0.99))], np.int64),
            "td_rank_ok": np.array([td_ok]),
            "kll_rank_ok": np.array([kll_ok]),
            "hll_within_5pct": np.array([hll_ok]),
            "cms_top5_match": np.array([cms_ok]),
            "lat_p50_rank_ok": np.array([lat_ok]),
        }
    )


def transcript_role_len_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED grouped-sketch gate: per role, the grouped
    t-digest's COUNT (pins grouped-sketch conservation through the
    shuffle) + exact per-role quantile_disc values + per-role
    rank-interval booleans for the sketch p50/p99."""
    from approximate_quantiles_ray.pipelines.transcript_exact import (
        transcripts_dir_for,
    )
    from approximate_quantiles_ray.pipelines.transcripts import (
        grouped_text_len_by_role,
    )

    tdir = transcripts_dir_for(sf_dir)
    sk, hist = _concurrent(
        lambda: grouped_text_len_by_role(tdir).set_index("role"),
        lambda: _grouped_len_hist(
            read_parquet_sized(tdir, columns=["role", "text"]), "role"
        ),
    )

    rows = []
    for role, g in hist.groupby("role", sort=True):
        vals = g["len"].to_numpy(np.int64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        s = sk.loc[role]
        rows.append(
            {
                "role": role,
                "n_turns": np.int64(s["n_turns"]),
                "len_p50": np.int64(_disc(vals, cum, 0.5)),
                "len_p99": np.int64(_disc(vals, cum, 0.99)),
                "p50_rank_ok": _rank_ok(vals, cum, float(s["len_p50"]), 0.5),
                "p99_rank_ok": _rank_ok(vals, cum, float(s["len_p99"]), 0.99),
            }
        )
    return pd.DataFrame(rows)


def transcript_daily_text_len_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED windowed-sketch gate: per day, the windowed
    t-digest's COUNT + exact per-day quantile_disc values +
    rank-interval booleans — the daily twin of the role gate."""
    from approximate_quantiles_ray.pipelines.transcript_exact import (
        transcripts_dir_for,
    )
    from approximate_quantiles_ray.pipelines.windows import (
        add_window_column,
        transcript_daily_text_len,
    )

    tdir = transcripts_dir_for(sf_dir)

    def _day_hist():
        ds = read_parquet_sized(tdir, columns=["ts", "text"]).map_batches(
            lambda t: add_window_column(t, "ts", "day").drop_columns(["ts"]),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return _grouped_len_hist(ds, "window_start")

    sk, hist = _concurrent(
        lambda: transcript_daily_text_len(sf_dir).set_index("window_start"), _day_hist
    )
    hist["window_start"] = hist["window_start"].astype("datetime64[us]")

    rows = []
    for day, g in hist.groupby("window_start", sort=True):
        vals = g["len"].to_numpy(np.int64)
        cum = np.cumsum(g["n"].to_numpy(np.int64))
        s = sk.loc[day]
        rows.append(
            {
                "window_start": day,
                "n_turns": np.int64(s["n_turns"]),
                "len_p50": np.int64(_disc(vals, cum, 0.5)),
                "len_p99": np.int64(_disc(vals, cum, 0.99)),
                "p50_rank_ok": _rank_ok(vals, cum, float(s["len_p50"]), 0.5),
                "p99_rank_ok": _rank_ok(vals, cum, float(s["len_p99"]), 0.99),
            }
        )
    out = pd.DataFrame(rows)
    out["window_start"] = out["window_start"].astype("datetime64[us]")
    return out


def transcript_tool_hh_cms_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED CMS heavy-hitter gate: the count-min candidate
    top-10 must BE the exact top-10 — the gate emits the candidates'
    EXACT counts sorted the oracle's way, so a candidate-set or
    ordering regression hash-mismatches. (CMS estimates only
    over-count by the ε·n bound; with width 8192 over a 50-tool vocab
    the candidate ranking equals the exact ranking.)"""
    import ray.data as rd

    from approximate_quantiles_ray.engine.topk import heavy_hitters
    from approximate_quantiles_ray.pipelines.transcript_exact import (
        tool_topk,
        transcripts_dir_for,
    )

    ds = rd.read_parquet(transcripts_dir_for(sf_dir), columns=["tool"])
    cand_df, exact = _concurrent(
        lambda: heavy_hitters(ds, "tool", k=10),
        lambda: tool_topk(sf_dir, k=50),  # vocab-bounded exact counts
    )
    cand = set(cand_df["value"])
    sub = exact[exact["tool"].isin(cand)]
    return (
        sub.sort_values(["n_uses", "tool"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


def transcript_tool_hh_mg_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED Misra–Gries gate: the MG candidate top-10 must BE
    the exact top-10 (emitted with exact counts), and every candidate
    must satisfy the deterministic sandwich est ≤ true ≤ est+err —
    emitted as a boolean the SQL twin pins TRUE."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns
    from approximate_quantiles_ray.pipelines.transcript_exact import (
        tool_topk,
        transcripts_dir_for,
    )
    from approximate_quantiles_ray.sketches.misra_gries import MisraGries

    ds = rd.read_parquet(transcripts_dir_for(sf_dir), columns=["tool"])
    mg, exact = _concurrent(
        lambda: sketch_columns(
            ds,
            [SketchSpec(key="tool", factory=lambda: MisraGries(k=32), on="tool", kind="hash")],
        )["tool"],
        lambda: tool_topk(sf_dir, k=50).set_index("tool")["n_uses"],
    )
    cand = {key: (int(est), int(upper)) for key, est, upper in mg.top(10)}
    rows = []
    for tool in cand:
        est, upper = cand[tool]
        true = int(exact.get(tool, 0))
        rows.append(
            {
                "tool": tool,
                "n_uses": np.int64(true),
                "sandwich_ok": bool(est <= true <= upper),
            }
        )
    return (
        pd.DataFrame(rows)
        .sort_values(["n_uses", "tool"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )


# -------------------------------------------------------------- events/docs


def events_type_drift_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED DDSketch-drift gate: exact n_a/n_b/W1 (hash-pinned
    against the HUGEINT cumulative twin) plus booleans that the
    sketch-path KS is within 0.02 absolute and the sketch-path W1
    within 5% relative of the exact statistics."""
    from approximate_quantiles_ray.pipelines.drift import events_type_drift_sketch
    from approximate_quantiles_ray.pipelines.relational import (
        events_ks_statistic,
        events_wasserstein_value,
    )

    est, ks, w1 = (
        df.iloc[0]
        for df in _concurrent(
            lambda: events_type_drift_sketch(sf_dir),
            lambda: events_ks_statistic(sf_dir),
            lambda: events_wasserstein_value(sf_dir),
        )
    )
    return pd.DataFrame(
        {
            "n_a": np.array([int(w1["n_a"])], np.int64),
            "n_b": np.array([int(w1["n_b"])], np.int64),
            "w1": np.array([float(w1["w1"])], np.float64),
            "ks_est_close": np.array([abs(float(est["ks_est"]) - float(ks["ks"])) <= 0.02]),
            "w1_est_close": np.array(
                [abs(float(est["w1_est"]) - float(w1["w1"])) <= 0.05 * float(w1["w1"])]
            ),
        }
    )


def events_user_overlap_kmv_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED KMV gate: exact pairwise user overlaps
    (hash-pinned against the distinct-join twin) plus booleans that the
    KMV cardinalities are within 5% and the KMV intersection within
    10% of the UNION size — generous vs KMV's 1/sqrt(k) ≈ 1.6% at
    k=4096, tight enough to catch a broken merge or hash change."""
    from approximate_quantiles_ray.pipelines.overlap import (
        events_user_overlap,
        events_user_overlap_kmv,
    )

    exact, est = _concurrent(
        lambda: events_user_overlap(sf_dir),
        lambda: events_user_overlap_kmv(sf_dir).set_index(["type_a", "type_b"]),
        raw=1,
    )
    rows = []
    for _, r in exact.iterrows():
        e = est.loc[(r["type_a"], r["type_b"])]
        union = int(r["users_a"]) + int(r["users_b"]) - int(r["users_both"])
        rows.append(
            {
                "type_a": r["type_a"],
                "type_b": r["type_b"],
                "users_a": np.int64(r["users_a"]),
                "users_b": np.int64(r["users_b"]),
                "users_both": np.int64(r["users_both"]),
                "kmv_card_ok": bool(
                    abs(e["est_a"] - r["users_a"]) <= 0.05 * r["users_a"]
                    and abs(e["est_b"] - r["users_b"]) <= 0.05 * r["users_b"]
                ),
                "kmv_inter_ok": bool(
                    abs(e["est_inter"] - r["users_both"]) <= 0.10 * union
                ),
            }
        )
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]).reset_index(drop=True)


def docs_fingerprints_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED fingerprint gate: n_docs and n_distinct_texts are
    exact (hash-pinned against COUNT(*) / COUNT(DISTINCT text)); the
    law columns pin that fingerprints are a pure function of text with
    no observed collision (n_distinct_fp == n_distinct_text — a
    collision or nondeterminism breaks equality) and that a second
    independent pass produces the identical multiset (order-insensitive
    XOR+sum fold compared across two runs)."""
    from approximate_quantiles_ray.engine.folds import adaptive_distinct_pairs
    from approximate_quantiles_ray.pipelines.textstats import fingerprint_batch

    path = f"{sf_dir}/documents.parquet"

    def fp_fold():
        ds = read_parquet_sized(path, columns=["doc_id", "text"])
        parts = ds.map_batches(
            lambda t: _fp_partial(fingerprint_batch(t)),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ).to_pandas()
        with np.errstate(over="ignore"):
            xor = np.bitwise_xor.reduce(parts["xor"].to_numpy().astype(np.uint64))
            add = np.sum(parts["add"].to_numpy().astype(np.uint64), dtype=np.uint64)
        return int(xor), int(add), int(parts["n"].sum())

    # distinct fingerprints (distributed fold)
    def _n_fp():
        fp_part = read_parquet_sized(path, columns=["doc_id", "text"]).map_batches(
            lambda t: pa.table(
                {"fp": pc.unique(fingerprint_batch(t).column("fingerprint"))}
            ),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return len(adaptive_distinct_pairs(fp_part, ["fp"]))

    # distinct texts (exact; DuckDB's COUNT(DISTINCT text) is the
    # independent check on this number)
    def _n_text():
        text_part = read_parquet_sized(path, columns=["text"]).map_batches(
            lambda t: pa.table({"text": pc.unique(t.column("text"))}),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        return len(adaptive_distinct_pairs(text_part, ["text"]))

    (x1, a1, n1), (x2, a2, n2), n_fp, n_text = _concurrent(
        fp_fold, fp_fold, _n_fp, _n_text
    )
    deterministic = (x1, a1, n1) == (x2, a2, n2)

    return pd.DataFrame(
        {
            "n_docs": np.array([n1], np.int64),
            "n_distinct_texts": np.array([n_text], np.int64),
            "collision_free": np.array([n_fp == n_text]),
            "deterministic": np.array([deterministic]),
        }
    )


def _fp_partial(tbl: pa.Table) -> pa.Table:
    fp = tbl.column("fingerprint").combine_chunks().to_numpy(zero_copy_only=False)
    fp = fp.astype(np.uint64)
    with np.errstate(over="ignore"):
        return pa.table(
            {
                "xor": pa.array([int(np.bitwise_xor.reduce(fp)) if len(fp) else 0], pa.uint64()),
                "add": pa.array([int(np.sum(fp, dtype=np.uint64)) if len(fp) else 0], pa.uint64()),
                "n": pa.array([len(fp)], pa.int64()),
            }
        )


# ------------------------------------------------------------------ oracles

ORACLE_SQL = {
    "events_type_drift_sketch": """
WITH f AS (
  SELECT CAST(ROUND(value * 100) AS BIGINT) AS cents,
         SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb
  FROM events WHERE event_type IN ('click', 'purchase') GROUP BY cents
),
c AS (
  SELECT cents,
         SUM(ca) OVER (ORDER BY cents) AS cum_a,
         SUM(cb) OVER (ORDER BY cents) AS cum_b,
         LEAD(cents) OVER (ORDER BY cents) AS nxt
  FROM f
),
t AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM f),
s AS (
  SELECT SUM(CAST(ABS(cum_a * t.nb - cum_b * t.na) AS HUGEINT)
             * CAST(nxt - cents AS HUGEINT)) AS total
  FROM c, t WHERE nxt IS NOT NULL
)
SELECT CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b,
       CAST(s.total AS DOUBLE) / CAST(t.na * t.nb AS DOUBLE) / 100.0 AS w1,
       TRUE AS ks_est_close, TRUE AS w1_est_close
FROM t, s
""",
    "events_user_overlap_kmv": """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
     c AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type)
SELECT a.event_type AS type_a,
       b.event_type AS type_b,
       ca.n AS users_a,
       cb.n AS users_b,
       COUNT(*) AS users_both,
       TRUE AS kmv_card_ok,
       TRUE AS kmv_inter_ok
FROM d a
JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
JOIN c ca ON ca.event_type = a.event_type
JOIN c cb ON cb.event_type = b.event_type
GROUP BY 1, 2, ca.n, cb.n
ORDER BY 1, 2
""",
    "docs_fingerprints": """
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT text) AS n_distinct_texts,
       TRUE AS collision_free,
       TRUE AS deterministic
FROM documents
""",
}


def oracle_sql(sf_dir: str) -> dict[str, str]:
    """Transcript-table oracles (the table lives under /tmp, not in the
    driver's pre-registered views)."""
    from approximate_quantiles_ray.pipelines.transcript_exact import _tdir_glob

    glob = _tdir_glob(sf_dir)
    return {
        "transcript_sketch_report": f"""
            SELECT COUNT(*) AS n_turns,
                   COUNT(DISTINCT conv_id) AS n_convs,
                   COUNT(*) - COUNT(DISTINCT conv_id) AS n_gaps,
                   quantile_disc(LENGTH(text), 0.50) AS len_p50,
                   quantile_disc(LENGTH(text), 0.95) AS len_p95,
                   quantile_disc(LENGTH(text), 0.99) AS len_p99,
                   TRUE AS td_rank_ok, TRUE AS kll_rank_ok,
                   TRUE AS hll_within_5pct, TRUE AS cms_top5_match,
                   TRUE AS lat_p50_rank_ok
            FROM read_parquet('{glob}')
        """,
        "transcript_role_len_sketch": f"""
            SELECT role,
                   COUNT(*) AS n_turns,
                   quantile_disc(LENGTH(text), 0.50) AS len_p50,
                   quantile_disc(LENGTH(text), 0.99) AS len_p99,
                   TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
            FROM read_parquet('{glob}') GROUP BY role ORDER BY role
        """,
        "transcript_daily_text_len": f"""
            SELECT date_trunc('day', ts) AS window_start,
                   COUNT(*) AS n_turns,
                   quantile_disc(LENGTH(text), 0.50) AS len_p50,
                   quantile_disc(LENGTH(text), 0.99) AS len_p99,
                   TRUE AS p50_rank_ok, TRUE AS p99_rank_ok
            FROM read_parquet('{glob}') GROUP BY 1 ORDER BY 1
        """,
        "transcript_tool_hh_cms": f"""
            SELECT tool, COUNT(*) AS n_uses
            FROM read_parquet('{glob}') WHERE tool IS NOT NULL
            GROUP BY tool ORDER BY n_uses DESC, tool ASC LIMIT 10
        """,
        "transcript_tool_hh_mg": f"""
            SELECT tool, COUNT(*) AS n_uses, TRUE AS sandwich_ok
            FROM read_parquet('{glob}') WHERE tool IS NOT NULL
            GROUP BY tool ORDER BY n_uses DESC, tool ASC LIMIT 10
        """,
    }


QUERIES = {
    "transcript_sketch_report": transcript_sketch_report_gate,
    "transcript_role_len_sketch": transcript_role_len_gate,
    "transcript_daily_text_len": transcript_daily_text_len_gate,
    "transcript_tool_hh_cms": transcript_tool_hh_cms_gate,
    "transcript_tool_hh_mg": transcript_tool_hh_mg_gate,
    "events_type_drift_sketch": events_type_drift_gate,
    "events_user_overlap_kmv": events_user_overlap_kmv_gate,
    "docs_fingerprints": docs_fingerprints_gate,
}


# ------------------------------------------------- ANN / dedup / clustering

# recall floors measured on the isotropic testdata embeddings (the
# LSH/IVF/PQ worst case) at sf0.001/0.01/0.1 — ivf 0.933-1.0, lsh
# 0.667-0.833, pq 0.967-1.0 (at the m=16 default; m=8 gave
# 0.633-0.967). All three pipelines are fully seeded (hash sample +
# seeded training + deterministic tie-breaks), so the measured recall
# is a constant of (code, data): a floor breach means the algorithm
# changed, which is exactly what the gate should catch.
ANN_RECALL_FLOORS = {"ivf": 0.9, "lsh": 0.6, "pq": 0.9}


def _ann_gate(sf_dir: str, variant: str) -> pd.DataFrame:
    """Shared ANN gate: the EXACT brute-force top-k is the emitted,
    hash-pinned result (same rows as the oracle-green
    embeddings_knn_bruteforce twin); the approximate variant runs
    alongside and its recall@k vs exact becomes the boolean law."""
    from approximate_quantiles_ray.pipelines import similarity as S

    approx_fn = {
        "ivf": S.embeddings_knn_ivf,
        "lsh": S.embeddings_knn_lsh,
        "pq": S.embeddings_knn_pq,
    }[variant]
    exact, approx = _concurrent(
        lambda: S.embeddings_knn_bruteforce(sf_dir), lambda: approx_fn(sf_dir), raw=1
    )
    ga = exact.groupby("query_id")["vec_id"].apply(set)
    gb = approx.groupby("query_id")["vec_id"].apply(set)
    recall = sum(len(ga[q] & gb.get(q, set())) for q in ga.index) / sum(
        len(ga[q]) for q in ga.index
    )
    out = exact.copy()
    out["recall_ok"] = bool(recall >= ANN_RECALL_FLOORS[variant])
    # ADVICE r4: also hash-pin an approximation-DERIVED scalar so a
    # recall regression that stays above the floor (0.99 → 0.91) still
    # shifts a pinned value: recall on a 1/20 grid as an exact integer.
    # The SQL twin pins the expected grid value per test scale
    # (discriminated by the events row count — see _knn_gate_sql).
    out["recall_pct20"] = np.int64(round(recall * 20))
    return out


def embeddings_knn_ivf_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED IVF gate: exact top-k rows + recall@10 ≥ 0.9."""
    return _ann_gate(sf_dir, "ivf")


def embeddings_knn_lsh_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED hyperplane-LSH gate: exact top-k rows + recall@10
    ≥ 0.6 (isotropic data is LSH's worst case; floor measured)."""
    return _ann_gate(sf_dir, "lsh")


def embeddings_knn_pq_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED residual-PQ gate: exact top-k rows + recall@10
    ≥ 0.9 (floor measured on the isotropic testdata at the m=16
    default)."""
    return _ann_gate(sf_dir, "pq")


def embeddings_near_dups_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED embedding near-dup pairs: the emitted pair list
    is compared against the FULL exact cross-join twin (every pair with
    cosine ≥ 0.95) — a banding recall miss or a false pair
    hash-mismatches outright. (On the isotropic testdata both sides are
    empty at every sf; the planted-pair recall behavior lives in
    tests/test_similarity.py.)"""
    from approximate_quantiles_ray.pipelines.similarity import embeddings_near_dups

    out = embeddings_near_dups(sf_dir)
    out = out.copy()
    out["cosine"] = out["cosine"].astype(np.float64).round(4)
    return out


def docs_minhash_clusters_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED MinHash-LSH invariant gate. The cluster assignment
    itself is banding-dependent (no SQL twin), but three laws are exact:

    - n_docs — row conservation (one verdict row per document),
    - n_dup_surplus — COUNT(*) − COUNT(DISTINCT text): identical-text
      docs beyond each group's first (SQL-exact),
    - exact_dups_coclustered — docs with IDENTICAL text must share a
      cluster (J=1 collides in every band; missing one means the
      pipeline broke), and removed_ge_surplus — at least the exact
      surplus is marked non-kept.
    """
    from approximate_quantiles_ray.functions.hashing import hash_strings
    from approximate_quantiles_ray.pipelines.dedup import docs_minhash_clusters

    def content_keys(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": tbl.column("doc_id"),
                "ck": pa.array(
                    hash_strings(tbl.column("text").combine_chunks()).astype(np.int64)
                ),
            }
        )

    def _keys():
        ds = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return ds.map_batches(
            content_keys, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()

    verdicts, keys = _concurrent(
        lambda: docs_minhash_clusters(sf_dir).set_index("doc_id"), _keys
    )
    n_docs = len(keys)
    groups = keys.groupby("ck")["doc_id"].apply(list)
    dup_groups = [g for g in groups if len(g) > 1]
    surplus = sum(len(g) - 1 for g in dup_groups)
    coclustered = all(
        len({verdicts.loc[d, "cluster_id"] for d in g}) == 1 for g in dup_groups
    )
    removed = int((~verdicts["is_kept"].astype(bool)).sum())
    return pd.DataFrame(
        {
            "n_docs": np.array([n_docs], np.int64),
            "n_dup_surplus": np.array([surplus], np.int64),
            "exact_dups_coclustered": np.array([coclustered]),
            "removed_ge_surplus": np.array([removed >= surplus]),
        }
    )


def docs_simhash_pairs_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED SimHash invariant gate: identical-text pairs have
    Hamming 0 and MUST all surface (pigeonhole banding is exact at
    distance ≤ 3), so the count of emitted pairs whose texts are
    identical is hash-pinned against SQL's identical-text pair count;
    hamming_law_ok pins the verify threshold."""
    from approximate_quantiles_ray.functions.hashing import hash_strings
    from approximate_quantiles_ray.pipelines.dedup import docs_simhash_pairs

    def _keys():
        ds = read_parquet_sized(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
        )
        return (
            ds.map_batches(
                lambda t: pa.table(
                    {
                        "doc_id": t.column("doc_id"),
                        "ck": pa.array(
                            hash_strings(t.column("text").combine_chunks()).astype(np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
                zero_copy_batch=True,
            )
            .to_pandas()
            .set_index("doc_id")["ck"]
        )

    pairs, keys = _concurrent(lambda: docs_simhash_pairs(sf_dir), _keys)
    same_text = (
        keys.reindex(pairs["a"]).to_numpy() == keys.reindex(pairs["b"]).to_numpy()
        if len(pairs)
        else np.zeros(0, bool)
    )
    return pd.DataFrame(
        {
            "n_exact_dup_pairs": np.array([int(same_text.sum())], np.int64),
            "hamming_law_ok": np.array([bool((pairs["hamming"] <= 3).all())]),
        }
    )


def embeddings_cluster_label_profile_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED k-means contingency gate: per-label vector totals
    summed over the contingency cells are hash-pinned against SQL
    COUNT(*) GROUP BY label (fold conservation — a dropped or
    double-counted cell mismatches); `deterministic` pins double-run
    equality of the FULL (cluster, label, n) table (seeded Lloyd +
    hash sample + fixed tie-breaks are block-layout independent)."""
    from approximate_quantiles_ray.pipelines.similarity import (
        embeddings_cluster_label_profile,
    )

    a, b = _concurrent(
        lambda: embeddings_cluster_label_profile(sf_dir),
        lambda: embeddings_cluster_label_profile(sf_dir),
    )
    deterministic = a.equals(b)
    per_label = a.groupby("label", as_index=False)["n"].sum().rename(
        columns={"n": "n_vecs"}
    )
    per_label["deterministic"] = bool(deterministic)
    return per_label.sort_values("label").reset_index(drop=True)


def embeddings_semantic_dedup_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED SemDeDup gate. Cluster assignment is a transitive
    closure (no SQL twin), but four laws are exact:

    - n_vecs — row conservation through the verdict pipeline,
    - n_dup_members — vectors appearing in some exact-cosine ≥ 0.95
      pair, hash-pinned against the full DuckDB cross-join (a blocking
      recall miss mismatches outright, as in the near-dups gate),
    - removed_subset_ok — every removed vector is a dup member,
    - keep_rule_ok — every cluster keeps EXACTLY its min-id member.
    (On the isotropic testdata both sides have zero dup members at
    every sf; planted-cluster recall lives in tests/test_similarity.py.)
    """
    from approximate_quantiles_ray.pipelines.similarity import (
        embeddings_near_dups,
        semantic_dedup,
    )

    def _verdicts():
        from approximate_quantiles_ray.sources.read import parquet_list_dim

        path = f"{sf_dir}/embeddings.parquet"
        ds = read_parquet_sized(path, columns=["vec_id", "embedding"])
        return semantic_dedup(
            ds, threshold=0.95, dim=parquet_list_dim(path, "embedding")
        ).to_pandas()

    verdicts, pairs = _concurrent(_verdicts, lambda: embeddings_near_dups(sf_dir))

    dup_members = set(pairs["a"]) | set(pairs["b"])
    removed = verdicts[~verdicts["is_kept"].astype(bool)]
    removed_ok = set(removed["vec_id"]).issubset(dup_members)
    kept = verdicts[verdicts["is_kept"].astype(bool)]
    mins = verdicts.groupby("cluster_id")["vec_id"].min()  # vectorized
    keep_ok = bool(
        len(kept) == verdicts["cluster_id"].nunique()
        and kept.set_index("cluster_id")["vec_id"].sort_index().equals(mins.sort_index())
    )
    return pd.DataFrame(
        {
            "n_vecs": np.array([len(verdicts)], np.int64),
            "n_dup_members": np.array([len(dup_members)], np.int64),
            "removed_subset_ok": np.array([removed_ok]),
            "keep_rule_ok": np.array([keep_ok]),
        }
    )


def media_features_gate(sf_dir: str) -> pd.DataFrame:
    """ORACLE-MATCHED multimodal gate. The decode output itself has no
    SQL twin (DuckDB can't run a codec), but three laws are exact and
    SQL-pinnable as constants of the corpus DEFINITION (48 items,
    round-robin modality ⇒ 16 each; real_payloads=True ⇒ every item
    must sniff to a real codec, never the stub):

    - n_items per modality (row conservation through filter + actor
      pool),
    - n_real_decoded == n_items (BMP/WAV/AQV sniffing never fell back
      to the stub),
    - deterministic — double-run equality of the FULL report including
      the feature checksums (actor/partition/retry independence of the
      decode → resize/RMS/frame-sample math).

    ``sf_dir`` is unused by the underlying pipeline (media payloads are
    synthesized; the testdata tables carry no binary column)."""
    from approximate_quantiles_ray.pipelines.multimodal import (
        CPUS_PER_MEDIA_PIPELINE,
        cluster_cpus,
        media_pipeline_report,
    )

    # each report may itself run 3 concurrent actor-pool pipelines;
    # overlapping the two runs is safe only with 2×3 pools of headroom
    # (idle actor pools hold CPUs — see media_pipeline_report)
    if cluster_cpus() >= 6 * CPUS_PER_MEDIA_PIPELINE:
        a, b = _concurrent(
            lambda: media_pipeline_report(sf_dir), lambda: media_pipeline_report(sf_dir)
        )
    else:
        a, b = media_pipeline_report(sf_dir), media_pipeline_report(sf_dir)
    deterministic = a.reset_index(drop=True).equals(b.reset_index(drop=True))
    out = a[["modality", "n_items", "n_real_decoded"]].copy()
    out["n_items"] = out["n_items"].astype(np.int64)
    out["n_real_decoded"] = out["n_real_decoded"].astype(np.int64)
    out["deterministic"] = bool(deterministic)
    return out.sort_values("modality").reset_index(drop=True)


# Measured recall@10 (×20, rounded) per ANN variant at each test scale,
# discriminated by the events row count (embeddings counts collide at
# sf0.001/sf0.01). All three pipelines are fully seeded, so these are
# constants of (code, data); re-measure if the algorithm or testdata
# changes. events=1000 → sf0.001, 10000 → sf0.01, 100000 → sf0.1.
ANN_RECALL_PCT20 = {
    "ivf": {1000: 19, 10000: 19, 100000: 20},
    "lsh": {1000: 13, 10000: 15, 100000: 17},
    "pq": {1000: 20, 10000: 20, 100000: 19},
}


def _knn_gate_sql(base_sql: str, variant: str) -> str:
    pins = ANN_RECALL_PCT20[variant]
    whens = " ".join(f"WHEN {n} THEN {v}" for n, v in sorted(pins.items()))
    return (
        f"SELECT *, TRUE AS recall_ok, "
        f"CAST(CASE (SELECT COUNT(*) FROM events) {whens} END AS BIGINT) "
        f"AS recall_pct20 FROM ({base_sql})"
    )


def extra_oracle_sql() -> dict[str, str]:
    """Static oracles for the ANN/dedup/clustering gates (events/docs/
    embeddings tables are pre-registered driver views)."""
    from approximate_quantiles_ray.pipelines import similarity as S

    bf = S.ORACLE_SQL["embeddings_knn_bruteforce"]
    return {
        "embeddings_knn_ivf": _knn_gate_sql(bf, "ivf"),
        "embeddings_knn_lsh": _knn_gate_sql(bf, "lsh"),
        "embeddings_knn_pq": _knn_gate_sql(bf, "pq"),
        "embeddings_near_dups": """
            SELECT a.vec_id AS a, b.vec_id AS b,
                   ROUND(list_cosine_similarity(
                       CAST(a.embedding AS DOUBLE[]),
                       CAST(b.embedding AS DOUBLE[])), 4) AS cosine
            FROM embeddings a, embeddings b
            WHERE a.vec_id < b.vec_id
              AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) >= 0.95
            ORDER BY a, b
        """,
        "docs_minhash_clusters": """
            SELECT COUNT(*) AS n_docs,
                   COUNT(*) - COUNT(DISTINCT text) AS n_dup_surplus,
                   TRUE AS exact_dups_coclustered,
                   TRUE AS removed_ge_surplus
            FROM documents
        """,
        "docs_simhash_pairs": """
            WITH g AS (
              SELECT text, COUNT(*) AS n FROM documents GROUP BY text HAVING COUNT(*) > 1
            )
            SELECT CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
                       AS n_exact_dup_pairs,
                   TRUE AS hamming_law_ok
            FROM g
        """,
        "embeddings_cluster_label_profile": """
            SELECT CAST(label AS BIGINT) AS label, COUNT(*) AS n_vecs,
                   TRUE AS deterministic
            FROM embeddings GROUP BY label ORDER BY label
        """,
        "embeddings_semantic_dedup": """
            WITH p AS (
              SELECT a.vec_id AS a, b.vec_id AS b
              FROM embeddings a, embeddings b
              WHERE a.vec_id < b.vec_id
                AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) >= 0.95
            ),
            m AS (SELECT DISTINCT v FROM
                  (SELECT a AS v FROM p UNION ALL SELECT b AS v FROM p))
            SELECT (SELECT COUNT(*) FROM embeddings) AS n_vecs,
                   (SELECT COUNT(*) FROM m) AS n_dup_members,
                   TRUE AS removed_subset_ok,
                   TRUE AS keep_rule_ok
        """,
        # constants of the corpus DEFINITION (synth_media_table(48):
        # round-robin modality => 16 each; real_payloads=True => every
        # payload must sniff to a real codec), not of codec output —
        # see media_features_gate
        "media_features": """
            SELECT modality, CAST(n_items AS BIGINT) AS n_items,
                   CAST(n_real_decoded AS BIGINT) AS n_real_decoded,
                   deterministic
            FROM (VALUES ('audio', 16, 16, TRUE),
                         ('image', 16, 16, TRUE),
                         ('video', 16, 16, TRUE))
                 AS t(modality, n_items, n_real_decoded, deterministic)
            ORDER BY modality
        """,
    }


QUERIES.update(
    {
        "embeddings_knn_ivf": embeddings_knn_ivf_gate,
        "embeddings_knn_lsh": embeddings_knn_lsh_gate,
        "embeddings_knn_pq": embeddings_knn_pq_gate,
        "embeddings_near_dups": embeddings_near_dups_gate,
        "docs_minhash_clusters": docs_minhash_clusters_gate,
        "docs_simhash_pairs": docs_simhash_pairs_gate,
        "embeddings_cluster_label_profile": embeddings_cluster_label_profile_gate,
        "embeddings_semantic_dedup": embeddings_semantic_dedup_gate,
        "media_features": media_features_gate,
    }
)
