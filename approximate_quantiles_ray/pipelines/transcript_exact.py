"""Exact companions to the transcript sketch suite (oracle-matched).

Each sketch metric in pipelines/transcripts.py has an exact counterpart
here whose result is bit-identical to DuckDB SQL over the same Parquet
(CORRECTNESS gate): role-grouped counts + int char sums, exact tool
heavy-hitter top-k, and element-exact inter-turn latency quantiles in
integer microseconds. These double as the small-scale ground truth the
sketch estimates are bounded against in tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.pipelines.relational import exact_quantiles
from approximate_quantiles_ray.sources.transcripts import transcripts_for_sf

from approximate_quantiles_ray.sources.read import read_parquet_sized

LATENCY_QS = (0.5, 0.9, 0.95, 0.99)


def sf_of_dir(sf_dir: str) -> float:
    """Parse scale factor from a '/root/testdata/sf0.01'-style path."""
    base = sf_dir.rstrip("/").rsplit("/", 1)[-1]
    if base.startswith("sf"):
        return float(base[2:])
    return 0.01


def transcripts_dir_for(sf_dir: str) -> str:
    """Map a testdata sf dir to the deterministic synthetic transcript
    table of the same scale (generated once, cached under /tmp)."""
    return transcripts_for_sf(sf_of_dir(sf_dir))


def read_transcripts_ds(sf_dir: str, columns: list[str] | None = None):

    return read_parquet_sized(transcripts_dir_for(sf_dir), columns=columns)


def role_stats(sf_dir: str) -> pd.DataFrame:
    """Per role: turn count, distinct conversations, total text chars.

    ONE pass over the data (round-2 fusion, halves the round-1 cost):
    each block reduces to its distinct (role, conv_id) pairs carrying
    partial (n_turns, chars) sums via an Arrow C++ group_by, so only
    ~#convs rows leave any block; the adaptive two-level fold
    (engine/folds.py) combines them — pandas on the driver below the
    cap, two Ray groupbys above it.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_distinct_stats

    ds = read_transcripts_ds(sf_dir, ["role", "conv_id", "text"])

    def block_partials(tbl: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays(
            [
                tbl.column("role"),
                tbl.column("conv_id"),
                pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
            ],
            names=["role", "conv_id", "chars"],
        )
        # count_all = COUNT(*) (a NULL text row is still a turn)
        agg = t.group_by(["role", "conv_id"]).aggregate([([], "count_all"), ("chars", "sum")])
        return agg.rename_columns(["role", "conv_id", "n_turns", "chars"])

    part = ds.map_batches(block_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = adaptive_distinct_stats(
        part, ["role"], "conv_id", {"n_turns": "sum", "chars": "sum"}
    ).rename(columns={"n_distinct": "n_convs", "chars": "text_chars"})
    out = out[["role", "n_turns", "n_convs", "text_chars"]]
    return out.sort_values("role").reset_index(drop=True)


def tool_topk(sf_dir: str, k: int = 10) -> pd.DataFrame:
    """Exact tool heavy hitters (the count-min sketch's ground truth)."""
    ds = read_transcripts_ds(sf_dir, ["tool"])
    def block_counts(t: pa.Table) -> pa.Table:
        # per-block pre-aggregation: only (tool, n) rows — ~50 per block —
        # reach the shuffle, not one row per turn
        vc = t.drop_null().column("tool").value_counts()
        return pa.table(
            {"tool": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    counts = adaptive_grouped_agg(part, ["tool"], {"n": "sum"}).rename(columns={"n": "n_uses"})
    return (
        counts.sort_values(["n_uses", "tool"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def _gap_hist(sf_dir: str, layout: str = "auto"):
    """Shared gap-histogram plan: (partial (gap_us, n) Dataset, boundary
    extras or None). ``auto`` rides the cached conv_id-bucketed layout
    (complete per-bucket histograms, zero stitching); fallback is the
    one-shot range-sort fused segmented plan."""
    boundary = None
    hist = None
    if layout in ("auto", "bucketed"):
        try:
            from approximate_quantiles_ray.sources.bucketed import (
                ensure_bucketed,
                gap_hist_bucketed,
            )

            hist = gap_hist_bucketed(ensure_bucketed(transcripts_dir_for(sf_dir)))
        except Exception:
            if layout == "bucketed":
                raise
    if hist is None:
        from approximate_quantiles_ray.engine.segmented import segmented_gap_hist

        ds = read_transcripts_ds(sf_dir, ["conv_id", "turn_idx", "ts"])
        hist, boundary = segmented_gap_hist(ds)
    return hist, boundary


def latency_quantiles_exact(sf_dir: str, layout: str = "auto") -> pd.DataFrame:
    """Element-exact quantiles of inter-turn latency (µs).

    ``layout="auto"`` (default): run over the cached conv_id-bucketed
    layout (sources/bucketed.py — buckets own whole conversations, so
    per-bucket gap histograms are complete with zero shuffles and zero
    boundary stitching), building it on first use; the same layout is
    shared with transcript_report's latency sketches. ``layout="sort"``
    forces the one-shot plan: (conv_id, turn_idx) range sort → fused
    segmented lag + per-block gap value counts with boundary stitching
    (engine/segmented.segmented_gap_hist). Both feed the distributed
    histogram quantile selection (relational.quantiles_from_histogram).
    """
    from approximate_quantiles_ray.pipelines.relational import quantiles_from_histogram

    hist, boundary = _gap_hist(sf_dir, layout)
    out = quantiles_from_histogram(
        hist, "gap_us", LATENCY_QS, extra_values=boundary, pre_grouped=False
    )
    if not len(out):  # all conversations single-turn → no gaps
        return pd.DataFrame({"q": pd.Series(dtype=float), "gap_us": pd.Series(dtype="int64")})
    out["gap_us"] = out["value"].astype("int64")
    return out[["q", "gap_us"]]


def _tdir_glob(sf_dir: str) -> str:
    return transcripts_dir_for(sf_dir) + "/*.parquet"


def oracle_sql(sf_dir_for_oracle: str) -> dict[str, str]:
    """DuckDB SQL over the same synthetic Parquet files (read_parquet by
    absolute path — the transcript table is not a pre-registered view)."""
    glob = _tdir_glob(sf_dir_for_oracle)
    lat = " UNION ALL ".join(
        f"""SELECT {q} AS q, quantile_disc(gap_us, {q}) AS gap_us FROM (
              SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                  PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
              FROM read_parquet('{glob}')
            ) WHERE gap_us IS NOT NULL"""
        for q in LATENCY_QS
    )
    return {
        "transcript_conv_stats": f"""
            SELECT conv_id, COUNT(*) AS n_turns,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
                   epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
            FROM read_parquet('{glob}') GROUP BY conv_id ORDER BY conv_id
        """,
        "transcript_role_stats": f"""
            SELECT role, COUNT(*) AS n_turns,
                   COUNT(DISTINCT conv_id) AS n_convs,
                   CAST(SUM(LENGTH(text)) AS BIGINT) AS text_chars
            FROM read_parquet('{glob}') GROUP BY role ORDER BY role
        """,
        "transcript_tool_topk": f"""
            SELECT tool, COUNT(*) AS n_uses
            FROM read_parquet('{glob}') WHERE tool IS NOT NULL
            GROUP BY tool ORDER BY n_uses DESC, tool ASC LIMIT 10
        """,
        "transcript_latency_quantiles": lat,
        "transcript_conv_gini": f"""
            WITH sz AS (
                SELECT conv_id, COUNT(*) AS n
                FROM read_parquet('{glob}') GROUP BY conv_id
            ),
            h AS (SELECT n AS v, COUNT(*) AS c FROM sz GROUP BY n),
            s AS (SELECT v, c, SUM(c) OVER (ORDER BY v) - c AS prior FROM h),
            a AS (
              SELECT SUM(CAST(v AS HUGEINT) *
                         (CAST(c AS HUGEINT) * CAST(prior AS HUGEINT)
                          + CAST(c AS HUGEINT) * (CAST(c AS HUGEINT) + 1) // 2)) AS S,
                     SUM(CAST(v AS HUGEINT) * CAST(c AS HUGEINT)) AS T,
                     SUM(c) AS n
              FROM s
            )
            SELECT CAST(n AS BIGINT) AS n_convs,
                   CAST(T AS BIGINT) AS n_turns,
                   CAST(2 * S AS DOUBLE) / CAST(n * T AS DOUBLE)
                     - CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
            FROM a
        """,
        "transcript_latency_mad": f"""
            WITH gg AS (
              SELECT gap_us FROM (
                SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY conv_id ORDER BY turn_idx) AS gap_us
                FROM read_parquet('{glob}')
              ) WHERE gap_us IS NOT NULL
            ),
            m AS (SELECT quantile_disc(gap_us, 0.5) AS med FROM gg)
            SELECT CAST(m.med AS BIGINT) AS median_us,
                   (SELECT CAST(quantile_disc(abs(gap_us - m.med), 0.5) AS BIGINT)
                    FROM gg) AS mad_us
            FROM m
        """,
        # row conservation + sortedness law (the checksums have no SQL
        # twin and are pytest-verified instead)
        "transcript_order_invariant": f"""
            SELECT CAST(COUNT(*) AS BIGINT) AS n_rows, TRUE AS sorted_ok
            FROM read_parquet('{glob}')
        """,
        "transcript_conv_dedup": f"""
            WITH fp AS (
                SELECT conv_id,
                       string_agg(text, chr(31) ORDER BY turn_idx) AS f
                FROM read_parquet('{glob}') GROUP BY conv_id)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_convs,
                   CAST(COUNT(DISTINCT f) AS BIGINT) AS n_distinct_convs,
                   CAST(COUNT(*) - COUNT(DISTINCT f) AS BIGINT) AS n_dup_convs
            FROM fp
        """,
        "transcript_role_transitions": f"""
            WITH t AS (
                SELECT role,
                       LAG(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                           AS prev_role
                FROM read_parquet('{glob}'))
            SELECT prev_role, role AS next_role, COUNT(*) AS n_transitions
            FROM t WHERE prev_role IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        # Bloom no-false-negative law over a SQL-reproducible probe set
        # (first 200 sorted distinct conv_ids)
        "transcript_membership": f"""
            SELECT CAST(LEAST(COUNT(DISTINCT conv_id), 200) AS BIGINT) AS present_probes,
                   CAST(LEAST(COUNT(DISTINCT conv_id), 200) AS BIGINT) AS present_hits,
                   CAST(200 AS BIGINT) AS absent_probes
            FROM read_parquet('{glob}')
        """,
    }


def role_transitions(sf_dir: str, layout: str = "auto") -> pd.DataFrame:
    """CONVERSATION-STRUCTURE analysis (oracle-matched vs SQL LAG):
    count every adjacent (prev_role → next_role) pair within a
    conversation's turn order — the role-transition matrix of the
    corpus (who answers whom, tool-call cadence).

    ``layout="auto"``: per-bucket complete counts over the cached
    conv_id-bucketed layout (zero shuffle / zero stitching);
    ``"sort"`` forces the general one-sort fused plan with TAIL→HEAD
    boundary stitching (engine/segmented.segmented_transitions).
    """
    allp = None
    if layout in ("auto", "bucketed"):
        try:
            from approximate_quantiles_ray.sources.bucketed import (
                ensure_bucketed,
                transitions_bucketed,
            )

            root = ensure_bucketed(transcripts_dir_for(sf_dir))
            allp = transitions_bucketed(root).to_pandas()
            if len(allp):
                allp = allp.groupby(["prev", "nxt"], as_index=False)["n"].sum()
        except Exception:
            if layout == "bucketed":
                raise
            allp = None
    if allp is None:
        from approximate_quantiles_ray.engine.segmented import segmented_transitions

        ds = read_transcripts_ds(sf_dir, ["conv_id", "turn_idx", "role"])
        allp = segmented_transitions(ds, "conv_id", "turn_idx", "role")
    out = allp.rename(
        columns={"prev": "prev_role", "nxt": "next_role", "n": "n_transitions"}
    )
    out["n_transitions"] = out["n_transitions"].astype(np.int64)
    return out.sort_values(["prev_role", "next_role"]).reset_index(drop=True)


def conv_dedup_stats(sf_dir: str) -> pd.DataFrame:
    """CONVERSATION-LEVEL EXACT DEDUP (oracle-matched): count
    conversations whose full ordered text content duplicates another
    conversation — the corpus-hygiene pass a transcript pipeline runs
    before training (near-dup lives in pipelines/dedup.py; this is the
    exact tier at conversation granularity).

    Scale plan: the conv_id-bucketed layout gives each bucket whole
    conversations; one pass computes an ORDER-SENSITIVE 64-bit
    polynomial fingerprint per conversation
    (sources/bucketed.BucketConvFingerprints — text hash × B^position,
    so turn order matters), then per-block distinct-fp partials fold
    adaptively and the driver sees counts only. Exact up to 64-bit
    birthday collisions (P < 1e-7 below ~10^6 convs; swap in the
    16-byte key scheme of dedup.exact_dedup beyond).
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg_ds
    from approximate_quantiles_ray.sources.bucketed import (
        conv_fingerprints_bucketed,
        ensure_bucketed,
    )

    root = ensure_bucketed(transcripts_dir_for(sf_dir))
    fps = conv_fingerprints_bucketed(root)

    def partial(tbl: pa.Table) -> pa.Table:
        agg = tbl.select(["fp"]).group_by(["fp"]).aggregate([([], "count_all")])
        return agg.rename_columns(["fp", "n_convs"])

    folded, is_ds = adaptive_grouped_agg_ds(
        fps.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["fp"],
        {"n_convs": "sum"},
    )
    if is_ds:
        import ray

        n_distinct = folded.count()
        n_convs = int(
            folded.map_batches(
                lambda t: pa.table({"s": pa.array([int(np.sum(t.column("n_convs").to_numpy(zero_copy_only=False)))], pa.int64())}),
                batch_format="pyarrow", zero_copy_batch=True,
            ).to_pandas()["s"].sum()
        )
    else:
        n_distinct = len(folded)
        n_convs = int(folded["n_convs"].sum())
    return pd.DataFrame(
        {
            "n_convs": [np.int64(n_convs)],
            "n_distinct_convs": [np.int64(n_distinct)],
            "n_dup_convs": [np.int64(n_convs - n_distinct)],
        }
    )


def latency_mad(sf_dir: str, layout: str = "auto") -> pd.DataFrame:
    """Exact median + median-absolute-deviation of inter-turn latency
    (oracle-matched vs SQL LAG): the robust "typical gap and its
    typical spread" pair an SLO review wants from the flagship table.

    ONE data pass: the shared gap histogram (:func:`_gap_hist`) feeds
    two selection walks — the median, then the median of the
    DERIVED |gap − med| histogram, which is just an Arrow transform of
    the partial (gap_us, n) rows (two distinct gaps may map to one
    deviation; the walk's pre_grouped=False re-fold handles the merge).
    Boundary extras transform the same way on the driver.
    """
    from approximate_quantiles_ray.pipelines.relational import quantiles_from_histogram

    hist, boundary = _gap_hist(sf_dir, layout)
    # both walks reuse the SAME materialized partial histogram — without
    # this the gap computation re-executes per walk (measured ~1.2 s/extra
    # pass at sf0.1)
    hist = hist.materialize()
    med_df = quantiles_from_histogram(
        hist, "gap_us", (0.5,), extra_values=boundary, pre_grouped=False
    )
    if not len(med_df):
        return pd.DataFrame(
            {"median_us": pd.Series(dtype="int64"), "mad_us": pd.Series(dtype="int64")}
        )
    med = int(med_df["value"].iloc[0])

    def dev(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "dev_us": pc.abs(
                    pc.subtract(tbl.column("gap_us"), pa.scalar(med, pa.int64()))
                ),
                "n": tbl.column("n"),
            }
        )

    dev_hist = hist.map_batches(dev, batch_format="pyarrow", zero_copy_batch=True)
    dev_boundary = (
        np.abs(np.asarray(boundary, np.int64) - med) if boundary is not None else None
    )
    mad_df = quantiles_from_histogram(
        dev_hist, "dev_us", (0.5,), extra_values=dev_boundary, pre_grouped=False
    )
    return pd.DataFrame(
        {
            "median_us": np.array([med], np.int64),
            "mad_us": np.array([int(mad_df["value"].iloc[0])], np.int64),
        }
    )


QUERIES = {
    "transcript_role_stats": role_stats,
    "transcript_tool_topk": tool_topk,
    "transcript_latency_quantiles": latency_quantiles_exact,
    "transcript_latency_mad": latency_mad,
    "transcript_role_transitions": role_transitions,
    "transcript_conv_dedup": conv_dedup_stats,
}


def conv_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation feature row (the conv-level table training-data
    filters select on): turn count, total text chars, span duration.

    Each block reduces to its distinct convs first (Arrow C++ group_by
    — partial count/sum/min/max per conv per block), then the adaptive
    fold combines partials (pandas below the driver cap, Ray groupby
    above — engine/folds.py). All outputs integer (counts, char sums,
    µs durations) → hash-stable vs the DuckDB oracle.
    """
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    ds = read_transcripts_ds(sf_dir, ["conv_id", "text", "ts"])

    def block_partials(tbl: pa.Table) -> pa.Table:
        t = pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                "ts_us": tbl.column("ts").combine_chunks().cast(pa.int64()),
            }
        )
        # count_all = COUNT(*) (a NULL text row is still a turn)
        agg = t.group_by(["conv_id"]).aggregate(
            [([], "count_all"), ("chars", "sum"), ("ts_us", "min"), ("ts_us", "max")]
        )
        return agg.rename_columns(["conv_id", "n_turns", "total_chars", "ts_min", "ts_max"])

    part = ds.map_batches(block_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = adaptive_grouped_agg(
        part,
        ["conv_id"],
        {"n_turns": "sum", "total_chars": "sum", "ts_min": "min", "ts_max": "max"},
    )
    out["duration_us"] = (out["ts_max"] - out["ts_min"]).astype("int64")
    out = out[["conv_id", "n_turns", "total_chars", "duration_us"]]
    return out.sort_values("conv_id").reset_index(drop=True)


QUERIES["transcript_conv_stats"] = conv_stats


def conv_size_gini(sf_dir: str) -> pd.DataFrame:
    """Exact Gini of per-conversation turn counts (oracle-matched):
    how concentrated the corpus is in its largest conversations — the
    skew number that decides whether grouped work needs salting
    (engine/planner.py acts on the same signal via CMS). The synthetic
    corpus is Zipf by design, so this is a real inequality, not ~0.

    Plan: per-block (conv_id, n) partials → adaptive fold → distinct
    SIZE histogram (domain-bounded: #distinct conversation sizes) →
    the HUGEINT-safe rank-weighted walk of relational.orders_price_gini
    (Python bigints; one shared cast-then-divide)."""
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    ds = read_transcripts_ds(sf_dir, ["conv_id"])

    def block_counts(tbl: pa.Table) -> pa.Table:
        vc = tbl.column("conv_id").combine_chunks().value_counts()
        return pa.table(
            {"conv_id": vc.field("values"), "n": pc.cast(vc.field("counts"), pa.int64())}
        )

    part = ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
    sizes = adaptive_grouped_agg(part, ["conv_id"], {"n": "sum"})
    # distinct-size histogram: (size, #convs with that size)
    hist = sizes.groupby("n").size().reset_index(name="c").sort_values("n")
    v = hist["n"].to_numpy(np.int64)
    c = hist["c"].to_numpy(np.int64)
    prior = np.cumsum(c) - c
    S = sum(int(vi) * (int(ci) * int(pi) + int(ci) * (int(ci) + 1) // 2)
            for vi, ci, pi in zip(v, c, prior))
    T = sum(int(vi) * int(ci) for vi, ci in zip(v, c))
    n = int(c.sum())
    gini = float(2 * S) / float(n * T) - float(n + 1) / float(n)
    return pd.DataFrame(
        {
            "n_convs": np.array([n], np.int64),
            "n_turns": np.array([T], np.int64),
            "gini": np.array([gini], np.float64),
        }
    )


QUERIES["transcript_conv_gini"] = conv_size_gini
