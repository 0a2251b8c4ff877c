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
    import ray.data as rd

    return rd.read_parquet(transcripts_dir_for(sf_dir), columns=columns)


def role_stats(sf_dir: str) -> pd.DataFrame:
    """Per role: turn count, distinct conversations, total text chars.

    ONE pass over the data (round-2 fusion, halves the round-1 cost):
    each block reduces to its distinct (role, conv_id) pairs carrying
    partial (n_turns, chars) sums via an Arrow C++ group_by, so only
    ~#convs rows reach the first shuffle; a second shuffle over those
    per-conv rows (tiny: one row per (role, conv)) produces the final
    per-role counts, distinct-conv counts, and char sums.
    """
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
        agg = t.group_by(["role", "conv_id"]).aggregate([("chars", "sum"), ("chars", "count")])
        return agg.rename_columns(["role", "conv_id", "chars", "n_turns"])

    from ray.data.aggregate import Count, Sum

    per_conv = (
        ds.map_batches(block_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["role", "conv_id"])
        .aggregate(Sum("n_turns"), Sum("chars"))
        .rename_columns({"sum(n_turns)": "n_turns", "sum(chars)": "chars"})
    )
    out = (
        per_conv.groupby("role")
        .aggregate(Count(), Sum("n_turns"), Sum("chars"))
        .rename_columns(
            {"count()": "n_convs", "sum(n_turns)": "n_turns", "sum(chars)": "text_chars"}
        )
        .to_pandas()[["role", "n_turns", "n_convs", "text_chars"]]
    )
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

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(block_counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tool")
        .aggregate(Sum("n"))
        .rename_columns({"sum(n)": "n_uses"})
    )
    return counts.sort(["n_uses", "tool"], descending=[True, False]).limit(k).to_pandas()


def latency_quantiles_exact(sf_dir: str) -> pd.DataFrame:
    """Element-exact quantiles of inter-turn latency (µs).

    Plan: narrow projection at the read → one (conv_id, turn_idx) range
    sort → fused segmented lag + per-block gap value counts with
    boundary stitching (engine/segmented.py segmented_gap_hist — no
    per-group Python calls, no row-scale intermediate) → distributed
    histogram quantile selection (relational.quantiles_from_histogram)
    with the stitched boundary gaps folded into the driver walk.
    """
    from approximate_quantiles_ray.engine.segmented import segmented_gap_hist
    from approximate_quantiles_ray.pipelines.relational import quantiles_from_histogram

    ds = read_transcripts_ds(sf_dir, ["conv_id", "turn_idx", "ts"])
    hist, boundary = segmented_gap_hist(ds)
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
    }


QUERIES = {
    "transcript_role_stats": role_stats,
    "transcript_tool_topk": tool_topk,
    "transcript_latency_quantiles": latency_quantiles_exact,
}


def conv_stats(sf_dir: str) -> pd.DataFrame:
    """Per-conversation feature row (the conv-level table training-data
    filters select on): turn count, total text chars, span duration.

    One hash shuffle on conv_id of pre-projected narrow rows; all
    outputs integer (counts, char sums, µs durations) → hash-stable vs
    the DuckDB oracle.
    """
    ds = read_transcripts_ds(sf_dir, ["conv_id", "text", "ts"])

    def project(tbl: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": tbl.column("conv_id"),
                "chars": pc.cast(pc.utf8_length(tbl.column("text")), pa.int64()),
                "ts_us": tbl.column("ts").combine_chunks().cast(pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Max, Min, Sum

    out = (
        ds.map_batches(project, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("conv_id")
        .aggregate(Count(), Sum("chars"), Min("ts_us"), Max("ts_us"))
        .rename_columns(
            {
                "count()": "n_turns",
                "sum(chars)": "total_chars",
                "min(ts_us)": "ts_min_us",
                "max(ts_us)": "ts_max_us",
            }
        )
        .to_pandas()
    )
    out["duration_us"] = (out["ts_max_us"] - out["ts_min_us"]).astype("int64")
    out = out[["conv_id", "n_turns", "total_chars", "duration_us"]]
    return out.sort_values("conv_id").reset_index(drop=True)


QUERIES["transcript_conv_stats"] = conv_stats
