"""Audience-overlap pipelines: exact distinct-user set expressions and
their KMV-sketch estimates.

The exact plan is the 100 TB-safe shape for "how many users did BOTH X
and Y" questions: per-block partial boolean flags per event type →
ONE per-user max-fold (the only shuffle; per-user row width is
#types bits, independent of event count) → per-block partial pair
sums over the folded rows → tiny global sum. No distinct-pair list
ever reaches the driver above the adaptive cap.

The KMV twin (`sketches/kmv.py`) answers the same questions from five
KB-sized sketches built in a single pass with NO shuffle at all — the
plan that still works when the per-user fold itself is too wide (e.g.
pairwise overlap across hundreds of segments: sketches cost
O(segments·k), the exact plan O(users)).
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from approximate_quantiles_ray.sources.read import read_parquet_sized

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def _read_events(sf_dir: str):
    return read_parquet_sized(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )


def _flag_partials(tbl: pa.Table) -> pa.Table:
    """Per-user per-block partial: has_<type> ∈ {0,1} int64 (max-fold
    across blocks == OR; int64 so both fold paths keep one dtype)."""
    et = tbl.column("event_type")
    cols = {"user_id": tbl.column("user_id")}
    for t in EVENT_TYPES:
        cols[f"has_{t}"] = pc.cast(pc.equal(et, t), pa.int64())
    flags = pa.table(cols)
    agg = flags.group_by(["user_id"]).aggregate(
        [(f"has_{t}", "max") for t in EVENT_TYPES]
    )
    return agg.rename_columns(["user_id"] + [f"has_{t}" for t in EVENT_TYPES])


def _pair_sums_block(tbl: pa.Table) -> pa.Table:
    """One row of partial sums: per-type user counts + per-pair both
    counts, from folded per-user flag rows."""
    flags = np.column_stack(
        [tbl.column(f"has_{t}").to_numpy(zero_copy_only=False) for t in EVENT_TYPES]
    ).astype(np.int64)
    # gram matrix: diag = per-type counts, off-diag = pairwise overlap
    gram = flags.T @ flags
    out: dict[str, list] = {}
    for i, t in enumerate(EVENT_TYPES):
        out[f"n_{t}"] = [int(gram[i, i])]
    for i, j in combinations(range(len(EVENT_TYPES)), 2):
        out[f"both_{EVENT_TYPES[i]}_{EVENT_TYPES[j]}"] = [int(gram[i, j])]
    return pa.table({k: pa.array(v, pa.int64()) for k, v in out.items()})


def events_user_overlap(sf_dir: str) -> pd.DataFrame:
    """Exact pairwise distinct-user overlap between event types
    (oracle-matched vs a DuckDB distinct self-join). Zero-overlap pairs
    are dropped, matching the SQL inner join."""
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg_ds

    part = _read_events(sf_dir).map_batches(
        _flag_partials, batch_format="pyarrow", zero_copy_batch=True
    )
    spec = {f"has_{t}": "max" for t in EVENT_TYPES}
    folded, is_ds = adaptive_grouped_agg_ds(part, ["user_id"], spec)
    if is_ds:
        sums = (
            folded.map_batches(
                _pair_sums_block, batch_format="pyarrow", zero_copy_batch=True
            )
            .to_pandas()
            .sum()
        )
    else:
        sums = pd.Series(
            {
                c: int(v[0])
                for c, v in _pair_sums_block(
                    pa.Table.from_pandas(folded, preserve_index=False)
                ).to_pydict().items()
            }
        )
    rows = []
    for a, b in combinations(EVENT_TYPES, 2):
        both = int(sums[f"both_{a}_{b}"])
        if both == 0:
            continue
        rows.append(
            {
                "type_a": a,
                "type_b": b,
                "users_a": int(sums[f"n_{a}"]),
                "users_b": int(sums[f"n_{b}"]),
                "users_both": both,
            }
        )
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]).reset_index(drop=True)


def events_user_overlap_kmv(sf_dir: str, k: int = 4096, seed: int = 11) -> pd.DataFrame:
    """KMV-estimated pairwise overlap: five bottom-k sketches (one per
    event type) built in ONE shuffle-free pass, set expressions on the
    driver. Below k distinct users per type the estimates are exact
    (tests pin equality vs :func:`events_user_overlap` there; ε-bound
    tests cover the saturated regime)."""
    from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns
    from approximate_quantiles_ray.sketches.kmv import (
        KMV,
        intersection_estimate,
        jaccard_estimate,
        union_estimate,
    )

    def users_of(t: str):
        def extract(tbl: pa.Table):
            mask = pc.equal(tbl.column("event_type"), t)
            return tbl.filter(mask).column("user_id").combine_chunks()

        return extract

    specs = [
        SketchSpec(
            key=t,
            factory=lambda: KMV(k=k, seed=seed),
            transform=users_of(t),
            kind="hash",
            dedup_per_batch=False,
        )
        for t in EVENT_TYPES
    ]
    sketches = sketch_columns(_read_events(sf_dir), specs)
    rows = []
    for a, b in combinations(EVENT_TYPES, 2):
        sa, sb = sketches[a], sketches[b]
        rows.append(
            {
                "type_a": a,
                "type_b": b,
                "est_a": round(sa.estimate(), 2),
                "est_b": round(sb.estimate(), 2),
                "est_union": round(union_estimate(sa, sb), 2),
                "est_inter": round(intersection_estimate(sa, sb), 2),
                "est_jaccard": round(jaccard_estimate(sa, sb), 4),
            }
        )
    return pd.DataFrame(rows).sort_values(["type_a", "type_b"]).reset_index(drop=True)


ORACLE_SQL = {
    "events_user_overlap": """
WITH d AS (SELECT DISTINCT user_id, event_type FROM events),
     c AS (SELECT event_type, COUNT(*) AS n FROM d GROUP BY event_type)
SELECT a.event_type AS type_a,
       b.event_type AS type_b,
       ca.n AS users_a,
       cb.n AS users_b,
       COUNT(*) AS users_both
FROM d a
JOIN d b ON a.user_id = b.user_id AND a.event_type < b.event_type
JOIN c ca ON ca.event_type = a.event_type
JOIN c cb ON cb.event_type = b.event_type
GROUP BY 1, 2, ca.n, cb.n
ORDER BY 1, 2
""",
}

QUERIES = {
    "events_user_overlap": events_user_overlap,
    "events_user_overlap_kmv": events_user_overlap_kmv,
}
