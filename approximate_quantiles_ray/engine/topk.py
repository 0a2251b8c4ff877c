"""Approximate heavy hitters: count-min + per-block candidate harvest.

The scalable top-k pattern (SURVEY.md §2.6: "heavy-hitter estimation via
count-min + a small exact top-k verification"): one streaming pass where
each block emits (a) its local exact top-``candidates_per_block`` values
(vectorized value_counts) and (b) a count-min partial. The driver merges
the CMS states, unions the candidate sets (≪ distinct values), and ranks
candidates by their CMS estimate. Any global heavy hitter is a local
heavy hitter in at least one block for practical (non-adversarial)
distributions; widen ``candidates_per_block`` for more adversarial
splits. Estimates are CMS upper bounds (within εN with prob 1−δ).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from approximate_quantiles_ray.sketches.base import sketch_from_bytes
from approximate_quantiles_ray.sketches.countmin import CountMinSketch

_SCHEMA = pa.schema(
    [
        pa.field("kind", pa.int8()),  # 0 = candidate, 1 = cms state
        pa.field("value", pa.string()),
        pa.field("local_count", pa.int64()),
        pa.field("state", pa.binary()),
    ]
)


class _BlockTopK:
    def __init__(self, col: str, candidates_per_block: int, width: int, depth: int, seed: int):
        self.col = col
        self.c = candidates_per_block
        self.width = width
        self.depth = depth
        self.seed = seed

    def __call__(self, tbl: pa.Table) -> pa.Table:
        arr = tbl.column(self.col)
        if arr.null_count:
            arr = arr.drop_null()
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        cms = CountMinSketch(width=self.width, depth=self.depth, seed=self.seed)
        if len(arr):
            cms.update(arr)
            vc = arr.value_counts()
            vals = vc.field("values").to_numpy(zero_copy_only=False)
            cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
            top = np.argsort(-cnts, kind="stable")[: self.c]
            vals, cnts = vals[top], cnts[top]
        else:
            vals, cnts = np.zeros(0, object), np.zeros(0, np.int64)
        return pa.Table.from_arrays(
            [
                pa.array(
                    np.concatenate([np.zeros(len(vals), np.int8), [1]]), pa.int8()
                ),
                pa.array(np.concatenate([vals, [None]]), pa.string()),
                pa.array(np.concatenate([cnts, [0]]), pa.int64()),
                pa.array([None] * len(vals) + [cms.to_bytes()], pa.binary()),
            ],
            schema=_SCHEMA,
        )


def heavy_hitters(
    ds,
    col: str,
    k: int = 10,
    candidates_per_block: int = 64,
    width: int = 8192,
    depth: int = 5,
    seed: int = 42,
) -> pd.DataFrame:
    """Top-k values of ``col`` by estimated frequency → DataFrame
    (value, est_count), deterministically ordered (count desc, value)."""
    parts = ds.map_batches(
        _BlockTopK(col, candidates_per_block, width, depth, seed),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cms: CountMinSketch | None = None
    candidates: set[str] = set()
    for b in parts.iter_batches(batch_format="pyarrow"):
        kinds = b.column("kind").to_numpy(zero_copy_only=False)
        vals = b.column("value").to_pylist()
        for i in np.flatnonzero(kinds == 1):
            sk = sketch_from_bytes(b.column("state")[int(i)].as_py())
            cms = sk if cms is None else cms.merge(sk)
        candidates.update(v for i, v in enumerate(vals) if kinds[i] == 0 and v is not None)
    if cms is None or not candidates:
        return pd.DataFrame({"value": pd.Series(dtype=object), "est_count": pd.Series(dtype=np.int64)})
    cand = np.array(sorted(candidates), dtype=object)
    est = cms.estimate(cand).astype(np.int64)
    out = pd.DataFrame({"value": cand, "est_count": est})
    return (
        out.sort_values(["est_count", "value"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )


def grouped_top_rows(
    ds,
    group_col: str,
    value_col: str,
    tiebreak_col: str,
    k: int,
    extra_cols: list[str] | None = None,
) -> "pd.DataFrame":
    """Exact top-k ROWS per group (the ``ROW_NUMBER() OVER (PARTITION BY
    g ORDER BY v DESC, tie ASC) <= k`` family): each block reduces to
    its own per-group top-k (one lexsort + segmented rank mask — no
    per-group Python), so at most ``k × #groups`` rows leave any block;
    the driver applies the same selection to the concatenated partials.
    Deterministic under ties via ``tiebreak_col`` (must be unique per
    group). Values and tiebreaks must be integer-valued.

    Top-k-per-group is a monotone selection: a row in the global top-k
    of its group is necessarily in its block's top-k, so the partial
    reduction is lossless.
    """
    import pandas as pd

    cols = [group_col, value_col, tiebreak_col] + list(extra_cols or [])

    def block_topk(tbl: pa.Table) -> pa.Table:
        n = tbl.num_rows
        if n == 0:
            return tbl.select(cols)
        g = tbl.column(group_col).combine_chunks().to_numpy(zero_copy_only=False)
        v = tbl.column(value_col).combine_chunks().to_numpy(zero_copy_only=False)
        t = tbl.column(tiebreak_col).combine_chunks().to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -v, g))
        gs = g[order]
        change = np.ones(n, bool)
        change[1:] = gs[1:] != gs[:-1]
        seg_first = np.flatnonzero(change)
        seg_start = np.repeat(seg_first, np.diff(np.append(seg_first, n)))
        rank = np.arange(n) - seg_start
        take = order[rank < k]
        return tbl.select(cols).take(pa.array(take))

    part = ds.map_batches(block_topk, batch_format="pyarrow", zero_copy_batch=True)
    df = part.to_pandas()
    if not len(df):
        return df
    df = df.sort_values(
        [group_col, value_col, tiebreak_col], ascending=[True, False, True]
    ).reset_index(drop=True)
    rnk = df.groupby(group_col).cumcount() + 1
    out = df[rnk <= k].copy()
    out["rnk"] = rnk[rnk <= k].astype(np.int64)
    return out.reset_index(drop=True)
