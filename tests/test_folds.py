"""Adaptive grouped folds: the pandas driver fold (under cap) and the
Ray distributed fold (cap=0 forces it) must produce identical results."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


@pytest.fixture(scope="module")
def part_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(11)
    n = 5_000
    tbl = pa.table(
        {
            "g": rng.choice(["a", "b", "c"], n),
            "u": rng.integers(0, 40, n),
            "n_rows": rng.integers(1, 5, n),
            "vmin": rng.standard_normal(n),
            "vmax": rng.standard_normal(n),
        }
    )
    return rd.from_arrow(tbl).repartition(6)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns[:2])).reset_index(drop=True)


def test_adaptive_grouped_agg_paths_agree(part_ds):
    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    spec = {"n_rows": "sum", "vmin": "min", "vmax": "max"}
    small = _norm(adaptive_grouped_agg(part_ds, ["g", "u"], spec))
    big = _norm(adaptive_grouped_agg(part_ds, ["g", "u"], spec, cap=0))
    pd.testing.assert_frame_equal(
        small, big.astype({c: small[c].dtype for c in small.columns})
    )
    # cross-check vs plain pandas over the raw rows
    raw = part_ds.to_pandas()
    exp = _norm(raw.groupby(["g", "u"], as_index=False).agg(spec))
    pd.testing.assert_frame_equal(small[exp.columns], exp)


def test_adaptive_distinct_stats_paths_agree(part_ds):
    from approximate_quantiles_ray.engine.folds import adaptive_distinct_stats

    spec = {"n_rows": "sum", "vmin": "min", "vmax": "max"}
    small = adaptive_distinct_stats(part_ds, ["g"], "u", spec).sort_values("g").reset_index(drop=True)
    big = adaptive_distinct_stats(part_ds, ["g"], "u", spec, cap=0).sort_values("g").reset_index(drop=True)
    pd.testing.assert_frame_equal(small, big.astype({c: small[c].dtype for c in small.columns}))
    raw = part_ds.to_pandas()
    exp_distinct = raw.groupby("g")["u"].nunique()
    assert small.set_index("g")["n_distinct"].to_dict() == exp_distinct.to_dict()
    exp_sum = raw.groupby("g")["n_rows"].sum()
    assert small.set_index("g")["n_rows"].to_dict() == exp_sum.to_dict()
