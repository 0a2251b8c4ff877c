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


def test_count_all_semantics_with_null_values(ray_session):
    """Per-block partials must use COUNT(*) semantics: rows whose value
    column is NULL still count (the DuckDB oracles use COUNT(*))."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.folds import adaptive_distinct_stats

    tbl = pa.table(
        {
            "event_type": ["a", "a", "a", "b"],
            "user_id": [1, 1, 2, 3],
            "value": pa.array([1.0, None, 2.0, None], pa.float64()),
        }
    )
    ds = rd.from_arrow(tbl)

    def block_partials(t: pa.Table) -> pa.Table:
        agg = t.group_by(["event_type", "user_id"]).aggregate(
            [([], "count_all"), ("value", "min"), ("value", "max")]
        )
        return agg.rename_columns(["event_type", "user_id", "n_events", "value_min", "value_max"])

    part = ds.map_batches(block_partials, batch_format="pyarrow", zero_copy_batch=True)
    out = adaptive_distinct_stats(
        part, ["event_type"], "user_id", {"n_events": "sum", "value_min": "min", "value_max": "max"}
    ).set_index("event_type")
    assert out.loc["a", "n_events"] == 3  # the NULL-value row counts
    assert out.loc["b", "n_events"] == 1
    assert out.loc["a", "n_distinct"] == 2


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


def test_over_cap_fold_preserves_us_timestamps(ray_session):
    """The over-cap Ray-groupby path must not round µs timestamps
    through coarser precision (round-2 ADVICE item 2): sub-second MIN
    anchors survive the distributed fold bit-exactly."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.folds import (
        adaptive_distinct_stats,
        adaptive_grouped_agg,
    )

    ticks = [1_000_000_123_456, 1_000_000_123_457, 2_000_000_999_999]
    part = pa.table(
        {
            "k": pa.array([1, 1, 2], pa.int64()),
            "d": pa.array([10, 11, 12], pa.int64()),
            "ts_min": pa.array(ticks, pa.int64()).cast(pa.timestamp("us")),
        }
    )
    out = adaptive_grouped_agg(
        rd.from_arrow(part).repartition(2), ["k"], {"ts_min": "min"}, cap=0
    ).sort_values("k")
    assert str(out["ts_min"].dtype) == "datetime64[us]"
    assert out["ts_min"].astype("int64").tolist() == [1_000_000_123_456, 2_000_000_999_999]

    ds_out = adaptive_distinct_stats(
        rd.from_arrow(part).repartition(2), ["k"], "d", {"ts_min": "min"}, cap=0
    ).sort_values("k")
    assert ds_out["ts_min"].astype("int64").tolist() == [1_000_000_123_456, 2_000_000_999_999]
    assert ds_out["n_distinct"].tolist() == [2, 1]


def test_grouped_min_max_with_nan_partials_both_paths(ray_session):
    """NaN partials (a block whose group had no valid values) must not
    poison cross-block MIN/MAX on either fold path — pandas skips NaN;
    the distributed path must agree."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.folds import adaptive_grouped_agg

    part = pa.table(
        {
            "k": pa.array(["a", "a", "b", "b"]),
            "v_min": pa.array([np.nan, 2.0, np.nan, np.nan], pa.float64()),
            "v_max": pa.array([np.nan, 2.0, np.nan, np.nan], pa.float64()),
        }
    )
    ds = rd.from_arrow(part).repartition(4)
    fast = adaptive_grouped_agg(ds, ["k"], {"v_min": "min", "v_max": "max"})
    slow = adaptive_grouped_agg(ds, ["k"], {"v_min": "min", "v_max": "max"}, cap=0)
    fast = fast.sort_values("k").reset_index(drop=True)
    slow = slow.sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, slow)
    a = fast[fast["k"] == "a"].iloc[0]
    assert a["v_min"] == 2.0 and a["v_max"] == 2.0
    assert np.isnan(fast[fast["k"] == "b"].iloc[0]["v_min"])
