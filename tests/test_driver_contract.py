"""Simulate the driver: run every queries() entry at sf0.001 and check
each oracle-backed one matches its DuckDB SQL (order-insensitive,
column-name-aligned) — the same comparison CORRECTNESS_r{N}.json uses.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def contract(ray_session):
    import __ray_entry__ as mod

    return mod


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _to_df(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df.reindex(cols, axis=1).sort_values(cols).reset_index(drop=True)
    return out


def test_entry_smoke(contract):
    df = _to_df(contract.entry())
    assert len(df) > 0
    assert set(df.columns) == {"metric", "value"}


def test_all_queries_run_and_oracles_match(contract, oracle_con):
    qs = contract.queries()
    sqls = contract.oracle_sql()
    assert qs, "queries() empty"
    # oracle SQL in the test runs against sf0.001 transcripts, not the
    # driver's sf0.01 — regenerate the SQL at this scale
    from approximate_quantiles_ray.pipelines import sketch_gates
    from approximate_quantiles_ray.pipelines import transcript_exact as te
    from approximate_quantiles_ray.pipelines import windows as w

    sqls.update(te.oracle_sql(SF_DIR))
    sqls.update(w.oracle_sql(SF_DIR))
    sqls.update(sketch_gates.oracle_sql(SF_DIR))
    for name, fn in qs.items():
        got = _to_df(fn(SF_DIR))
        assert len(got) >= 0, name
        if name not in sqls:
            continue
        exp = oracle_con.sql(sqls[name]).df()
        g, e = _norm(got), _norm(exp)
        assert list(g.columns) == list(e.columns), f"{name}: column names differ"
        assert len(g) == len(e), f"{name}: row counts differ"
        # DTYPE-STRICT: the driver's value hash is dtype-sensitive
        # (round 1: DuckDB SUM→HUGEINT→float64 vs engine int64 hashed
        # differently despite equal values). No coercion allowed here.
        assert [str(t) for t in g.dtypes] == [str(t) for t in e.dtypes], (
            f"{name}: dtypes differ — engine {dict(g.dtypes.astype(str))} "
            f"vs oracle {dict(e.dtypes.astype(str))}"
        )
        pd.testing.assert_frame_equal(g, e, check_exact=True, obj=name)


def test_broadcast_asof_join_semantics(ray_session):
    """Backward as-of: greatest build-ts <= probe-ts per key; left keeps
    unmatched probes with null build columns, inner drops them."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.broadcast import broadcast_asof_join

    probe = pa.table({"k": [1, 1, 2, 3], "ts": [10, 25, 7, 99]})
    build = pa.table({"k": [1, 1, 2], "vf": [5, 20, 9], "v": [100, 200, 300]})
    left = (
        broadcast_asof_join(rd.from_arrow(probe).repartition(2), build,
                            "k", "ts", "k", "vf", how="left")
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    assert left["v"].tolist()[:2] == [100, 200]      # k=1: ts=10→vf=5, ts=25→vf=20
    assert np.isnan(left["v"].iloc[2])               # k=2: ts=7 < vf=9 → miss
    assert np.isnan(left["v"].iloc[3])               # k=3: no build rows
    inner = broadcast_asof_join(rd.from_arrow(probe), build,
                                "k", "ts", "k", "vf", how="inner").to_pandas()
    assert sorted(inner["ts"]) == [10, 25]


def test_asof_left_join_preserves_int_dtype_per_block(ray_session):
    """Blocks with unmatched probes must keep integer build payloads as
    int64-with-nulls (Arrow), not upcast to float64 — per-block schema
    divergence broke downstream unification (round-2 ADVICE item 5)."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.broadcast import broadcast_asof_join

    probe = pa.table({"k": [1, 1, 2, 3], "ts": [10, 25, 7, 99]})
    build = pa.table({"k": [1, 1, 2], "vf": [5, 20, 9], "v": [100, 200, 300]})
    joined = broadcast_asof_join(
        rd.from_arrow(probe).repartition(4), build, "k", "ts", "k", "vf", how="left"
    )
    batches = list(joined.iter_batches(batch_format="pyarrow"))
    assert batches
    for b in batches:  # both matched and unmatched blocks: same schema
        assert b.schema.field("v").type == pa.int64()
        assert b.schema.field("vf").type == pa.int64()


def test_broadcast_range_join_semantics(ray_session):
    """Containment tag: interval cols nulled outside [start, end) on the
    left path; inner drops non-contained probes."""
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.broadcast import broadcast_range_join

    probe = pa.table({"k": [1, 1, 1, 2], "ts": [4, 10, 16, 3]})
    iv = pa.table({"k": [1, 1], "s": [5, 15], "e": [12, 20], "label": ["a", "b"]})
    out = (
        broadcast_range_join(rd.from_arrow(probe).repartition(2), iv,
                             "k", "ts", "k", "s", "e", how="left")
        .to_pandas().sort_values(["k", "ts"]).reset_index(drop=True)
    )
    # ts=4: before first interval → null; ts=10 ∈ [5,12) → a; ts=16 ∈ [15,20) → b
    assert out["label"].tolist() == [None, "a", "b", None]
    inner = broadcast_range_join(rd.from_arrow(probe), iv,
                                 "k", "ts", "k", "s", "e", how="inner").to_pandas()
    assert sorted(inner["ts"]) == [10, 16]


def test_broadcast_join_left_with_misses(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.broadcast import broadcast_join

    big = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]})).repartition(2)
    small = pa.table({"kk": [2, 4], "label": ["two", "four"]})
    out = (
        broadcast_join(big, small, "k", "kk", how="left")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert out["label"].tolist() == [None, "two", None, "four"]
    inner = broadcast_join(
        rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "x": [10, 20, 30, 40]})),
        small, "k", "kk", how="inner",
    ).to_pandas()
    assert sorted(inner["k"]) == [2, 4]


def test_broadcast_interval_join_matches_bruteforce(ray_session):
    """Randomized cross-validation: the multi-match interval join must
    emit exactly the (probe, interval) pairs a brute-force nested loop
    finds — overlapping intervals, string keys, multi-block probe."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.broadcast import broadcast_interval_join

    rng = np.random.default_rng(7)
    n_iv, n_probe = 60, 5000
    keys = np.array(["k0", "k1", "k2"], object)
    iv_key = keys[rng.integers(0, 3, n_iv)]
    starts = rng.integers(0, 1000, n_iv).astype(np.int64)
    lengths = rng.integers(1, 400, n_iv).astype(np.int64)  # heavy overlap
    intervals = pa.table(
        {
            "k": pa.array(iv_key, pa.string()),
            "s": pa.array(starts, pa.int64()),
            "e": pa.array(starts + lengths, pa.int64()),
            "iv_id": pa.array(np.arange(n_iv), pa.int64()),
        }
    )
    p_key = keys[rng.integers(0, 3, n_probe)]
    p_ts = rng.integers(-50, 1500, n_probe).astype(np.int64)
    probe = pa.table(
        {
            "k": pa.array(p_key, pa.string()),
            "ts": pa.array(p_ts, pa.int64()),
            "row_id": pa.array(np.arange(n_probe), pa.int64()),
        }
    )
    ds = rd.from_arrow(probe).repartition(4)
    got = (
        broadcast_interval_join(
            ds, intervals.rename_columns(["kk", "s", "e", "iv_id"]),
            left_ts="ts", start_col="s", end_col="e",
            left_key="k", right_key="kk", how="inner",
        )
        .to_pandas()
        .sort_values(["row_id", "iv_id"])
        .reset_index(drop=True)
    )
    want = []
    for r in range(n_probe):
        for i in range(n_iv):
            if iv_key[i] == p_key[r] and starts[i] <= p_ts[r] < starts[i] + lengths[i]:
                want.append((r, i))
    got_pairs = list(zip(got["row_id"], got["iv_id"]))
    assert got_pairs == sorted(want)
    # left join: every probe appears; unmatched rows carry null interval cols
    left = broadcast_interval_join(
        ds, intervals.rename_columns(["kk", "s", "e", "iv_id"]),
        left_ts="ts", start_col="s", end_col="e",
        left_key="k", right_key="kk", how="left",
    ).to_pandas()
    matched_rows = {r for r, _ in want}
    assert len(left) == len(want) + (n_probe - len(matched_rows))
    assert left[left["iv_id"].isna()]["row_id"].nunique() == n_probe - len(matched_rows)


def test_broadcast_interval_join_global_key_and_empty(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from approximate_quantiles_ray.engine.broadcast import broadcast_interval_join

    probe = pa.table({"ts": pa.array([5, 15, 25], pa.int64())})
    iv = pa.table(
        {
            "s": pa.array([0, 10, 0], pa.int64()),
            "e": pa.array([20, 30, 30], pa.int64()),
            "iv_id": pa.array([0, 1, 2], pa.int64()),
        }
    )
    ds = rd.from_arrow(probe)
    got = broadcast_interval_join(
        ds, iv, left_ts="ts", start_col="s", end_col="e", how="inner"
    ).to_pandas()
    pairs = sorted(zip(got["ts"], got["iv_id"]))
    assert pairs == [(5, 0), (5, 2), (15, 0), (15, 1), (15, 2), (25, 1), (25, 2)]
    # empty build side: inner drops everything, left keeps probes with nulls
    empty = iv.slice(0, 0)
    inner = broadcast_interval_join(
        ds, empty, left_ts="ts", start_col="s", end_col="e", how="inner"
    ).to_pandas()
    assert len(inner) == 0
    left = broadcast_interval_join(
        ds, empty, left_ts="ts", start_col="s", end_col="e", how="left"
    ).to_pandas()
    assert len(left) == 3 and left["iv_id"].isna().all()
