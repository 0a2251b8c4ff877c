"""Audience-overlap pipelines: the exact bitmask plan vs DuckDB, the
KMV twin's exact agreement below saturation, and the MG heavy-hitter
query's sandwich bound vs exact tool counts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from approximate_quantiles_ray.pipelines import overlap

SF_DIR = "/root/testdata/sf0.001"


def test_exact_overlap_matches_duckdb(ray_session):
    got = overlap.events_user_overlap(SF_DIR)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    exp = con.sql(overlap.ORACLE_SQL["events_user_overlap"]).df()
    pd.testing.assert_frame_equal(got, exp, check_exact=True)


def test_kmv_overlap_exact_below_saturation(ray_session):
    """sf0.001 has ~15 users ≪ k → every KMV is unsaturated, so every
    estimate must equal the exact answer bit-for-bit."""
    ex = overlap.events_user_overlap(SF_DIR).set_index(["type_a", "type_b"])
    km = overlap.events_user_overlap_kmv(SF_DIR).set_index(["type_a", "type_b"])
    for idx, row in km.iterrows():
        e = ex.loc[idx]
        assert row["est_a"] == float(e["users_a"])
        assert row["est_b"] == float(e["users_b"])
        assert row["est_inter"] == float(e["users_both"])
        union = e["users_a"] + e["users_b"] - e["users_both"]
        assert row["est_union"] == float(union)
        assert row["est_jaccard"] == round(e["users_both"] / union, 4)


def test_kmv_overlap_saturated_synthetic(ray_session, tmp_path):
    """Planted overlap far above k: estimates within the 1/sqrt(k)
    band, through the full Ray partial/merge path."""
    import pyarrow as pa
    import ray.data as rd

    rng = np.random.default_rng(13)
    n = 60_000
    a_users = np.arange(n)
    b_users = np.arange(n // 2, n + n // 2)  # 50% overlap with a
    tbl = pa.table(
        {
            "user_id": np.concatenate([a_users, b_users]),
            "event_type": ["click"] * n + ["view"] * n,
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = overlap.events_user_overlap_kmv(str(tmp_path), k=2048).set_index(
        ["type_a", "type_b"]
    )
    row = out.loc[("click", "view")]
    tol = 6 / np.sqrt(2048)
    assert abs(row["est_a"] - n) / n < tol
    assert abs(row["est_inter"] - n / 2) / (n / 2) < 3 * tol
    assert abs(row["est_union"] - 1.5 * n) / (1.5 * n) < tol
    # exact plan on the same table agrees with ground truth exactly
    ex = overlap.events_user_overlap(str(tmp_path)).set_index(["type_a", "type_b"])
    assert int(ex.loc[("click", "view")]["users_both"]) == n // 2


def test_mg_tool_heavy_hitters_sandwich(ray_session):
    """The MG gate's sandwich law against an independent pandas count:
    the gate emits exact candidate counts + a sandwich_ok boolean
    (est <= true <= upper verified in-query); re-verify the exact
    counts and the law from raw parquet here."""
    from approximate_quantiles_ray.pipelines import transcript_exact as te
    from approximate_quantiles_ray.pipelines.sketch_gates import (
        transcript_tool_hh_mg_gate,
    )

    got = transcript_tool_hh_mg_gate(SF_DIR)
    tools = pq.read_table(te.transcripts_dir_for(SF_DIR), columns=["tool"])
    true = pd.Series(tools.column("tool").to_pylist()).value_counts()
    assert len(got) == 10
    assert got["sandwich_ok"].all()
    for _, row in got.iterrows():
        assert int(true.get(row["tool"], 0)) == row["n_uses"], row["tool"]
