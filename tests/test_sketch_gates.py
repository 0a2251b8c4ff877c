"""Oracle gates for the sketch queries (round-3 verdict item 1): every
gate's exact scalars must hash-match its DuckDB twin and every boolean
law must be TRUE — at multiple scales, mirroring the driver's compare
(sorted columns, value equality)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"

GATES = [
    "transcript_sketch_report",
    "transcript_role_len_sketch",
    "transcript_daily_text_len",
    "transcript_tool_hh_cms",
    "transcript_tool_hh_mg",
    "events_type_drift_sketch",
    "events_user_overlap_kmv",
    "docs_fingerprints",
    "events_value_ddsketch",
    "events_range_partition_stats",
    "lineitem_weighted_price_sketch",
    "embeddings_knn_ivf",
    "embeddings_knn_lsh",
    "embeddings_knn_pq",
    "embeddings_near_dups",
    "docs_minhash_clusters",
    "docs_simhash_pairs",
    "embeddings_cluster_label_profile",
    "embeddings_semantic_dedup",
    "media_features",
]


def _entry():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "_ray_entry_for_gates", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def entry(ray_session):
    return _entry()


@pytest.fixture(scope="module")
def oracle_con():
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "embeddings"):
        con.execute(
            f"create view {t} as select * from read_parquet('{SF}/{t}.parquet')"
        )
    return con


@pytest.fixture(scope="module")
def oracles(entry):
    # re-point the transcript-table oracles at the test scale (the
    # module-level oracle_sql() bakes in the driver's sf0.01)
    from approximate_quantiles_ray.pipelines import sketch_gates

    sqls = dict(entry.oracle_sql())
    sqls.update(sketch_gates.oracle_sql(SF))
    return sqls


@pytest.mark.parametrize("name", GATES)
def test_gate_matches_oracle(entry, oracle_con, oracles, name):
    got = entry.queries()[name](SF)
    want = oracle_con.sql(oracles[name]).df()
    g = got[sorted(got.columns)].reset_index(drop=True)
    w = want[sorted(want.columns)].reset_index(drop=True)
    assert list(g.columns) == list(w.columns)
    pd.testing.assert_frame_equal(g, w, check_dtype=False)
    bools = got.select_dtypes(bool)
    if len(bools.columns):
        assert bool(bools.all().all()), f"{name} law column went FALSE"


def test_no_oracle_set_is_bounded(entry):
    """The driver can only draw non-green rows from the no-oracle set;
    round-4 wave 3 pins it at ZERO — every queries() entry has an
    oracle_sql() twin, so a sampled sweep cannot draw a non-green row."""
    q, o = entry.queries(), entry.oracle_sql()
    no = sorted(set(q) - set(o))
    assert no == []


def test_rank_ok_step_semantics():
    """The step-widened sandwich: estimates interpolating inside the
    CDF step adjoining the tolerance window pass; estimates crossing a
    real mass point beyond ±tol fail."""
    import numpy as np

    from approximate_quantiles_ray.pipelines.sketch_gates import _rank_ok

    # 45% at 144, 13% at 160, 42% at 176 → p50 is 160
    vals = np.array([144, 160, 176], np.int64)
    cum = np.array([45, 58, 100], np.int64)
    assert _rank_ok(vals, cum, 160.0, 0.5)
    assert _rank_ok(vals, cum, 160.4, 0.5)  # inside the (160,176) step
    assert _rank_ok(vals, cum, 175.9, 0.5)  # still inside that step
    assert not _rank_ok(vals, cum, 176.0, 0.5)  # crossed the next mass point
    assert not _rank_ok(vals, cum, 143.0, 0.5)  # below the prior mass point
