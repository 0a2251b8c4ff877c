"""Planted-data tests for the wave-3 relational operators: funnel
drop-off / tie semantics, NTILE boundary splitting, mode tie-breaks —
the cases the uniform synthetic testdata does not exercise (there,
every user completes the funnel)."""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.pipelines import relational as rel


def _write_events(tmp_path, rows):
    """rows: list of (event_id, user_id, event_type, ts_us, value)."""
    eid, uid, ty, ts, val = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(eid, pa.int64()),
            "ts": pa.array(list(ts), pa.timestamp("us")),
            "user_id": pa.array(uid, pa.int64()),
            "event_type": pa.array(ty, pa.string()),
            "value": pa.array(val, pa.float64()),
            "props": pa.array(['{"k": 1}'] * len(eid), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    return str(tmp_path)


FUNNEL_ROWS = [
    # user 1: full funnel, strictly ordered
    (1, 1, "view", 1_000_000, 1.0),
    (2, 1, "click", 2_000_000, 1.0),
    (3, 1, "purchase", 3_000_000, 1.0),
    # user 2: click BEFORE its only view — must not count as clicked
    (4, 2, "click", 1_000_000, 1.0),
    (5, 2, "view", 2_000_000, 1.0),
    # user 3: click at the SAME ts as the view (>= semantics: counts),
    # purchase BEFORE the click (does not count)
    (6, 3, "view", 5_000_000, 1.0),
    (7, 3, "click", 5_000_000, 1.0),
    (8, 3, "purchase", 4_000_000, 1.0),
    # user 4: purchase at the SAME ts as the qualifying click (counts)
    (9, 4, "view", 1_000_000, 1.0),
    (10, 4, "click", 6_000_000, 1.0),
    (11, 4, "purchase", 6_000_000, 1.0),
    # user 5: purchase only — no view, nothing downstream
    (12, 5, "purchase", 1_000_000, 1.0),
]


def test_funnel_dropoff_and_ties(ray_session, tmp_path):
    sf_dir = _write_events(tmp_path, FUNNEL_ROWS)
    out = rel.events_funnel_counts(sf_dir)
    assert out.iloc[0].to_dict() == {
        "n_users": 5,
        "n_viewed": 4,  # users 1,2,3,4
        "n_clicked_after_view": 3,  # users 1,3(tie),4
        "n_purchased_after_click": 2,  # users 1,4(tie)
    }
    # independent DuckDB check of the same semantics on the same rows
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.sql(rel.ORACLE_SQL["events_funnel_counts"]).df()
    pd.testing.assert_frame_equal(out, exp, check_exact=True)


def test_funnel_bucket_partition_independence(ray_session, tmp_path):
    """The funnel answer must not depend on the bucket count (users
    are hash-routed whole, so any bucketing gives the same result)."""
    from approximate_quantiles_ray.sources.bucketed import bucket_dirs, ensure_bucketed

    sf_dir = _write_events(tmp_path, FUNNEL_ROWS)
    a = rel.events_funnel_counts(sf_dir)
    root = ensure_bucketed(f"{sf_dir}/events.parquet", key="user_id", n_buckets=3)
    assert len(bucket_dirs(root)) >= 1
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    part = rd.from_items([{"path": d} for d in bucket_dirs(root)]).map_batches(
        worker_cached_stage(rel._BucketFunnel), batch_format="pyarrow", batch_size=1
    )
    b = part.to_pandas().sum(axis=0)
    assert a.iloc[0].to_dict() == {k: int(v) for k, v in b.items()}


def test_ntile_boundary_splitting(ray_session, tmp_path):
    """n % tiles != 0 and a duplicate-value run straddling a tile
    boundary: the histogram walk must split the run by rank arithmetic
    exactly as NTILE does."""
    # 10 rows, 4 tiles → sizes 3,3,2,2; value 5.0 repeated 6× straddles
    # tiles 1-3
    vals = [1.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 9.0, 9.0, 20.0]
    rows = [(i + 1, 1, "view", (i + 1) * 1_000_000, v) for i, v in enumerate(vals)]
    sf_dir = _write_events(tmp_path, rows)
    out = rel.events_value_ntiles(sf_dir)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.sql(rel.ORACLE_SQL["events_value_ntiles"]).df()
    g = out.sort_values("tile").reset_index(drop=True)
    e = exp.sort_values("tile").reset_index(drop=True)
    pd.testing.assert_frame_equal(g, e, check_exact=True)
    assert g["n"].tolist() == [3, 3, 2, 2]
    assert g["cents_max"].tolist()[0] == 500  # tile 1 ends inside the 5.0 run
    assert g["cents_min"].tolist()[2] == 500  # tile 3 starts inside it


def test_props_mode_tiebreak(ray_session, tmp_path):
    """Equal counts must break toward the SMALLER k (count desc, k asc)."""
    rows = []
    eid = 1
    for k, n in ((7, 3), (2, 3), (9, 1)):
        for _ in range(n):
            rows.append((eid, 1, "view", eid * 1_000_000, 1.0, k))
            eid += 1
    eids, uids, tys, tss, vs, ks = zip(*rows)
    tbl = pa.table(
        {
            "event_id": pa.array(eids, pa.int64()),
            "ts": pa.array(list(tss), pa.timestamp("us")),
            "user_id": pa.array(uids, pa.int64()),
            "event_type": pa.array(tys, pa.string()),
            "value": pa.array(vs, pa.float64()),
            "props": pa.array([f'{{"k": {k}}}' for k in ks], pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    out = rel.events_props_mode(str(tmp_path))
    assert out.iloc[0]["mode_k"] == 2 and out.iloc[0]["mode_n"] == 3


def test_decontaminate_planted_leak(ray_session, tmp_path):
    """A scan doc that copies a 5-word run from a benchmark doc must be
    flagged; disjoint docs must not. bench = doc_id % 50 == 0."""
    from approximate_quantiles_ray.pipelines.dedup import docs_decontaminate

    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    leaked = "xx yy alpha beta gamma delta epsilon zz"  # shares one 5-gram
    clean = "one two three four five six seven eight nine"
    tbl = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),  # 0 is benchmark
            "text": pa.array([bench_text, leaked, clean]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s1", "s1", "s2"]),
            "n_chars": pa.array([len(bench_text), len(leaked), len(clean)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = docs_decontaminate(str(tmp_path))
    r = out.set_index("source")
    assert int(r.loc["s1", "n_contaminated"]) == 1
    assert int(r.loc["s1", "hit_grams"]) == 1
    assert int(r.loc["s2", "n_contaminated"]) == 0
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    from approximate_quantiles_ray.pipelines.dedup import ORACLE_SQL

    exp = con.sql(ORACLE_SQL["docs_decontaminate"]).df()
    pd.testing.assert_frame_equal(
        out.sort_values("source").reset_index(drop=True),
        exp.sort_values("source").reset_index(drop=True),
        check_exact=True,
    )


def test_repetition_planted_highdup(ray_session, tmp_path):
    """A looping doc (one trigram repeated) must cross the 20% dup
    threshold; a all-distinct doc must not; a 2-word doc contributes
    zero trigrams without crashing the LEFT JOIN path."""
    from approximate_quantiles_ray.pipelines.textstats import (
        ORACLE_SQL as TX_SQL,
        docs_repetition_stats,
    )

    looping = " ".join(["spam ham eggs"] * 10)  # 28 trigrams, 5 distinct
    diverse = "a b c d e f g h i j k l m n o p"
    tiny = "just two"
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([looping, diverse, tiny]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s1", "s1", "s2"]),
            "n_chars": pa.array([len(looping), len(diverse), len(tiny)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = docs_repetition_stats(str(tmp_path))
    r = out.set_index("source")
    assert int(r.loc["s1", "n_highdup"]) == 1
    assert int(r.loc["s2", "n_highdup"]) == 0
    assert int(r.loc["s2", "tri_total"]) == 0
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.sql(TX_SQL["docs_repetition_stats"]).df()
    pd.testing.assert_frame_equal(
        out.sort_values("source").reset_index(drop=True),
        exp.sort_values("source").reset_index(drop=True),
        check_exact=True,
    )


def test_attribution_ties_and_window_edge(ray_session, tmp_path):
    """Click at exactly the purchase ts attributes (<= semantics, both
    sides); click exactly window-width before attributes; one µs older
    does not; clicks from OTHER users never do."""
    H = 3_600_000_000  # 1h in µs
    rows = [
        # user 1: click at purchase ts (tie) → attributed
        (1, 1, "click", 10 * H, 1.0),
        (2, 1, "purchase", 10 * H, 2.0),
        # user 2: click exactly 1h before → attributed
        (3, 2, "click", 5 * H, 1.0),
        (4, 2, "purchase", 6 * H, 3.0),
        # user 3: click 1h + 1µs before → NOT attributed
        (5, 3, "click", 5 * H - 1, 1.0),
        (6, 3, "purchase", 6 * H, 4.0),
        # user 4: no own clicks; user 3's click must not leak
        (7, 4, "purchase", 6 * H, 5.0),
        # user 5: two clicks inside window → latest wins, still 1 purchase
        (8, 5, "click", 7 * H, 1.0),
        (9, 5, "click", 7 * H + 5, 1.0),
        (10, 5, "purchase", 7 * H + 10, 6.0),
    ]
    sf_dir = _write_events(tmp_path, rows)
    out = rel.events_click_attribution(sf_dir)
    r = out.set_index("user_id")
    assert r.loc[1, "n_attributed"] == 1 and r.loc[1, "attributed_cents"] == 200
    assert r.loc[2, "n_attributed"] == 1 and r.loc[2, "attributed_cents"] == 300
    assert r.loc[3, "n_attributed"] == 0 and r.loc[3, "attributed_cents"] == 0
    assert r.loc[4, "n_attributed"] == 0
    assert r.loc[5, "n_attributed"] == 1 and r.loc[5, "attributed_cents"] == 600
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.sql(rel.ORACLE_SQL["events_click_attribution"]).df()
    pd.testing.assert_frame_equal(out, exp, check_exact=True)


def test_commonness_rare_and_empty_doc(ray_session, tmp_path):
    """Rare tokens (global count < 5) are counted; a token-less doc
    yields NO row (the SQL inner join drops it); sums are exact ints."""
    from approximate_quantiles_ray.pipelines.textstats import (
        ORACLE_SQL as TX_SQL,
        docs_commonness_scores,
    )

    common = "the the the the the cat"     # 'the' appears 5x here (+1 below)
    rare = "the zyxwvut qqqxyz"            # two singleton tokens
    empty = "1234 5678 !!!"                # no [a-z] tokens at all
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([common, rare, empty]),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["s1"] * 3),
            "n_chars": pa.array([len(common), len(rare), len(empty)], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    out = docs_commonness_scores(str(tmp_path))
    assert out["doc_id"].tolist() == [1, 2]  # doc 3 dropped
    r = out.set_index("doc_id")
    # doc 1: 'the'x5 (global 6) + 'cat' (global 1) → 5*6 + 1 = 31
    assert r.loc[1, "n_tokens"] == 6 and r.loc[1, "commonness_sum"] == 31
    assert r.loc[1, "n_rare"] == 1  # 'cat' is a global singleton
    # doc 2: 'the' (6) + two singletons → 8; rare = 2
    assert r.loc[2, "commonness_sum"] == 8 and r.loc[2, "n_rare"] == 2
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    exp = con.sql(TX_SQL["docs_commonness_scores"]).df()
    pd.testing.assert_frame_equal(out, exp, check_exact=True)


def test_bloom_join_prefilters_and_stays_exact(ray_session):
    """The Bloom runtime filter must discard most non-matching rows
    (pass-through within ~2% of the true match rate at fp=1%) while the
    final aggregate stays bit-exact vs the plain SQL join."""
    sf = "/root/testdata/sf0.001"
    out = rel.urgent_revenue_bloom_join(sf)
    st = rel.urgent_revenue_bloom_join.last_stats
    assert st["n_items"] <= st["bloom_pass"] < st["scanned"]  # no false negatives
    fp_rate = (st["bloom_pass"] - st["n_items"]) / max(1, st["scanned"] - st["n_items"])
    assert fp_rate < 0.02
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    exp = con.sql(rel.ORACLE_SQL["urgent_revenue_bloom_join"]).df()
    pd.testing.assert_frame_equal(out, exp, check_exact=True)


def test_running_total_negative_values(ray_session, tmp_path):
    """Negative cents must not break the per-user cumsum restart (the
    segment-prefix subtraction is sign-agnostic)."""
    rows = [
        (1, 1, "view", 1_000_000, -5.0),
        (2, 1, "view", 2_000_000, 3.0),
        (3, 2, "view", 1_500_000, -2.0),
        (4, 2, "view", 3_000_000, -1.0),
        (5, 1, "view", 4_000_000, -10.0),
    ]
    sf_dir = _write_events(tmp_path, rows)
    out = rel.events_user_running_total(sf_dir).set_index("event_id")
    assert out.loc[1, "running_cents"] == -500
    assert out.loc[2, "running_cents"] == -200
    assert out.loc[5, "running_cents"] == -1200
    assert out.loc[3, "running_cents"] == -200
    assert out.loc[4, "running_cents"] == -300
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf_dir}/events.parquet')"
    )
    exp = con.sql(rel.ORACLE_SQL["events_user_running_total"]).df()
    pd.testing.assert_frame_equal(
        out.reset_index(), exp, check_exact=True
    )


def test_trimmed_mean_planted(ray_session, tmp_path, monkeypatch):
    """Outliers outside the trim band must not move the mean; brute
    force numpy reference; forced over-cap fold path agrees."""
    import numpy as np

    import approximate_quantiles_ray.engine.folds as folds
    from approximate_quantiles_ray.pipelines.relational import events_value_trimmed_mean

    rng = np.random.default_rng(21)
    vals = np.round(rng.uniform(10, 20, 90), 2)
    vals = np.concatenate([vals, [0.01] * 5, [9999.99] * 5])  # 10% outliers split
    rng.shuffle(vals)
    rows = [
        (i, i, "t", 1_700_000_000_000_000 + i, float(v)) for i, v in enumerate(vals)
    ]
    _write_events(tmp_path, rows)
    out = events_value_trimmed_mean(str(tmp_path))

    cents = np.sort(np.round(vals * 100).astype(np.int64))
    n = len(cents)
    lo, hi = (10 * n) // 100, n - (10 * n) // 100
    expect = float(cents[lo:hi].sum()) / (hi - lo) / 100.0
    assert out["trimmed_mean"].iloc[0] == expect
    assert out["n"].iloc[0] == n and out["kept"].iloc[0] == hi - lo
    # the planted outliers are fully trimmed: mean stays in the body band
    assert 10 <= out["trimmed_mean"].iloc[0] <= 20

    orig = folds.adaptive_grouped_agg

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg", force_ds)
    out2 = events_value_trimmed_mean(str(tmp_path))
    assert out2["trimmed_mean"].iloc[0] == expect


def test_gini_known_distributions(ray_session, tmp_path, monkeypatch):
    """Gini laws: all-equal -> 0; extreme one-holder concentration ->
    (n-1)/n; matches the brute-force rank formula on random data;
    over-cap fold path agrees."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    import approximate_quantiles_ray.engine.folds as folds
    from approximate_quantiles_ray.pipelines.relational import orders_price_gini

    def write_orders(dirname, prices):
        d = tmp_path / dirname
        d.mkdir()
        pq.write_table(
            pa.table({"o_totalprice": pa.array(prices, pa.float64())}),
            d / "orders.parquet",
        )
        return str(d)

    # all equal -> 0.0 exactly
    out = orders_price_gini(write_orders("eq", [10.0] * 50))
    assert out["gini"].iloc[0] == 0.0

    # one holder owns everything (others epsilon-free: zero allowed)
    n = 100
    out = orders_price_gini(write_orders("conc", [0.0] * (n - 1) + [500.0]))
    assert abs(out["gini"].iloc[0] - (n - 1) / n) < 1e-12

    # brute force on random data
    rng = np.random.default_rng(5)
    prices = np.round(rng.lognormal(4.0, 1.0, 400), 2)
    d = write_orders("rand", list(prices))
    out = orders_price_gini(d)
    cents = np.sort(np.round(prices * 100).astype(np.int64))
    i = np.arange(1, len(cents) + 1, dtype=np.int64)
    expect = float(2 * int((i * cents).sum())) / float(len(cents) * int(cents.sum())) - float(
        len(cents) + 1
    ) / float(len(cents))
    assert out["gini"].iloc[0] == expect

    orig = folds.adaptive_grouped_agg

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg", force_ds)
    assert orders_price_gini(d)["gini"].iloc[0] == expect


def test_ks_statistic_laws(ray_session, tmp_path, monkeypatch):
    """KS laws: identical samples -> 0, disjoint supports -> 1,
    brute-force two-sample reference on random data; over-cap agrees."""
    import numpy as np

    import approximate_quantiles_ray.engine.folds as folds
    from approximate_quantiles_ray.pipelines.relational import events_ks_statistic

    def write(dirname, vals_a, vals_b):
        rows = []
        i = 0
        for v in vals_a:
            rows.append((i, i, "click", 1_700_000_000_000_000 + i, float(v)))
            i += 1
        for v in vals_b:
            rows.append((i, i, "purchase", 1_700_000_000_000_000 + i, float(v)))
            i += 1
        d = tmp_path / dirname
        d.mkdir()
        _write_events(d, rows)
        return str(d)

    same = np.round(np.linspace(1, 50, 80), 2)
    out = events_ks_statistic(write("same", same, same))
    assert out["ks"].iloc[0] == 0.0

    out = events_ks_statistic(write("disj", [1.0, 2.0, 3.0], [10.0, 11.0]))
    assert out["ks"].iloc[0] == 1.0

    rng = np.random.default_rng(7)
    a = np.round(rng.normal(10, 2, 300), 2)
    b = np.round(rng.normal(11, 3, 250), 2)
    d = write("rand", a, b)
    out = events_ks_statistic(d)
    # brute force: max CDF gap over the union of values
    union = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), union, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), union, side="right") / len(b)
    assert abs(out["ks"].iloc[0] - np.abs(fa - fb).max()) < 1e-12

    orig = folds.adaptive_grouped_agg

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg", force_ds)
    assert events_ks_statistic(d)["ks"].iloc[0] == out["ks"].iloc[0]


def test_wasserstein_laws(ray_session, tmp_path, monkeypatch):
    """W1 laws: identical -> 0; point masses at distance d -> d;
    matches scipy-free brute force (mean |sorted_a - sorted_b| for
    equal sizes); over-cap agrees."""
    import numpy as np

    import approximate_quantiles_ray.engine.folds as folds
    from approximate_quantiles_ray.pipelines.relational import events_wasserstein_value

    def write(dirname, vals_a, vals_b):
        rows = []
        i = 0
        for v in vals_a:
            rows.append((i, i, "click", 1_700_000_000_000_000 + i, float(v)))
            i += 1
        for v in vals_b:
            rows.append((i, i, "purchase", 1_700_000_000_000_000 + i, float(v)))
            i += 1
        d = tmp_path / dirname
        d.mkdir()
        _write_events(d, rows)
        return str(d)

    same = np.round(np.linspace(1, 50, 60), 2)
    assert events_wasserstein_value(write("same", same, same))["w1"].iloc[0] == 0.0

    out = events_wasserstein_value(write("pts", [5.0] * 10, [12.5] * 7))
    assert out["w1"].iloc[0] == 7.5

    rng = np.random.default_rng(11)
    a = np.round(rng.normal(20, 4, 256), 2)
    b = np.round(rng.normal(23, 5, 256), 2)
    d = write("rand", a, b)
    out = events_wasserstein_value(d)
    # equal sample sizes: W1 = mean |sorted_a - sorted_b|
    expect = float(np.abs(np.sort(a) - np.sort(b)).mean())
    assert abs(out["w1"].iloc[0] - expect) < 1e-9

    orig = folds.adaptive_grouped_agg

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg", force_ds)
    assert events_wasserstein_value(d)["w1"].iloc[0] == out["w1"].iloc[0]


def test_ks_matrix_consistent_with_single_pair(ray_session):
    """The one-fold pairwise matrix must reproduce the dedicated
    single-pair query for (click, purchase)."""
    from approximate_quantiles_ray.pipelines.drift import events_type_ks_matrix
    from approximate_quantiles_ray.pipelines.relational import events_ks_statistic

    sf = "/root/testdata/sf0.001"
    mat = events_type_ks_matrix(sf)
    row = mat[(mat["type_a"] == "click") & (mat["type_b"] == "purchase")].iloc[0]
    single = events_ks_statistic(sf).iloc[0]
    assert row["ks_num"] == single["ks_num"]
    assert row["ks"] == single["ks"]


def test_winsorized_mean_planted(ray_session, tmp_path):
    """Outliers are clamped to the cut values, not dropped: the
    winsorized mean sits between trimmed mean and raw mean; matches the
    brute-force clamp."""
    import numpy as np

    from approximate_quantiles_ray.pipelines.relational import (
        events_value_trimmed_mean,
        events_value_winsorized_mean,
    )

    rng = np.random.default_rng(29)
    vals = np.round(rng.uniform(10, 20, 90), 2)
    vals = np.concatenate([vals, [0.01] * 5, [9999.99] * 5])
    rng.shuffle(vals)
    rows = [(i, i, "t", 1_700_000_000_000_000 + i, float(v)) for i, v in enumerate(vals)]
    _write_events(tmp_path, rows)
    out = events_value_winsorized_mean(str(tmp_path))

    import math

    cents = np.sort(np.round(vals * 100).astype(np.int64))
    n = len(cents)
    lo_v = cents[max(0, math.ceil(0.10 * n) - 1)]
    hi_v = cents[max(0, math.ceil(0.90 * n) - 1)]
    expect = float(np.clip(cents, lo_v, hi_v).sum()) / n / 100.0
    assert out["winsorized_mean"].iloc[0] == expect
    assert out["lo_cut"].iloc[0] == lo_v and out["hi_cut"].iloc[0] == hi_v
    trimmed = events_value_trimmed_mean(str(tmp_path))["trimmed_mean"].iloc[0]
    raw = vals.mean()
    assert trimmed <= out["winsorized_mean"].iloc[0] <= raw


def test_sketch_drift_tracks_exact(ray_session):
    """The DDSketch drift path must land near the exact statistics:
    KS within one bucket's mass worth of rank, W1 within ~2 alpha +
    grid granularity of relative error."""
    from approximate_quantiles_ray.pipelines.drift import events_type_drift_sketch
    from approximate_quantiles_ray.pipelines.relational import (
        events_ks_statistic,
        events_wasserstein_value,
    )

    sf = "/root/testdata/sf0.01"
    approx = events_type_drift_sketch(sf).iloc[0]
    ks_exact = events_ks_statistic(sf).iloc[0]["ks"]
    w1_exact = events_wasserstein_value(sf).iloc[0]["w1"]
    assert approx["n_a"] == events_ks_statistic(sf).iloc[0]["n_a"]
    assert abs(approx["ks_est"] - ks_exact) < 0.02
    assert abs(approx["w1_est"] - w1_exact) <= 0.05 * w1_exact + 0.05


def test_daily_drift_gap_day_restarts_series(ray_session, tmp_path):
    """A missing day breaks the consecutive-pair chain (both sides use
    the day-1 join rule); planted shift on day 2 shows up as high KS."""
    import numpy as np

    from approximate_quantiles_ray.pipelines.drift import events_daily_value_drift

    US_DAY = 86_400_000_000
    rng = np.random.default_rng(17)
    rows = []
    i = 0
    # days 0, 1 (shifted), 3 (gap at 2)
    for day, (mu, n) in {0: (10, 200), 1: (30, 200), 3: (10, 150)}.items():
        for v in np.round(rng.normal(mu, 1, n), 2):
            rows.append((i, i, "t", day * US_DAY + i, float(v)))
            i += 1
    _write_events(tmp_path, rows)
    out = events_daily_value_drift(str(tmp_path))
    assert out["day"].tolist() == [1]  # day 3 has no day 2 to pair with
    assert out["ks"].iloc[0] > 0.9  # planted mean shift -> near-total separation


def test_user_share_drift_planted(ray_session, tmp_path):
    """A user active only in the first half tops the drift ranking; a
    perfectly stable user scores zero."""
    import numpy as np

    from approximate_quantiles_ray.pipelines.drift import (
        _HALF_CUT_US,
        events_user_share_drift,
    )

    rows = []
    i = 0
    # user 1: 50 events first half only; user 2: 25+25 balanced
    for n_first, n_second, uid in ((50, 0, 1), (25, 25, 2)):
        for _ in range(n_first):
            rows.append((i, uid, "t", _HALF_CUT_US - 10_000_000 - i, 1.0)); i += 1
        for _ in range(n_second):
            rows.append((i, uid, "t", _HALF_CUT_US + 10_000_000 + i, 1.0)); i += 1
    _write_events(tmp_path, rows)
    out = events_user_share_drift(str(tmp_path))
    assert out["user_id"].iloc[0] == 1
    stable = out[out["user_id"] == 2].iloc[0]
    # exact cross products: n1=75, n2=25; user2 |25*25 - 25*75| = 1250
    assert stable["share_diff_num"] == 1250
    assert out["share_diff_num"].iloc[0] == abs(50 * 25 - 0 * 75)


@pytest.mark.parametrize(
    "mod_name, fn_name",
    [
        ("relational", "events_value_winsorized_mean"),
        ("relational", "events_wasserstein_value"),
        ("drift", "docs_len_drift"),
        ("drift", "events_type_ks_matrix"),
        ("drift", "events_daily_value_drift"),
        ("drift", "events_user_share_drift"),
    ],
)
def test_new_fold_queries_overcap_agree(ray_session, monkeypatch, mod_name, fn_name):
    """Every new fold-based statistic must produce identical results on
    the under-cap pandas path and the forced distributed path."""
    import importlib

    import pandas as pd

    import approximate_quantiles_ray.engine.folds as folds

    mod = importlib.import_module(f"approximate_quantiles_ray.pipelines.{mod_name}")
    fn = getattr(mod, fn_name)
    sf = "/root/testdata/sf0.001"
    fast = fn(sf)
    orig = folds.adaptive_grouped_agg

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg", force_ds)
    pd.testing.assert_frame_equal(fast, fn(sf))
