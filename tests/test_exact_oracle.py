"""Exact-oracle self-tests mirroring the reference's LinearDigest tests
(/root/reference/src/util/linear_digest.rs:59-131)."""

import numpy as np
import pytest

from approximate_quantiles_ray import ExactDigest


def test_rank_singleton_rule():
    d = ExactDigest().update(np.array([1.0, 2.0, 3.0, 4.0]))
    # one matching value: rank = #less / n (no half-weight)
    assert d.est_quantile_at_value(2.0) == 0.25
    assert d.est_quantile_at_value(1.0) == 0.0
    assert d.est_quantile_at_value(4.0) == 0.75


def test_rank_duplicates_half_rule():
    d = ExactDigest().update(np.array([1.0, 2.0, 2.0, 3.0]))
    # duplicates: rank = (#less + #equal/2) / n
    assert d.est_quantile_at_value(2.0) == (1 + 1.0) / 4


def test_value_at_quantile_rounding():
    d = ExactDigest().update(np.arange(10.0))
    # index = round(q*n), clamped
    assert d.est_value_at_quantile(0.0) == 0.0
    assert d.est_value_at_quantile(0.05) == 1.0  # Rust round: half away from zero
    assert d.est_value_at_quantile(0.5) == 5.0
    assert d.est_value_at_quantile(1.0) == 9.0


def test_merge():
    a = ExactDigest().update(np.array([1.0, 2.0]))
    b = ExactDigest().update(np.array([3.0, 4.0]))
    a.merge(b)
    assert a.count == 4
    assert a.est_value_at_quantile(1.0) == 4.0


def test_empty():
    d = ExactDigest()
    assert np.isnan(d.est_value_at_quantile(0.5))
    assert np.isnan(d.est_quantile_at_value(1.0))


def test_anti_join_broadcast_and_shuffle_paths_agree(ray_session, monkeypatch):
    """The adaptive anti join must give identical results on the
    broadcast NOT-IN path and the hash-shuffle left_anti path."""
    import approximate_quantiles_ray.pipelines.relational as r

    sf = "/root/testdata/sf0.001"
    fast = r.customers_without_urgent_orders(sf)
    monkeypatch.setattr(r, "_ANTI_BROADCAST_KEY_CAP", 0)  # force the join
    slow = r.customers_without_urgent_orders(sf)
    import pandas as pd

    pd.testing.assert_frame_equal(fast, slow)


def test_q3_broadcast_and_shuffle_paths_agree(ray_session, monkeypatch):
    """unshipped_orders_topk: the broadcast orderkey-map path and the
    distributed hash-join path must return identical top-k rows."""
    import pandas as pd

    import approximate_quantiles_ray.pipelines.relational as r

    sf = "/root/testdata/sf0.001"
    fast = r.unshipped_orders_topk(sf)
    monkeypatch.setattr(r, "_ANTI_BROADCAST_KEY_CAP", 0)  # force the join
    slow = r.unshipped_orders_topk(sf)
    pd.testing.assert_frame_equal(fast, slow)


def test_q4_pandas_and_distributed_join_paths_agree(ray_session, monkeypatch):
    """late_shipment_priority_counts: the under-cap broadcast probe and
    the over-cap distributed hash-join path must agree."""
    import pandas as pd

    import approximate_quantiles_ray.engine.folds as folds
    import approximate_quantiles_ray.pipelines.relational as r

    sf = "/root/testdata/sf0.001"
    fast = r.late_shipment_priority_counts(sf)
    orig = folds.adaptive_grouped_agg_ds

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg_ds", force_ds)
    slow = r.late_shipment_priority_counts(sf)
    pd.testing.assert_frame_equal(fast, slow)


def test_retention_pandas_and_join_paths_agree(ray_session, monkeypatch):
    """events_daily_retention: under-cap vectorized adjacency and the
    over-cap distributed self-join must agree."""
    import pandas as pd

    import approximate_quantiles_ray.engine.folds as folds
    import approximate_quantiles_ray.pipelines.relational as r

    sf = "/root/testdata/sf0.001"
    fast = r.events_daily_retention(sf)
    orig = folds.adaptive_grouped_agg_ds

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg_ds", force_ds)
    slow = r.events_daily_retention(sf)
    pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.parametrize(
    "fn_name",
    [
        "events_column_profile",
        "events_user_type_profiles",
        "transcript_conv_dedup_forced",
        "customers_with_returns",
        "events_user_first_last",
        "docs_embedding_coverage",
        "nation_balance_union",
        "events_props_mode",
        "events_value_ntiles",
        "ship_delay_priority_quantiles",
        "events_click_attribution",
        "docs_decontaminate",
        "docs_repetition_stats",
        "docs_mixing_plan",
        "docs_commonness_scores",
        "events_value_k_moments",
        "docs_curation_report",
    ],
)
def test_overcap_distributed_paths_agree(ray_session, monkeypatch, fn_name):
    """Every new adaptive-fold query must produce identical results on
    the under-cap pandas path and the forced over-cap distributed path
    (the branch that only runs at corpus scale)."""
    import pandas as pd

    import approximate_quantiles_ray.engine.folds as folds

    sf = "/root/testdata/sf0.001"
    if fn_name == "transcript_conv_dedup_forced":
        from approximate_quantiles_ray.pipelines.transcript_exact import conv_dedup_stats

        fn = conv_dedup_stats
    elif fn_name == "docs_embedding_coverage":
        from approximate_quantiles_ray.pipelines.similarity import docs_embedding_coverage

        fn = docs_embedding_coverage
    elif fn_name == "docs_decontaminate":
        from approximate_quantiles_ray.pipelines.dedup import docs_decontaminate

        fn = docs_decontaminate
    elif fn_name in ("docs_repetition_stats", "docs_commonness_scores"):
        from approximate_quantiles_ray.pipelines import textstats as tx

        fn = getattr(tx, fn_name)
    elif fn_name == "docs_mixing_plan":
        from approximate_quantiles_ray.pipelines.sampling import docs_mixing_plan

        fn = docs_mixing_plan
    elif fn_name == "docs_curation_report":
        # forcing cap=0 here also flips the funnel's dedup stage onto
        # the distributed keep-set + semi-join branch
        from approximate_quantiles_ray.pipelines.curation import docs_curation_report

        fn = docs_curation_report
    else:
        import approximate_quantiles_ray.pipelines.relational as r

        fn = getattr(r, fn_name)
    fast = fn(sf)
    orig = folds.adaptive_grouped_agg_ds

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg_ds", force_ds)
    slow = fn(sf)
    pd.testing.assert_frame_equal(fast, slow)


@pytest.mark.parametrize("fn_name", ["docs_vocab_topk", "docs_bigram_topk", "docs_token_df_topk"])
def test_overcap_topk_paths_agree(ray_session, monkeypatch, fn_name):
    import pandas as pd

    import approximate_quantiles_ray.engine.folds as folds
    import approximate_quantiles_ray.pipelines.textstats as tx

    sf = "/root/testdata/sf0.001"
    fn = getattr(tx, fn_name)
    fast = fn(sf)
    orig = folds.adaptive_grouped_agg_ds

    def force_ds(part_ds, keys, spec, cap=0):
        return orig(part_ds, keys, spec, cap=0)

    monkeypatch.setattr(folds, "adaptive_grouped_agg_ds", force_ds)
    slow = fn(sf)
    pd.testing.assert_frame_equal(
        fast.reset_index(drop=True), slow.reset_index(drop=True)
    )


def test_fk_audit_distinct_pair_paths_agree(ray_session, monkeypatch):
    """referential_integrity_audit rides adaptive_distinct_pairs: the
    numpy lexsort dedup (under cap) and the distributed Ray groupby
    dedup (forced) must produce identical audits."""
    import pandas as pd

    import approximate_quantiles_ray.engine.folds as folds
    import approximate_quantiles_ray.pipelines.relational as r

    sf = "/root/testdata/sf0.001"
    fast = r.referential_integrity_audit(sf)
    orig = folds.adaptive_distinct_pairs

    def force_ds(part_ds, cols, cap=0):
        return orig(part_ds, cols, cap=0)

    monkeypatch.setattr(folds, "adaptive_distinct_pairs", force_ds)
    slow = r.referential_integrity_audit(sf)
    pd.testing.assert_frame_equal(fast, slow)
