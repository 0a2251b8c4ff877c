"""DDSketch: relative-error guarantee, merge law, collapse, serde.

Conformance bar: the paper's guarantee — for every quantile q whose
value does not land in a collapsed bucket, |est − true| ≤ alpha·|true|
(Masson et al. 2019, Theorem 1 for the non-collapsed store; §2.2 for
the collapsed tail guarantee).
"""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.ddsketch import DDSketch

QS = [0.001, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999]


def _true_quantile(x: np.ndarray, q: float) -> float:
    # the sketch selects the element of 0-based rank floor(q*n + 0.5)
    # clamped — the repo-wide LinearDigest convention (sketches/exact.py)
    return float(np.sort(x)[min(int(np.floor(q * len(x) + 0.5)), len(x) - 1)])


def _check_rel(sk: DDSketch, x: np.ndarray, alpha: float, qs=QS):
    for q in qs:
        true = _true_quantile(x, q)
        est = sk.est_value_at_quantile(q)
        if true == 0.0:
            assert abs(est) <= alpha
        else:
            assert abs(est - true) <= alpha * abs(true) * (1 + 1e-9), (
                q,
                true,
                est,
            )


@pytest.mark.parametrize("alpha", [0.01, 0.05])
def test_relative_error_lognormal(alpha):
    rng = np.random.default_rng(7)
    x = rng.lognormal(mean=3.0, sigma=2.0, size=200_000)
    sk = DDSketch(alpha=alpha).update(x)
    assert sk.count == len(x)
    _check_rel(sk, x, alpha)


def test_relative_error_uniform_and_rank_query():
    rng = np.random.default_rng(11)
    x = rng.uniform(1.0, 1001.0, size=100_000)
    sk = DDSketch(alpha=0.01).update(x)
    _check_rel(sk, x, 0.01)
    # rank query: CDF estimate within the value-error-implied band
    for v in [10.0, 100.0, 500.0, 900.0]:
        true_rank = float(np.mean(x <= v))
        est = sk.est_quantile_at_value(v)
        # alpha relative value error maps to ~alpha*v density worth of rank
        assert abs(est - true_rank) < 0.005


def test_negatives_and_zeros():
    rng = np.random.default_rng(3)
    x = np.concatenate(
        [
            -rng.lognormal(1.0, 1.5, size=40_000),
            np.zeros(5_000),
            rng.lognormal(1.0, 1.5, size=55_000),
        ]
    )
    rng.shuffle(x)
    sk = DDSketch(alpha=0.02).update(x)
    assert sk.count == len(x)
    assert sk.zero_count == 5_000
    _check_rel(sk, x, 0.02)
    # sign of the median region is preserved exactly
    assert sk.est_value_at_quantile(0.42) == 0.0


def test_merge_bit_identical_across_orders():
    rng = np.random.default_rng(5)
    parts = [rng.lognormal(2.0, 1.0, size=10_000) for _ in range(8)]

    def build(order):
        sks = [DDSketch(alpha=0.01).update(parts[i]) for i in order]
        acc = sks[0]
        for s in sks[1:]:
            acc.merge(s)
        return acc.to_bytes()

    base = build(range(8))
    for perm in ([7, 6, 5, 4, 3, 2, 1, 0], [3, 1, 4, 0, 7, 5, 2, 6]):
        assert build(perm) == base
    # merged equals single-pass build (bucket counts are a pure
    # function of the value multiset)
    single = DDSketch(alpha=0.01).update(np.concatenate(parts)).to_bytes()
    assert base == single


def test_collapse_bounds_memory_keeps_tail_accuracy():
    rng = np.random.default_rng(13)
    # 12 orders of magnitude → way more than 128 buckets at alpha=0.01
    x = np.exp(rng.uniform(np.log(1e-3), np.log(1e9), size=300_000))
    sk = DDSketch(alpha=0.01, max_bins=128).update(x)
    assert len(sk.pos.counts) <= 128
    # quantiles inside the kept range keep the guarantee (collapse eats
    # the LOW buckets; 128 bins at alpha=0.01 span the top ~2.56 ln
    # units = the top ~9% of this 12-decade log-uniform mass)
    _check_rel(sk, x, 0.01, qs=[0.95, 0.99, 0.999])
    # a quantile in the collapsed head is clamped to the collapse
    # boundary — still monotone, never above the kept range
    assert sk.est_value_at_quantile(0.5) <= sk.est_value_at_quantile(0.95)
    # nbytes stays tiny
    assert sk.nbytes < 16 * 1024


def test_serde_roundtrip_and_continue_updating():
    rng = np.random.default_rng(17)
    x = rng.lognormal(0.0, 1.0, size=50_000)
    sk = DDSketch(alpha=0.01).update(x[:25_000])
    sk2 = DDSketch.from_bytes(sk.to_bytes())
    assert sk2.to_bytes() == sk.to_bytes()
    sk2.update(x[25_000:])
    ref = DDSketch(alpha=0.01).update(x)
    assert sk2.to_bytes() == ref.to_bytes()


def test_merge_config_mismatch_raises():
    with pytest.raises(ValueError):
        DDSketch(alpha=0.01).merge(DDSketch(alpha=0.02))
    with pytest.raises(ValueError):
        DDSketch(alpha=0.01, max_bins=64).merge(DDSketch(alpha=0.01, max_bins=128))


def test_empty_and_single():
    sk = DDSketch(alpha=0.01)
    with pytest.raises(ValueError):
        sk.est_value_at_quantile(0.5)
    sk.update(np.array([42.0]))
    assert abs(sk.est_value_at_quantile(0.5) - 42.0) <= 0.01 * 42.0
    assert abs(sk.est_value_at_quantile(0.0) - 42.0) <= 0.01 * 42.0
    assert abs(sk.est_value_at_quantile(1.0) - 42.0) <= 0.01 * 42.0


SF_DIR = "/root/testdata/sf0.001"


def test_events_value_ddsketch_ray_path(ray_session):
    """The queries() entry: every estimate within alpha of the true
    quantile VALUE, and bit-identical across block counts (the merge
    law carried through the Ray partial-fold plan)."""
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.pipelines.relational import events_value_ddsketch

    from approximate_quantiles_ray.pipelines.relational import events_value_ddsketch_estimates

    out = events_value_ddsketch_estimates(SF_DIR, alpha=0.01)
    v = np.sort(pq.read_table(f"{SF_DIR}/events.parquet", columns=["value"])
                .column("value").to_numpy())
    for q, est in zip(out["q"], out["value_est"]):
        true = v[min(int(np.floor(q * len(v) + 0.5)), len(v) - 1)]
        assert abs(est - true) <= 0.01 * abs(true) * (1 + 1e-9), (q, true, est)

    # partitioning invariance: same estimates from a repartitioned read
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import SketchSpec, sketch_columns_streaming
    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    for n_blocks in (1, 7):
        ds = rd.read_parquet(f"{SF_DIR}/events.parquet", columns=["value"]) \
               .repartition(n_blocks)
        merged = sketch_columns_streaming(
            ds, [SketchSpec(key="d", factory=lambda: DDSketch(alpha=0.01), on="value")]
        )
        got = [merged["d"].est_value_at_quantile(q) for q in out["q"]]
        assert got == list(out["value_est"])


def test_ddsketch_drift_kernel_bounds():
    """Kernel-level (no Ray): sketch-estimated KS/W1 track the exact
    two-sample statistics on random lognormals."""
    from approximate_quantiles_ray.pipelines.drift import ddsketch_drift

    rng = np.random.default_rng(41)
    a = rng.lognormal(3.0, 1.0, 50_000)
    b = rng.lognormal(3.2, 1.1, 40_000)
    sa = DDSketch(alpha=0.005).update(a)
    sb = DDSketch(alpha=0.005).update(b)
    st = ddsketch_drift(sa, sb)

    union = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), union, side="right") / len(a)
    fb = np.searchsorted(np.sort(b), union, side="right") / len(b)
    ks_exact = float(np.abs(fa - fb).max())
    gap = np.abs(fa - fb)
    w1_exact = float(np.sum(gap[:-1] * np.diff(union)))

    assert abs(st["ks"] - ks_exact) < 0.01
    assert abs(st["w1"] - w1_exact) <= 0.03 * w1_exact
    # identical sketches -> zero drift
    same = ddsketch_drift(sa, DDSketch.from_bytes(sa.to_bytes()))
    assert same["ks"] == 0.0 and same["w1"] == 0.0
