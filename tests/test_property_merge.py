"""Property-based (hypothesis) checks of the sketch monoid laws:
serde round-trips, count conservation, merge associativity/commutativity
(exact for HLL/CMS/Bloom states; within-ε estimates for quantile
sketches), identity element behavior."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from approximate_quantiles_ray.functions.hashing import hash_int64
from approximate_quantiles_ray.sketches.bloom import BloomFilter
from approximate_quantiles_ray.sketches.countmin import CountMinSketch
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

floats = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False, width=64
)
float_lists = st.lists(floats, min_size=0, max_size=400)
int_lists = st.lists(st.integers(min_value=0, max_value=1 << 40), min_size=0, max_size=400)


def _arr(xs):
    return np.asarray(xs, dtype=np.float64)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(float_lists, float_lists, float_lists)
def test_tdigest_monoid(a, b, c):
    def mk(xs):
        sk = TDigest(delta=100, scale="k2")
        if xs:
            sk.update(_arr(xs))
        return sk

    left = mk(a).merge(mk(b)).merge(mk(c))
    right = mk(a).merge(mk(b).merge(mk(c)))
    assert left.count == right.count == len(a) + len(b) + len(c)
    if left.count:
        allv = np.sort(_arr(a + b + c))
        # associativity measured in RANK space (value-space deltas are
        # meaningless on adversarial tiny multisets where one duplicate
        # step spans the whole range)
        tol = 0.35 + 1.0 / len(allv)  # quantile granularity floor for tiny n
        for q in (0.1, 0.5, 0.9):
            for est in (left.est_value_at_quantile(q), right.est_value_at_quantile(q)):
                assert allv[0] <= est <= allv[-1]
                lo_r = np.searchsorted(allv, est, side="left")
                hi_r = np.searchsorted(allv, est, side="right")
                rank = (lo_r + hi_r) / 2 / len(allv)  # mid-rank for duplicates
                assert abs(rank - q) <= tol, (q, est)
    # serde round-trip exact
    rt = TDigest.from_bytes(left.to_bytes())
    assert rt.count == left.count
    if left.count:
        assert rt.est_value_at_quantile(0.5) == left.est_value_at_quantile(0.5)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(float_lists, float_lists)
def test_kll_merge_commutes_in_distribution(a, b):
    def mk(xs):
        sk = KLL(k=50, seed=7)
        if xs:
            sk.update(_arr(xs))
        return sk

    ab = mk(a).merge(mk(b))
    ba = mk(b).merge(mk(a))
    assert ab.count == ba.count == len(a) + len(b)
    if ab.count:
        allv = np.sort(_arr(a + b))
        for q in (0.25, 0.75):
            exact = allv[min(len(allv) - 1, int(q * len(allv)))]
            spread = (allv[-1] - allv[0]) or 1.0
            assert abs(ab.est_value_at_quantile(q) - exact) <= 0.35 * spread + 1e-9
            assert abs(ba.est_value_at_quantile(q) - exact) <= 0.35 * spread + 1e-9
    rt = KLL.from_bytes(ab.to_bytes())
    assert rt.count == ab.count


@settings(max_examples=40, deadline=None, derandomize=True)
@given(int_lists, int_lists, int_lists)
def test_hll_state_associative_commutative_exact(a, b, c):
    def mk(xs):
        sk = HLL(p=10, seed=1)
        if xs:
            sk.update(hash_int64(np.asarray(xs, np.int64)))
        return sk

    x = mk(a).merge(mk(b)).merge(mk(c))
    y = mk(c).merge(mk(a).merge(mk(b)))
    np.testing.assert_array_equal(x.registers, y.registers)
    rt = HLL.from_bytes(x.to_bytes())
    np.testing.assert_array_equal(rt.registers, x.registers)


@settings(max_examples=40, deadline=None, derandomize=True)
@given(int_lists, int_lists)
def test_cms_and_bloom_states_exact(a, b):
    cm_ab = CountMinSketch(width=256, depth=3, seed=2)
    cm_ab.update(np.asarray(a + b, np.int64) if a + b else np.zeros(0, np.int64))
    cm_merge = CountMinSketch(width=256, depth=3, seed=2)
    cm_b = CountMinSketch(width=256, depth=3, seed=2)
    if a:
        cm_merge.update(np.asarray(a, np.int64))
    if b:
        cm_b.update(np.asarray(b, np.int64))
    cm_merge.merge(cm_b)
    np.testing.assert_array_equal(cm_ab.table, cm_merge.table)

    bl_ab = BloomFilter(num_bits=1 << 12, num_hashes=3, seed=3)
    bl_a = BloomFilter(num_bits=1 << 12, num_hashes=3, seed=3)
    bl_b = BloomFilter(num_bits=1 << 12, num_hashes=3, seed=3)
    if a + b:
        bl_ab.update(np.asarray(a + b, np.int64))
    if a:
        bl_a.update(np.asarray(a, np.int64))
    if b:
        bl_b.update(np.asarray(b, np.int64))
    bl_a.merge(bl_b)
    np.testing.assert_array_equal(bl_ab.bits, bl_a.bits)
    # no false negatives, ever
    if a:
        assert bl_a.contains(np.asarray(a, np.int64)).all()


# ------------------------------------------------------------- DDSketch laws


@settings(max_examples=40, deadline=None, derandomize=True)
@given(float_lists, float_lists, float_lists)
def test_ddsketch_monoid_bit_exact(a, b, c):
    """DDSketch merges are BIT-identical (not just within-ε): state is
    a pure function of the value multiset, so associativity,
    commutativity, and split-vs-single-pass all hold at byte level."""
    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    def mk(xs):
        sk = DDSketch(alpha=0.02, max_bins=512)
        if xs:
            sk.update(_arr(xs))
        return sk

    left = mk(a).merge(mk(b)).merge(mk(c))
    right = mk(a).merge(mk(b).merge(mk(c)))
    flipped = mk(c).merge(mk(a)).merge(mk(b))
    single = mk(a + b + c)
    assert left.to_bytes() == right.to_bytes() == flipped.to_bytes() == single.to_bytes()
    assert left.count == len(a) + len(b) + len(c)


# magnitudes within one non-collapsing store span: at alpha=0.02
# (ln gamma ~ 0.04), 2048 bins cover ~e^82 of dynamic range; [1e-6, 1e9]
# is ~e^35. Values outside the span are the DOCUMENTED collapse case
# (guarantee excluded there — test_ddsketch.py pins that separately).
_mag = st.floats(min_value=1e-6, max_value=1e9, allow_nan=False, width=64)
_dd_floats = st.one_of(st.just(0.0), _mag, _mag.map(lambda x: -x))


@settings(max_examples=40, deadline=None, derandomize=True)
@given(st.lists(_dd_floats, min_size=1, max_size=400))
def test_ddsketch_relative_error_property(xs):
    """Every quantile estimate within alpha of the selected element,
    for arbitrary float multisets (zeros, negatives, duplicates,
    adversarial spacings) within one store span."""
    import math

    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    alpha = 0.02
    sk = DDSketch(alpha=alpha).update(_arr(xs))
    s = np.sort(_arr(xs))
    n = len(s)
    for q in (0.0, 0.25, 0.5, 0.75, 1.0):
        true = float(s[min(int(math.floor(q * n + 0.5)), n - 1)])
        est = sk.est_value_at_quantile(q)
        if abs(true) <= 1e-270:
            assert est == 0.0
        else:
            assert abs(est - true) <= alpha * abs(true) * (1 + 1e-9), (q, true, est)


@settings(max_examples=30, deadline=None, derandomize=True)
@given(
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200),
    st.lists(st.integers(min_value=-1000, max_value=1000), min_size=1, max_size=200),
)
def test_drift_stats_match_brute_force(a, b):
    """drift_stats (the exact-integer KS/W1/median core) equals the
    brute-force definitions on arbitrary integer multisets."""
    import math

    import pandas as pd

    from approximate_quantiles_ray.pipelines.drift import drift_stats

    av, bv = np.asarray(a, np.int64), np.asarray(b, np.int64)
    union = np.unique(np.concatenate([av, bv]))
    hist = pd.DataFrame(
        {
            "v": union,
            "ca": [int((av == u).sum()) for u in union],
            "cb": [int((bv == u).sum()) for u in union],
        }
    )
    st_ = drift_stats(hist)
    fa = np.searchsorted(np.sort(av), union, side="right") / len(av)
    fb = np.searchsorted(np.sort(bv), union, side="right") / len(bv)
    gap = np.abs(fa - fb)
    assert abs(st_["ks"] - gap.max()) < 1e-12
    w1 = float(np.sum(gap[:-1] * np.diff(union))) if len(union) > 1 else 0.0
    assert abs(st_["w1"] - w1) < 1e-9
    for side, arr in (("median_a", av), ("median_b", bv)):
        s = np.sort(arr)
        assert st_[side] == float(s[max(0, math.ceil(0.5 * len(s)) - 1)])


def test_drift_stats_empty_side_raises():
    import pandas as pd
    import pytest as _pytest

    from approximate_quantiles_ray.pipelines.drift import drift_stats

    hist = pd.DataFrame({"v": [1, 2], "ca": [1, 1], "cb": [0, 0]})
    with _pytest.raises(ValueError, match="at least one row"):
        drift_stats(hist)


def test_drift_stats_bigint_no_overflow():
    """ADVICE r3 item 3: the cross-multiplied KS gap must not wrap
    int64 when n_a * n_b >= 2^63 (~3e9 rows per side). Counts here are
    ~2^33 per side so ca*nb reaches ~2^66."""
    import pandas as pd

    from approximate_quantiles_ray.pipelines.drift import drift_stats

    big = 2**33  # 8.6e9 rows per side
    hist = pd.DataFrame(
        {"v": [0, 1, 2], "ca": [big, 0, big], "cb": [0, big, big]}
    )
    st_ = drift_stats(hist)
    # exact: at v=0 the CDF gap is |big*nb - 0| / (na*nb) = 1/2
    assert st_["n_a"] == 2 * big and st_["n_b"] == 2 * big
    assert abs(st_["ks"] - 0.5) < 1e-12
    assert st_["ks_num"] == big * (2 * big)
    assert st_["ks_num"] > 0  # a wrapped int64 would have gone negative/odd


def test_tdigest_self_merge_doubles_and_terminates():
    """t.merge(t) must terminate (the lazy-merge path iterates other's
    pending lists while appending to self's — identical objects would
    grow forever) and produce the doubled digest."""
    from approximate_quantiles_ray.sketches.tdigest import TDigest

    rng = np.random.default_rng(7)
    vals = rng.normal(size=5000)
    t = TDigest(delta=100)
    t.update(vals)
    t.merge(t)
    assert t.count == 2 * len(vals)
    ref = TDigest(delta=100)
    ref.update(vals)
    ref.update(vals)
    assert abs(t.est_value_at_quantile(0.5) - ref.est_value_at_quantile(0.5)) < 0.05
    # with buffered (unflushed) pending on both sides too
    t2 = TDigest(delta=100)
    t2.update(vals[:100])
    t2.merge(t2)
    assert t2.count == 200


def test_tdigest_update_copies_views():
    """A slice VIEW fed to update must not be retained as-is: a tiny
    per-group slice would pin its whole base batch buffer in a
    long-lived window/key state (review finding, round 5)."""
    from approximate_quantiles_ray.sketches.tdigest import TDigest

    base = np.arange(100_000, dtype=np.float64)
    t = TDigest(delta=100)
    t.update(base[10:20])  # view with .base set
    assert t._pending, "expected a buffered pending array"
    for arr in t._pending:
        assert arr.base is None, "pending retained a view over the caller's base"


def test_hll_update_precomputed_large_slice_matches_hashed():
    """update_precomputed must agree with update_hashed on slices above
    the 2048-element segmented-reduce threshold (both now share
    _scatter_max)."""
    from approximate_quantiles_ray.functions.hashing import hash_any

    vals = np.arange(50_000, dtype=np.int64)
    a, b = HLL(p=12, seed=3), HLL(p=12, seed=3)
    h = hash_any(vals, 3)
    idx, rho = a.precompute_hashed(h)
    a.update_precomputed(idx, rho)
    b.update_hashed(h)
    assert np.array_equal(a.registers, b.registers)
