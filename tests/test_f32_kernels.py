"""f32 storage kernels (round-3 verdict item 8): the reference is
generic over F: Float and instantiates f32 in its own tests
(/root/reference/src/t_digest/t_digest.rs:736,
/root/reference/src/rc_sketch/rc_sketch.rs:412); the rebuild exposes
the same choice as dtype="f4" on TDigest and KLL. Storage narrows;
compaction/query arithmetic stays float64."""

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.base import sketch_from_bytes
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest


def _mk(cls, dtype):
    if cls is TDigest:
        return TDigest(delta=2000, scale="k2", dtype=dtype)
    return KLL(k=200, seed=1, dtype=dtype)


@pytest.mark.parametrize("cls", [TDigest, KLL])
def test_f32_reference_epsilon_bounds(cls):
    """The reference's own f32-instantiated accuracy bar: uniform values
    through an f4 sketch stay within 1% rank error at the reference's
    test quantiles (t_digest.rs:736-757 uses 0.01 epsilon on 0..100k;
    rc_sketch.rs:412-425 RELATIVE_ERROR_FACTOR-scaled bounds)."""
    rng = np.random.default_rng(42)
    v = rng.uniform(0.0, 100_000.0, 100_000).astype(np.float32)
    sk = _mk(cls, "f4").update(v)
    vs = np.sort(v.astype(np.float64))
    n = len(vs)
    for q in (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        est = sk.est_value_at_quantile(q)
        # rank of the estimate within 1% of q (the reference's epsilon)
        rank = np.searchsorted(vs, est) / n
        assert abs(rank - q) <= 0.01 + 1e-9, (cls.__name__, q, est, rank)


@pytest.mark.parametrize("cls", [TDigest, KLL])
def test_f32_state_halves_and_roundtrips(cls):
    rng = np.random.default_rng(7)
    v = rng.lognormal(3.0, 1.0, 200_000)
    s8, s4 = _mk(cls, "f8").update(v), _mk(cls, "f4").update(v)
    assert s4.nbytes < 0.6 * s8.nbytes  # state halves (+ fixed overhead)
    rt = sketch_from_bytes(s4.to_bytes())
    assert rt.dtype == np.dtype("f4")
    assert rt.count == s4.count
    for q in (0.01, 0.5, 0.99):
        assert rt.est_value_at_quantile(q) == s4.est_value_at_quantile(q)


@pytest.mark.parametrize("cls", [TDigest, KLL])
def test_f32_merge_and_dtype_guard(cls):
    rng = np.random.default_rng(9)
    v = rng.normal(50.0, 10.0, 100_000)
    a = _mk(cls, "f4").update(v[:50_000])
    b = _mk(cls, "f4").update(v[50_000:])
    m = a.merge(b)
    assert m.count == len(v)
    vs = np.sort(v)
    est = m.est_value_at_quantile(0.5)
    rank = np.searchsorted(vs, est) / len(vs)
    assert abs(rank - 0.5) <= 0.02
    with pytest.raises(ValueError, match="dtype"):
        _mk(cls, "f8").merge(_mk(cls, "f4"))
    with pytest.raises(ValueError, match="dtype"):
        _mk(cls, "f2")


def test_f32_query_reductions_accumulate_in_f64():
    """ADVICE r4: np.sum/np.cumsum on f4 weights would accumulate in
    float32 — a cumsum past 2^24 silently drops weight-1 singletons.
    With an explicit 2^24 centroid plus a singleton, total_weight and
    the rank of the singleton must reflect the exact f64 fold."""
    t4 = TDigest(delta=100, scale="k2", dtype="f4")
    big = float(2**24)  # exactly representable in f4
    t4.update_weighted(np.array([0.0]), np.array([big]))
    t4.update_weighted(np.array([1000.0]), np.array([1.0]))
    # f32 accumulation would report 2^24 (dropping the singleton)
    assert t4.total_weight() == big + 1.0
    # the singleton at the top of the distribution must still rank ~1.0;
    # if cumsum dropped it, est_quantile_at_value(1000) would misplace it
    assert t4.est_quantile_at_value(1000.0) > 0.999
    arr_m, arr_w = t4._query_arrays()
    assert arr_m.dtype == np.float64 and arr_w.dtype == np.float64


def test_f32_query_path_stays_f64():
    """Query results are Python floats computed in f64 — an f4 sketch's
    estimate is finite and close to the f8 twin's on identical input."""
    rng = np.random.default_rng(11)
    v = rng.lognormal(3.0, 1.0, 50_000)
    t8 = TDigest(delta=2000, scale="k2").update(v)
    t4 = TDigest(delta=2000, scale="k2", dtype="f4").update(v)
    for q in (0.1, 0.5, 0.9, 0.99):
        e8, e4 = t8.est_value_at_quantile(q), t4.est_value_at_quantile(q)
        assert abs(e8 - e4) <= 0.01 * abs(e8)
