"""ShardedDigest (rank-sum + bisection), SymDigest, and the
AverageNeighbour compaction variant, vs the exact oracle.

Reference bounds: parallel_digest.rs:140-248 (rel-err ≤0.005–0.0075),
sym_digest.rs:172-263 (rel-err ≤0.005).
"""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.combinators import ShardedDigest, SymDigest
from approximate_quantiles_ray.sketches.exact import ExactDigest
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest

QS = (0.001, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


@pytest.fixture(scope="module")
def uniform_data():
    rng = np.random.default_rng(42)
    return rng.uniform(0, 1001, 1_000_000)


def _shards(data, make, n=4):
    out = []
    for chunk in np.array_split(data, n):
        s = make()
        s.update(chunk)
        out.append(s)
    return out


def test_sharded_kll_rank_sum_and_bisection(uniform_data):
    exact = ExactDigest()
    exact.update(uniform_data)
    sd = ShardedDigest(_shards(uniform_data, lambda: KLL(k=200, seed=7)))
    assert sd.count == len(uniform_data)
    for q in QS:
        est = sd.est_value_at_quantile(q)
        want = exact.est_value_at_quantile(q)
        assert est == pytest.approx(want, rel=0.0075, abs=1.0), q
    for v in (1.0, 100.0, 500.5, 990.0):
        assert sd.est_quantile_at_value(v) == pytest.approx(
            exact.est_quantile_at_value(v), abs=0.0075
        ), v


def test_sharded_tdigest_matches_native_merge(uniform_data):
    shards = _shards(uniform_data, lambda: TDigest(delta=500, scale="k2"))
    sd = ShardedDigest(shards)
    native = TDigest(delta=500, scale="k2")
    for s in _shards(uniform_data, lambda: TDigest(delta=500, scale="k2")):
        native.merge(s)
    for q in QS:
        assert sd.est_value_at_quantile(q) == pytest.approx(
            native.est_value_at_quantile(q), rel=0.01, abs=1.0
        ), q


def test_sym_digest_tails(uniform_data):
    exact = ExactDigest()
    exact.update(uniform_data)
    sym = SymDigest(lambda: KLL(k=200, seed=3))
    sym.update(uniform_data)
    assert sym.count == len(uniform_data)
    # both tails within the reference's one-sided bound
    for q in (0.001, 0.01, 0.5, 0.99, 0.999):
        est = sym.est_value_at_quantile(q)
        want = exact.est_value_at_quantile(q)
        assert est == pytest.approx(want, rel=0.005, abs=1.0), q
    # merge path
    sym2 = SymDigest(lambda: KLL(k=200, seed=3))
    sym2.update(uniform_data[:100])
    sym.merge(sym2)
    assert sym.count == len(uniform_data) + 100


def test_kll_average_compaction(uniform_data):
    exact = ExactDigest()
    exact.update(uniform_data)
    sk = KLL(k=200, seed=1, compaction="average")
    sk.update(uniform_data)
    assert sk.count == len(uniform_data)
    for q in QS:
        assert sk.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.005, abs=1.0
        ), q
    # serde round-trip keeps the mode
    rt = KLL.from_bytes(sk.to_bytes())
    assert rt.compaction == "average"
    assert rt.est_value_at_quantile(0.5) == sk.est_value_at_quantile(0.5)


def test_multi_digest_ensemble(uniform_data):
    from approximate_quantiles_ray.sketches.combinators import MultiDigest

    exact = ExactDigest()
    exact.update(uniform_data)
    md = MultiDigest([lambda s=s: KLL(k=100, seed=s) for s in (1, 2, 3)])
    md.update(uniform_data)
    assert md.count == len(uniform_data)
    for q in (0.01, 0.5, 0.99):
        assert md.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.01, abs=1.0
        ), q


def test_kll_fast_mode(uniform_data):
    exact = ExactDigest()
    exact.update(uniform_data)
    sk = KLL(k=200, seed=2, fast=True)
    sk.update(uniform_data)
    assert sk.count == len(uniform_data)
    # fast mode trades accuracy for speed — bound is looser
    for q in (0.1, 0.5, 0.9):
        assert sk.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.02, abs=2.0
        ), q
    rt = KLL.from_bytes(sk.to_bytes())
    assert rt.fast and rt.est_value_at_quantile(0.5) == sk.est_value_at_quantile(0.5)


def test_merge_config_mismatch_raises():
    """Third-review regression: every sketch rejects config-mismatched
    merges instead of silently absorbing them."""
    from approximate_quantiles_ray.sketches.kll_fixed import KLLFixed

    with pytest.raises(ValueError):
        TDigest(delta=1000, scale="k2").merge(TDigest(delta=50, scale="k1"))
    with pytest.raises(ValueError):
        KLL(k=200).merge(KLL(k=200, compaction="average"))
    with pytest.raises(ValueError):
        KLL(k=200).merge(KLL(k=200, fast=True))
    with pytest.raises(ValueError):
        KLLFixed(10_000, k=64).merge(KLLFixed(100_000, k=64))


def test_tdigest_weight2_last_centroid_no_nan():
    """Third-review regression: weight-2 last centroid produced NaN via
    0/0 in the upper-tail branch."""
    sk = TDigest(delta=20, scale="k1")
    sk.update(np.arange(100, dtype=np.float64))
    for q in (0.97, 0.99, 0.999, 1.0):
        v = sk.est_value_at_quantile(q)
        assert np.isfinite(v) and 0 <= v <= 99, (q, v)


def test_k2n_single_value_no_crash():
    sk = TDigest(delta=100, scale="k2n")
    sk.update(np.array([5.0]))
    assert sk.est_value_at_quantile(0.5) == 5.0


# ---------------------------------------------------------- BufferedDigest


def test_buffered_digest_equivalence_and_count(uniform_data):
    """buffered_digest.rs semantics: the wrapper feeds the inner digest
    capacity-sized batches, so a BufferedDigest over TDigest must be
    BIT-equal to a TDigest updated with the same capacity-sized chunks;
    count includes still-buffered values before any flush."""
    from approximate_quantiles_ray.sketches.combinators import BufferedDigest

    cap = 4096
    data = uniform_data[:100_000]
    bd = BufferedDigest(TDigest(delta=300, scale="k2"), cap)
    bd.update(data)
    assert bd.count == len(data)  # pre-query: some values still buffered

    # same chunk schedule applied directly: chunks flush on OVERFLOW
    # (buffer > capacity), i.e. pairs of capacity-sized chunks
    direct = TDigest(delta=300, scale="k2")
    buf, buffered = [], 0
    for i in range(0, len(data), cap):
        chunk = data[i : i + cap]
        buf.append(chunk)
        buffered += len(chunk)
        if buffered > cap:
            direct.update(np.concatenate(buf))
            buf, buffered = [], 0
    if buf:
        direct.update(np.concatenate(buf))
    for q in QS:
        assert bd.est_value_at_quantile(q) == direct.est_value_at_quantile(q), q
    assert bd.count == direct.count == len(data)


def test_buffered_digest_add_flush_merge():
    from approximate_quantiles_ray.sketches.combinators import BufferedDigest

    a = BufferedDigest(TDigest(delta=100, scale="k2"), 8)
    for x in range(20):
        a.add(float(x))
    assert a.count == 20
    assert a._buffered > 0  # last partial batch unflushed until a query
    assert a.est_quantile_at_value(10.0) == pytest.approx(0.5, abs=0.1)
    assert a._buffered == 0

    b = BufferedDigest(TDigest(delta=100, scale="k2"), 8)
    b.update(np.arange(20, 40, dtype=np.float64))
    a.merge(b)
    assert a.count == 40
    assert a.est_value_at_quantile(0.5) == pytest.approx(19.5, abs=2.0)
    assert a.nbytes > 0


def test_buffered_digest_accuracy_over_kll(uniform_data):
    """The wrapper must not change KLL's error profile (reference bar
    rel 0.0075 on uniform, parallel_digest.rs-grade)."""
    from approximate_quantiles_ray.sketches.combinators import BufferedDigest

    exact = ExactDigest()
    exact.update(uniform_data)
    bd = BufferedDigest(KLL(k=200, seed=7), 10_000)
    bd.update(uniform_data)
    for q in QS:
        assert bd.est_value_at_quantile(q) == pytest.approx(
            exact.est_value_at_quantile(q), rel=0.0075, abs=1.0
        ), q
