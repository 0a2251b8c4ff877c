"""Counting Bloom filter laws: no false negatives (incl. under deletes
of other items), delete removes membership, saturating-counter safety,
bit-identical merges, serde."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.sketches.counting_bloom import CountingBloomFilter


def test_no_false_negatives_and_delete():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 1 << 40, 5_000)
    cbf = CountingBloomFilter.for_capacity(10_000, fp_rate=0.01, seed=1)
    cbf.update(present)
    assert cbf.contains(present).all()
    assert cbf.count == len(present)

    # delete half: deleted items drop out (collisions may retain a few),
    # the kept half must ALL still be present (the no-false-negative law)
    drop, keep = present[:2_500], present[2_500:]
    cbf.delete(drop)
    assert cbf.contains(keep).all()
    assert cbf.count == len(keep)
    still = cbf.contains(drop).mean()
    assert still < 0.05  # only collision-level stale positives

    # absent keys: FP rate near the design target
    absent = rng.integers(1 << 41, 1 << 42, 20_000)
    assert cbf.contains(absent).mean() < 0.02


def test_saturation_never_creates_false_negatives():
    cbf = CountingBloomFilter(num_slots=64, num_hashes=2, seed=3)
    hot = np.array([42], dtype=np.int64)
    for _ in range(300):  # drive its counters to saturation
        cbf.update(hot)
    keeper = np.array([77], dtype=np.int64)
    cbf.update(keeper)
    for _ in range(300):  # delete more times than countable
        cbf.delete(hot)
    # saturated counters were frozen, so the keeper cannot be destroyed
    assert cbf.contains(keeper).all()


def test_merge_bit_identical_and_matches_single_pass():
    rng = np.random.default_rng(11)
    parts = [rng.integers(0, 1 << 40, 2_000) for _ in range(4)]

    def mk(xs):
        c = CountingBloomFilter(num_slots=1 << 14, num_hashes=5, seed=2)
        return c.update(xs)

    ab = mk(parts[0]).merge(mk(parts[1])).merge(mk(parts[2])).merge(mk(parts[3]))
    ba = mk(parts[3]).merge(mk(parts[2])).merge(mk(parts[1])).merge(mk(parts[0]))
    single = mk(np.concatenate(parts))
    assert ab.to_bytes() == ba.to_bytes() == single.to_bytes()

    with pytest.raises(ValueError):
        mk(parts[0]).merge(CountingBloomFilter(num_slots=1 << 13, num_hashes=5, seed=2))


def test_serde_roundtrip():
    cbf = CountingBloomFilter(num_slots=1 << 12, num_hashes=3, seed=5)
    cbf.update(np.arange(100, dtype=np.int64))
    rt = CountingBloomFilter.from_bytes(cbf.to_bytes())
    assert rt.to_bytes() == cbf.to_bytes()
    rt.delete(np.arange(50, dtype=np.int64))
    assert rt.contains(np.arange(50, 100, dtype=np.int64)).all()
