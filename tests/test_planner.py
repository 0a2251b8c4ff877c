"""Sketch-assisted planner: HLL distinct estimates drive join-strategy
choice; CMS heavy hitters drive targeted salting that still matches the
direct groupby exactly."""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pyarrow as pa
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from approximate_quantiles_ray.engine.planner import (
    choose_semi_join_strategy,
    detect_hot_keys,
    estimate_distinct,
)


def _zipf_ds(n=60_000, seed=3):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    # two planted hot keys (~25% and ~12% of rows) over a long tail
    keys = rng.integers(100, 5000, size=n)
    hot = rng.random(n)
    keys[hot < 0.25] = 1
    keys[(hot >= 0.25) & (hot < 0.37)] = 2
    return rd.from_arrow(
        pa.table({"k": keys.astype(np.int64), "v": rng.random(n)})
    ).repartition(8), keys


def test_estimate_distinct_accuracy(ray_session):
    ds, keys = _zipf_ds()
    est = estimate_distinct(ds, "k")
    exact = len(np.unique(keys))
    assert abs(est - exact) / exact < 0.03


def test_join_strategy_flips_with_cap(ray_session):
    ds, keys = _zipf_ds()
    exact = len(np.unique(keys))
    strat, est = choose_semi_join_strategy(ds, "k", broadcast_key_cap=exact * 10)
    assert strat == "broadcast"
    strat2, est2 = choose_semi_join_strategy(ds, "k", broadcast_key_cap=exact // 10)
    assert strat2 == "shuffle"
    assert est == est2  # same sketch, same estimate


def test_detect_hot_keys_finds_planted(ray_session):
    ds, keys = _zipf_ds()
    hot = detect_hot_keys(ds, "k", share_permille=50)
    hot_set = {int(h) for h in hot}
    assert {1, 2} <= hot_set
    # no long-tail key is ~5% of rows — CMS over-estimation may admit
    # at most a stray key or two, never the tail wholesale
    assert len(hot_set) <= 4


def test_targeted_salting_matches_direct(ray_session):
    """grouped_sketches_salted(hot_keys=...) must agree with the
    unsalted grouped fold: counts exactly, HLL states bit-equal (HLL
    merge is commutative-idempotent so salting cannot change it)."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import (
        SketchSpec,
        grouped_sketches_salted,
    )
    from approximate_quantiles_ray.sketches.base import sketch_from_bytes
    from approximate_quantiles_ray.sketches.hll import HLL

    rng = np.random.default_rng(11)
    n = 20_000
    grp = np.where(rng.random(n) < 0.5, "hot", rng.choice(["a", "b", "c"], n))
    ds = rd.from_arrow(
        pa.table({"g": grp, "u": rng.integers(0, 2000, n).astype(np.int64)})
    ).repartition(8)
    specs = [
        SketchSpec(key="hll", factory=lambda: HLL(p=12, seed=9), on="u", kind="hash")
    ]
    blanket = grouped_sketches_salted(ds, "g", specs, salt=8)
    targeted = grouped_sketches_salted(ds, "g", specs, salt=8, hot_keys=["hot"])
    assert list(blanket["g"]) == list(targeted["g"])
    for sb, st in zip(blanket["hll"], targeted["hll"]):
        a, b = sketch_from_bytes(sb), sketch_from_bytes(st)
        assert a.estimate() == pytest.approx(b.estimate(), rel=0, abs=0)
