"""Property tests for the distributed quantile_disc selection
(relational.value_histogram + quantiles_from_histogram): many random
datasets × partitionings × extras placements must match the plain
numpy definition value[ max(0, ceil(q*n)-1) ] over sorted(data+extras).
"""

from __future__ import annotations

import math

import numpy as np
import pytest

QS = (0.0, 0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0)


def _reference(values: np.ndarray, qs) -> list[float]:
    s = np.sort(values)
    n = len(s)
    return [float(s[max(0, math.ceil(q * n) - 1)]) for q in qs]


def _run(ray_session, data: np.ndarray, extras: np.ndarray | None, n_parts: int):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import (
        exact_quantiles,
        quantiles_from_histogram,
        value_histogram,
    )

    ds = rd.from_items([{"v": float(x)} for x in data]).repartition(n_parts)
    combined = np.concatenate([data, extras]) if extras is not None and len(extras) else data
    exp = _reference(combined, QS)
    # driver_cap=0 forces the fully distributed sort+summary+fetch path;
    # the default cap exercises the small-histogram local walk — both
    # must match the numpy definition exactly, through both the
    # pre-grouped histogram API and the partial-histogram entry
    # (exact_quantiles, pre_grouped=False)
    for cap in (0, 1 << 22):
        out = quantiles_from_histogram(
            value_histogram(ds, "v"), "v", QS, extra_values=extras, driver_cap=cap
        )
        assert out["q"].tolist() == [float(q) for q in QS]
        assert out["value"].tolist() == exp, f"driver_cap={cap}"
        out2 = exact_quantiles(ds, "v", QS, extra_values=extras, driver_cap=cap)
        assert out2["value"].tolist() == exp, f"exact_quantiles driver_cap={cap}"


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_parts", [1, 3, 8])
def test_matches_numpy_continuous(ray_session, seed, n_parts):
    rng = np.random.default_rng(seed)
    data = rng.standard_normal(400).round(3)  # some duplicates via rounding
    _run(ray_session, data, None, n_parts)


def test_extras_interleave_everywhere(ray_session):
    rng = np.random.default_rng(7)
    data = rng.integers(100, 200, 300).astype(float)
    # extras below, inside (incl. exact duplicates of data values), and above
    extras = np.array([1.0, 2.0, 150.0, 150.0, float(data[0]), 500.0, 501.0])
    _run(ray_session, data, extras, 4)


def test_extras_only(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import (
        quantiles_from_histogram,
        value_histogram,
    )

    ds = rd.from_items([{"v": 1.0}]).filter(lambda r: False)  # empty dataset
    extras = np.array([3.0, 1.0, 2.0])
    out = quantiles_from_histogram(value_histogram(ds, "v"), "v", (0.0, 0.5, 1.0), extras)
    assert out["value"].tolist() == [1.0, 2.0, 3.0]


def test_empty_everything(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import (
        quantiles_from_histogram,
        value_histogram,
    )

    ds = rd.from_items([{"v": 1.0}]).filter(lambda r: False)
    out = quantiles_from_histogram(value_histogram(ds, "v"), "v", (0.5,), None)
    assert len(out) == 0


def test_heavy_duplicates(ray_session):
    # one hot value dominating (skew) + a tail
    data = np.concatenate([np.full(500, 42.0), np.arange(10, dtype=float)])
    _run(ray_session, data, np.array([42.0, 41.0]), 6)


# ------------------------------------------------------- weighted selection


def _weighted_reference(values: np.ndarray, weights: np.ndarray, q_pcts) -> list[float]:
    """Smallest value whose running weight reaches max(1, ceil(qpct·W/100)),
    computed in exact integer arithmetic."""
    order = np.argsort(values)
    v, w = values[order], weights[order].astype(np.int64)
    cum = np.cumsum(w)
    W = int(cum[-1])
    out = []
    for p in q_pcts:
        tgt = max(1, (p * W + 99) // 100)
        out.append(float(v[int(np.searchsorted(cum, tgt))]))
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("n_parts", [1, 7])
def test_weighted_quantiles_match_integer_reference(ray_session, seed, n_parts):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import exact_weighted_quantiles

    rng = np.random.default_rng(seed)
    n = 5_000
    # duplicate-heavy values so the distinct-value histogram actually folds
    vals = np.round(rng.lognormal(3.0, 1.0, n), 1)
    wts = rng.integers(1, 50, n).astype(np.float64)
    q_pcts = (1, 10, 25, 50, 75, 90, 99)
    exp = _weighted_reference(vals, wts, q_pcts)

    ds = rd.from_items(
        [{"v": float(a), "w": float(b)} for a, b in zip(vals, wts)]
    ).repartition(n_parts)
    for cap in (0, 1 << 22):  # distributed AND local-walk paths
        out = exact_weighted_quantiles(ds, "v", "w", q_pcts, driver_cap=cap)
        assert out["value"].tolist() == exp, f"driver_cap={cap}"


def test_weighted_differs_from_unweighted_when_weights_skew(ray_session):
    """One heavy row must drag the weighted median to itself."""
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import (
        exact_quantiles,
        exact_weighted_quantiles,
    )

    vals = np.array([1.0, 2.0, 3.0, 4.0, 1000.0])
    wts = np.array([1.0, 1.0, 1.0, 1.0, 100.0])
    ds = rd.from_items([{"v": float(a), "w": float(b)} for a, b in zip(vals, wts)])
    wq = exact_weighted_quantiles(ds, "v", "w", (50,))
    uq = exact_quantiles(ds, "v", (0.5,))
    assert wq["value"].tolist() == [1000.0]
    assert uq["value"].tolist() == [3.0]


def test_weighted_rejects_fractional_weights(ray_session):
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.relational import exact_weighted_quantiles

    ds = rd.from_items([{"v": 1.0, "w": 1.5}])
    with pytest.raises(Exception, match="integral"):
        exact_weighted_quantiles(ds, "v", "w", (50,))


def test_weighted_sketches_track_exact_weighted_oracle(ray_session):
    """SketchSpec(weight_on=...): the weighted t-digest and DDSketch
    paths must land within their guarantees of the exact weighted
    selection on the same data."""
    from approximate_quantiles_ray.pipelines.relational import (
        exact_weighted_quantiles,
        lineitem_weighted_price_sketch,
    )
    from approximate_quantiles_ray.sources.read import read_parquet_sized

    sf = "/root/testdata/sf0.01"
    approx = lineitem_weighted_price_sketch(sf)
    ds = read_parquet_sized(
        f"{sf}/lineitem.parquet", columns=["l_extendedprice", "l_quantity"]
    )
    exact = exact_weighted_quantiles(
        ds, "l_extendedprice", "l_quantity", (10, 25, 50, 75, 90, 95, 99)
    )
    for (_, a), (_, e) in zip(approx.iterrows(), exact.iterrows()):
        true = e["value"]
        assert abs(a["ddsketch_est"] - true) <= 0.0101 * true, (a["q"], true)
        assert abs(a["tdigest_est"] - true) <= 0.01 * true, (a["q"], true)


def test_update_weighted_equals_repeated_update():
    """w integer repeats == one weighted add (DDSketch bit-identical;
    t-digest within epsilon — compaction order differs)."""
    import numpy as np

    from approximate_quantiles_ray.sketches.ddsketch import DDSketch
    from approximate_quantiles_ray.sketches.tdigest import TDigest

    rng = np.random.default_rng(31)
    vals = rng.lognormal(3.0, 1.0, 3_000)
    wts = rng.integers(1, 6, 3_000)
    rep = np.repeat(vals, wts)

    dd_w = DDSketch(alpha=0.01).update_weighted(vals, wts)
    dd_r = DDSketch(alpha=0.01).update(rep)
    assert dd_w.to_bytes() == dd_r.to_bytes()

    td_w = TDigest(delta=2000, scale="k2").update_weighted(vals, wts.astype(float))
    td_r = TDigest(delta=2000, scale="k2").update(rep)
    assert td_w.count == td_r.count == len(rep)
    for q in (0.01, 0.25, 0.5, 0.75, 0.99):
        a, b = td_w.est_value_at_quantile(q), td_r.est_value_at_quantile(q)
        assert abs(a - b) <= 0.01 * abs(b), (q, a, b)

    with pytest.raises(ValueError):
        DDSketch().update_weighted(vals[:4], np.array([1.0, 2.5, 1.0, 1.0]))
