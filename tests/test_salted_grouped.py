"""Salted two-stage grouped merge must agree with the direct groupby
(counts exactly; estimates within sketch tolerance)."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.engine.udaf import (
    SketchSpec,
    grouped_sketches,
    grouped_sketches_salted,
    text_length_transform,
)
from approximate_quantiles_ray.sketches.base import sketch_from_bytes
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.tdigest import TDigest
from approximate_quantiles_ray.sources.transcripts import ensure_transcripts


@pytest.fixture(scope="module")
def specs():
    text_len = text_length_transform("text")
    return [
        SketchSpec(key="len_td", factory=lambda: TDigest(delta=300, scale="k2"), transform=text_len),
        SketchSpec(key="conv_hll", factory=lambda: HLL(p=14, seed=5), on="conv_id", kind="hash"),
    ]


def test_salted_matches_direct(ray_session, specs):
    import ray.data as rd

    table = ensure_transcripts(20_000, seed=13, n_shards=4)
    # role is the canonical hot-key case: 4 values over 20k rows
    ds = rd.read_parquet(table, columns=["role", "conv_id", "text"])
    direct = grouped_sketches(ds, "role", specs).to_pandas().set_index("role")
    ds2 = rd.read_parquet(table, columns=["role", "conv_id", "text"])
    salted = grouped_sketches_salted(ds2, "role", specs, salt=8).set_index("role")

    assert sorted(direct.index) == sorted(salted.index)
    for role in direct.index:
        td_a = sketch_from_bytes(direct.loc[role, "len_td"])
        td_b = sketch_from_bytes(salted.loc[role, "len_td"])
        assert td_a.count == td_b.count  # counts conserve exactly
        for q in (0.1, 0.5, 0.9, 0.99):
            a, b = td_a.est_value_at_quantile(q), td_b.est_value_at_quantile(q)
            assert b == pytest.approx(a, rel=0.02, abs=2.0), (role, q)
        hll_a = sketch_from_bytes(direct.loc[role, "conv_hll"])
        hll_b = sketch_from_bytes(salted.loc[role, "conv_hll"])
        # HLL registers are max-merged → identical regardless of split
        np.testing.assert_array_equal(hll_a.registers, hll_b.registers)
