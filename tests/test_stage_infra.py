"""Unit tests for the round-2 stage infrastructure: size-aware reads
(sources/read.py) and worker-cached task stages (engine/stages.py)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest


def test_read_parquet_sized_block_count(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.sources.read import read_parquet_sized

    tbl = pa.table({"x": np.arange(10_000)})
    pq.write_table(tbl, tmp_path / "part0.parquet")
    ds = read_parquet_sized(str(tmp_path)).materialize()
    # tiny input → floored at the cluster CPU count, not Ray's ~200
    import ray

    ncpu = int(ray.cluster_resources()["CPU"])
    assert ds.num_blocks() == ncpu
    assert ds.count() == 10_000


def test_read_parquet_sized_unstattable_falls_back(ray_session, tmp_path):
    """A path whose size can't be derived must defer to Ray's planner
    rather than forcing ncpu giant blocks (review finding r2)."""
    import pyarrow.parquet as pq

    from approximate_quantiles_ray.sources.read import read_parquet_sized

    # extension the walker doesn't count → _input_bytes == 0 → fallback
    pq.write_table(pa.table({"x": [1, 2, 3]}), tmp_path / "data.pq")
    ds = read_parquet_sized(str(tmp_path / "data.pq"))
    assert ds.count() == 3


class _CountingStage:
    instances = 0

    def __init__(self, mult: int = 2):
        type(self).instances += 1
        self.mult = mult

    def __call__(self, tbl: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return tbl.set_column(0, "x", pc.multiply(tbl.column("x"), self.mult))


def test_worker_cached_stage_builds_once_per_key():
    from approximate_quantiles_ray.engine.stages import _CACHE, worker_cached_stage

    _CACHE.clear()
    _CountingStage.instances = 0
    fn = worker_cached_stage(_CountingStage, mult=3)
    t = pa.table({"x": [1, 2]})
    out1 = fn(t)
    out2 = fn(t)
    assert out1.column("x").to_pylist() == [3, 6] == out2.column("x").to_pylist()
    assert _CountingStage.instances == 1  # cached after first build
    # different ctor args → different instance
    fn2 = worker_cached_stage(_CountingStage, mult=5)
    assert fn2(t).column("x").to_pylist() == [5, 10]
    assert _CountingStage.instances == 2


def test_worker_cached_stage_rejects_local_classes():
    from approximate_quantiles_ray.engine.stages import worker_cached_stage

    class Local:
        def __call__(self, t):
            return t

    with pytest.raises(AssertionError):
        worker_cached_stage(Local)


def test_worker_cached_stage_rejects_unsafe_cache_keys():
    """Ctor kwargs whose repr is not value-faithful (numpy arrays etc.)
    must be rejected, not silently repr-keyed (round-2 ADVICE item 4)."""
    import numpy as np
    import pytest

    from approximate_quantiles_ray.engine.stages import worker_cached_stage
    from approximate_quantiles_ray.pipelines.dedup import MinHasher

    with pytest.raises(TypeError, match="ray.put"):
        worker_cached_stage(MinHasher, seed=np.arange(10_000))
    # scalars / strings / tuples stay accepted
    worker_cached_stage(MinHasher, seed=7, text_col="text")


def test_stage_fn_does_not_ship_driver_cache(ray_session, transcripts_dir):
    """Regression (round-3): stage_fn is cloudpickled by value; it must
    NOT capture the driver's _CACHE contents into the task spec. Poison
    the driver cache with an instance of a test-local (worker-
    unimportable) class, then run a real worker_cached_stage through
    map_batches on workers — before the fix this failed to deserialize
    with ModuleNotFoundError on the test module."""
    import ray.data as rd

    from approximate_quantiles_ray.engine.stages import _CACHE, worker_cached_stage

    _CACHE["poison"] = _CountingStage(7)  # test-module class instance
    try:
        from approximate_quantiles_ray.pipelines.textstats import QualityScorer

        fn = worker_cached_stage(QualityScorer, text_col="text")
        ds = rd.from_items([{"text": "the quick brown fox"}] * 50).map_batches(
            fn, batch_format="pyarrow"
        )
        assert ds.count() == 50
    finally:
        _CACHE.pop("poison", None)
