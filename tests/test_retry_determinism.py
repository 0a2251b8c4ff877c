"""Fault-tolerance law: a worker that DIES mid-pipeline (the OOM-kill
shape) must not change the answer — the retried task's block counts
exactly once (no loss, no double count) and the sketch estimates stay
within the sketch's own ε of a clean run. Bit-equality is deliberately
NOT asserted here: the streaming driver fold merges partials in
arrival order, which retries legitimately permute — the bit-level
determinism laws live in the merge-permutation tests, at fixed merge
order."""

from __future__ import annotations

import os
import sys
import uuid
from pathlib import Path

import numpy as np
import pyarrow as pa

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_task_retry_gives_bit_identical_sketches(ray_session, tmp_path):
    import ray.data as rd

    from approximate_quantiles_ray.engine.udaf import (
        SketchSpec,
        sketch_columns_streaming,
    )
    from approximate_quantiles_ray.sketches.kll import KLL
    from approximate_quantiles_ray.sketches.tdigest import TDigest

    rng = np.random.default_rng(17)
    vals = rng.lognormal(0.0, 1.0, 200_000)
    ds = rd.from_arrow(pa.table({"v": vals})).repartition(16)

    # crash exactly one task attempt, globally, via an atomic marker —
    # a hard worker death (os._exit, the OOM-kill shape), which Ray
    # core retries by lineage; user exceptions are deliberately NOT
    # retried by Ray Data, so a plain raise would not test recovery
    marker = str(tmp_path / f"crash-once-{uuid.uuid4().hex}")

    def flaky(tbl: pa.Table) -> pa.Table:
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            os._exit(1)  # simulate the worker being killed mid-task
        except FileExistsError:
            return tbl

    specs = [
        SketchSpec(key="td", factory=lambda: TDigest(300), on="v"),
        SketchSpec(key="kll", factory=lambda: KLL(64), on="v"),
    ]
    flaky_ds = ds.map_batches(flaky, batch_format="pyarrow", zero_copy_batch=True)
    with_retry = sketch_columns_streaming(flaky_ds, specs)
    assert os.path.exists(marker), "the injected failure never fired"

    clean = sketch_columns_streaming(ds, specs)
    for k in ("td", "kll"):
        # EXACTLY-ONCE: the crashed task's block is neither lost nor
        # double-counted by the retry
        assert with_retry[k].count == clean[k].count == len(vals)
    # RANK error (the sketches' actual guarantee; value error on a
    # lognormal tail is amplified by the density and is not the bound)
    exact = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        true = exact[min(len(exact) - 1, int(round(q * len(exact))))]
        for k in ("td", "kll"):
            est_q = with_retry[k].est_quantile_at_value(true)
            assert abs(est_q - q) < 0.03, (k, q, est_q)
