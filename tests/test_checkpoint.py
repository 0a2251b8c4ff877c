"""Checkpoint/resume: interrupted run + resume == unbroken run, bit-for-bit."""

import glob
import json
import os

import numpy as np
import pytest

from approximate_quantiles_ray.engine.udaf import SketchSpec, text_length_transform
from approximate_quantiles_ray.sketches.hll import HLL
from approximate_quantiles_ray.sketches.kll import KLL
from approximate_quantiles_ray.sketches.tdigest import TDigest
from approximate_quantiles_ray.state.checkpoint import CheckpointedSketchJob


def _specs():
    return [
        SketchSpec(
            key="len_td",
            factory=lambda: TDigest(delta=300.0),
            transform=text_length_transform("text"),
        ),
        SketchSpec(
            key="len_kll",
            factory=lambda: KLL(k=100, seed=5),
            transform=text_length_transform("text"),
        ),
        SketchSpec(key="conv_hll", factory=lambda: HLL(p=12, seed=0), on="conv_id", kind="hash"),
    ]


@pytest.fixture(scope="module")
def input_files(transcripts_dir):
    return sorted(glob.glob(transcripts_dir + "/*.parquet"))


def test_unbroken_vs_resumed_bitwise(ray_session, input_files, tmp_path_factory):
    d_full = str(tmp_path_factory.mktemp("ckpt_full"))
    d_resume = str(tmp_path_factory.mktemp("ckpt_resume"))

    full = CheckpointedSketchJob(input_files, _specs(), d_full).run()

    # interrupted: only 3 of 8 shards complete
    job1 = CheckpointedSketchJob(input_files, _specs(), d_resume)
    partial = job1.run(max_shards=3)
    assert job1.metrics()["shards_done"] == 3
    assert partial["len_td"].count < full["len_td"].count

    # resume with a fresh job object (as a new process would)
    job2 = CheckpointedSketchJob(input_files, _specs(), d_resume)
    resumed = job2.run()
    assert job2.metrics()["shards_done"] == len(input_files)

    for key in ("len_td", "len_kll", "conv_hll"):
        assert resumed[key].to_bytes() == full[key].to_bytes(), key


def test_resume_skips_completed(ray_session, input_files, tmp_path):
    d = str(tmp_path / "ckpt")
    job = CheckpointedSketchJob(input_files, _specs(), d)
    job.run()
    # part files' mtimes must not change on a no-op resume
    parts = sorted(glob.glob(d + "/part-*.parquet"))
    mtimes = [os.path.getmtime(p) for p in parts]
    CheckpointedSketchJob(input_files, _specs(), d).run()
    assert [os.path.getmtime(p) for p in parts] == mtimes


def test_lineage_and_metrics(ray_session, input_files, tmp_path):
    d = str(tmp_path / "ckpt")
    job = CheckpointedSketchJob(input_files, _specs(), d)
    merged = job.run()
    with open(job.manifest_path) as f:
        entries = [json.loads(l) for l in f if l.strip()]
    assert len(entries) == len(input_files)
    assert all(e["files"] for e in entries)
    assert all(e["wall_s"] > 0 for e in entries)
    m = job.metrics()
    assert m["shards_done"] == len(input_files)
    assert m["rows"] == merged["len_td"].count


def test_stale_config_invalidates(ray_session, input_files, tmp_path):
    d = str(tmp_path / "ckpt")
    CheckpointedSketchJob(input_files[:2], _specs(), d).run()
    other = [SketchSpec(key="other_td", factory=lambda: TDigest(), on="turn_idx")]
    job = CheckpointedSketchJob(input_files[:2], other, d)
    assert job.completed_shards() == {}


def test_resume_reshards_when_composition_changes(ray_session, tmp_path):
    """Fourth-review regression: changing files_per_shard between runs
    must re-run everything (stale manifest entries no longer match the
    new shard composition) — never silently skip data."""
    import glob

    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts
    from approximate_quantiles_ray.state.checkpoint import CheckpointedSketchJob

    table = ensure_transcripts(8_000, seed=21, n_shards=4)
    files = sorted(glob.glob(table + "/*.parquet"))
    ck = str(tmp_path / "ck")

    job1 = CheckpointedSketchJob(files, _specs(), ck, files_per_shard=1)
    job1.run(max_shards=2)
    assert len(job1.completed_shards()) == 2

    job2 = CheckpointedSketchJob(files, _specs(), ck, files_per_shard=2)
    assert job2.completed_shards() == {}  # stale lineage rejected
    merged = job2.run()
    import pyarrow.dataset as pads

    assert merged["len_td"].count == pads.dataset(table).count_rows()


def test_resume_invalidated_by_sketch_param_change(ray_session, tmp_path):
    """Changing a sketch parameter (encoded in the empty state) must
    invalidate old part files via the config hash."""
    import glob

    from approximate_quantiles_ray.engine.udaf import SketchSpec
    from approximate_quantiles_ray.sketches.tdigest import TDigest
    from approximate_quantiles_ray.sources.transcripts import ensure_transcripts
    from approximate_quantiles_ray.state.checkpoint import CheckpointedSketchJob

    table = ensure_transcripts(8_000, seed=21, n_shards=4)
    files = sorted(glob.glob(table + "/*.parquet"))
    ck = str(tmp_path / "ck2")

    s1 = [SketchSpec(key="td", factory=lambda: TDigest(delta=100), on="turn_idx")]
    CheckpointedSketchJob(files, s1, ck).run(max_shards=2)

    s2 = [SketchSpec(key="td", factory=lambda: TDigest(delta=500), on="turn_idx")]
    job2 = CheckpointedSketchJob(files, s2, ck)
    assert job2.completed_shards() == {}  # different delta → different hash


def test_transform_sig_distinguishes_partials_and_rejects_opaque():
    """cell_sig must fold functools.partial parameters into the
    signature (same partial func, different kwargs → different sigs)
    and refuse objects with no recoverable state instead of collapsing
    them to a type name (round-2 ADVICE item 1)."""
    import functools

    import pytest

    from approximate_quantiles_ray.state.checkpoint import (
        UnsignableTransformError,
        _transform_sig,
    )

    def scale(col, factor):
        return col

    def with_cell(cell):
        def transform(tbl):
            return cell
        return transform

    p1 = _transform_sig(with_cell(functools.partial(scale, factor=2)))
    p2 = _transform_sig(with_cell(functools.partial(scale, factor=3)))
    assert p1 != p2
    assert p1 == _transform_sig(with_cell(functools.partial(scale, factor=2)))

    class WithState:
        __slots__ = ("x",)

        def __init__(self, x):
            self.x = x

    s1 = _transform_sig(with_cell(WithState(1)))
    s2 = _transform_sig(with_cell(WithState(2)))
    assert s1 != s2

    class Opaque:
        __slots__ = ()

        def __getstate__(self):
            raise TypeError("no state")

        def __reduce_ex__(self, proto):
            raise TypeError("unreducible")

    with pytest.raises(UnsignableTransformError):
        _transform_sig(with_cell(Opaque()))


def test_weighted_ddsketch_checkpoint_resume_bitwise(ray_session, input_files, tmp_path):
    """New-sketch coverage: a WEIGHTED DDSketch spec (weight_on) rides
    the checkpoint/resume machinery bit-for-bit — interrupted + resumed
    equals unbroken (the dense-store merge law makes this exact, not
    just within epsilon)."""
    from approximate_quantiles_ray.sketches.ddsketch import DDSketch

    # weight by turn_idx (0-based: first turns carry zero weight —
    # still a valid weighted sketch, and an existing integral column)
    def specs():
        return [
            SketchSpec(
                key="len_dd_w",
                factory=lambda: DDSketch(alpha=0.01),
                transform=text_length_transform("text"),
                weight_on="turn_idx",
            ),
        ]

    d_full = str(tmp_path / "full")
    full = CheckpointedSketchJob(input_files, specs(), d_full).run()
    d_res = str(tmp_path / "resume")
    job1 = CheckpointedSketchJob(input_files, specs(), d_res)
    job1.run(max_shards=1)  # interrupt after one shard
    merged = CheckpointedSketchJob(input_files, specs(), d_res).run()
    assert merged["len_dd_w"].to_bytes() == full["len_dd_w"].to_bytes()
    assert merged["len_dd_w"].count > 0


def test_file_partial_sketcher_scheduling_independent(ray_session, input_files):
    """VERDICT r4: per-file partials are a pure function of the file —
    independent of how paths are batched or ordered — so checkpointed
    states stay bit-stable across runs, sessions, and cluster load."""
    import pyarrow as pa

    from approximate_quantiles_ray.pipelines.transcripts import global_specs
    from approximate_quantiles_ray.state.checkpoint import FilePartialSketcher

    fps = FilePartialSketcher(global_specs(), batch_size=4096)
    # pruned scan: every transform declares requires=("text",)
    assert fps.columns == ["conv_id", "text", "tool"]

    one_by_one = [fps(pa.table({"path": [p]})) for p in input_files]
    all_at_once = fps(pa.table({"path": list(input_files)}))
    reversed_batch = fps(pa.table({"path": list(reversed(input_files))}))

    flat = pa.concat_tables(one_by_one)
    assert flat.column("state").to_pylist() == all_at_once.column("state").to_pylist()
    # order of paths permutes rows but not any per-file state
    assert sorted(flat.column("state").to_pylist()) == sorted(
        reversed_batch.column("state").to_pylist()
    )
    # batch_size changes the fold boundaries → different (still valid)
    # states; determinism claims are always at FIXED batch_size
    fps2 = FilePartialSketcher(global_specs(), batch_size=4096)
    again = fps2(pa.table({"path": list(input_files)}))
    assert again.column("state").to_pylist() == all_at_once.column("state").to_pylist()


def test_file_partial_sketcher_uri_paths(ray_session, input_files):
    """ADVICE r4: FilePartialSketcher must resolve URIs through
    pyarrow.fs (the Ray read path does), not just bare local paths —
    a file:// URI must produce bit-identical states to the plain path."""
    import pyarrow as pa

    from approximate_quantiles_ray.pipelines.transcripts import global_specs
    from approximate_quantiles_ray.state.checkpoint import FilePartialSketcher

    fps = FilePartialSketcher(global_specs(), batch_size=4096)
    plain = fps(pa.table({"path": [input_files[0]]}))
    via_uri = fps(pa.table({"path": ["file://" + input_files[0]]}))
    assert plain.column("state").to_pylist() == via_uri.column("state").to_pylist()
