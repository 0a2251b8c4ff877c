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
