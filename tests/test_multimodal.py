"""Multimodal plumbing: schemas, tensor layouts, determinism of the
stubbed decode, and actor-pool stage wiring through a real Dataset."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.pipelines.multimodal import (
    AudioFeatures,
    FrameSampler,
    ImageDecodeResize,
    decode_image_stub,
    media_pipeline,
    synth_media_table,
)


def test_decode_stub_deterministic():
    t = synth_media_table(6, seed=1)
    p = t.column("payload")[0].as_py()
    a = decode_image_stub(p, 20, 10)
    b = decode_image_stub(p, 20, 10)
    assert a.shape == (10, 20, 3) and a.dtype == np.uint8
    np.testing.assert_array_equal(a, b)
    c = decode_image_stub(t.column("payload")[3].as_py(), 20, 10)
    assert not np.array_equal(a, c)


@pytest.fixture(scope="module")
def media_ds(ray_session):
    import ray.data as rd

    return rd.from_arrow(synth_media_table(60, seed=3)).repartition(5)


def test_image_stage(media_ds):
    out = media_pipeline(media_ds, "image", ImageDecodeResize, target=16).to_pandas()
    assert len(out) == 20
    assert set(out.columns) == {"media_id", "pixels", "codec"}
    px = np.stack(out["pixels"].to_numpy())
    assert px.shape == (20, 16 * 16 * 3)
    # partition-count independence (determinism across layouts)
    import ray.data as rd

    out2 = media_pipeline(
        rd.from_arrow(synth_media_table(60, seed=3)).repartition(2),
        "image",
        ImageDecodeResize,
        target=16,
    ).to_pandas()
    a = out.sort_values("media_id").reset_index(drop=True)
    b = out2.sort_values("media_id").reset_index(drop=True)
    np.testing.assert_array_equal(np.stack(a["pixels"]), np.stack(b["pixels"]))


def test_audio_stage(media_ds):
    out = media_pipeline(media_ds, "audio", AudioFeatures, frame=256, n_frames=10).to_pandas()
    assert len(out) == 20
    rms = np.stack(out["rms"].to_numpy())
    assert rms.shape == (20, 10)
    assert (rms >= 0).all() and (rms <= 1.2).all()


def test_video_stage(media_ds):
    out = media_pipeline(media_ds, "video", FrameSampler, stride=4, max_frames=8).to_pandas()
    assert set(out.columns) == {"media_id", "frame_idx", "mean_intensity", "codec"}
    assert (out["frame_idx"] % 4 == 0).all()
    # every video contributed ≥1 sampled frame
    assert out["media_id"].nunique() == 20
    assert out["mean_intensity"].between(0, 255).all()
