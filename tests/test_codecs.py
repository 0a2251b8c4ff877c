"""Real codecs (functions/codecs.py): exact encode→decode round-trips,
magic-byte sniffing, and the REAL decode path through the Ray stages."""

from __future__ import annotations

import numpy as np
import pytest

from approximate_quantiles_ray.functions import codecs
from approximate_quantiles_ray.functions.codecs import UnsupportedCodec


def test_bmp_round_trip_exact():
    rng = np.random.default_rng(3)
    for h, w in ((1, 1), (7, 5), (16, 33), (40, 17)):  # odd widths hit row padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = codecs.decode_bmp(codecs.encode_bmp(img))
        np.testing.assert_array_equal(out, img)


def test_ppm_round_trip_exact():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


def test_wav_round_trip_pcm16():
    rng = np.random.default_rng(5)
    x = rng.uniform(-1, 1, 2048)
    out, rate = codecs.decode_wav(codecs.encode_wav(x, 8000))
    assert rate == 8000 and out.shape == (2048,)
    # PCM16 quantization error bound: 1/32767
    assert np.abs(out - x).max() <= 1.0 / 32767 + 1e-9
    # stereo shape
    st, _ = codecs.decode_wav(codecs.encode_wav(rng.uniform(-1, 1, (100, 2)), 44100))
    assert st.shape == (100, 2)


def test_aqv_round_trip_exact():
    rng = np.random.default_rng(6)
    frames = rng.integers(0, 256, (5, 6, 7, 3), dtype=np.uint8)
    np.testing.assert_array_equal(codecs.decode_aqv(codecs.encode_aqv(frames)), frames)


def test_unsupported_raises():
    junk = b"\x89PNG\r\n\x1a\nnotapng"
    for fn in (codecs.decode_bmp, codecs.decode_ppm, codecs.decode_aqv):
        with pytest.raises(UnsupportedCodec):
            fn(junk)
    with pytest.raises(UnsupportedCodec):
        codecs.decode_wav(junk)


def test_sniffing_decoders_label_codec():
    from approximate_quantiles_ray.pipelines.multimodal import (
        decode_audio,
        decode_image,
        decode_video_frames,
    )

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    got, codec = decode_image(codecs.encode_bmp(img), 8, 8)
    assert codec == "bmp"
    np.testing.assert_array_equal(got, img)
    _, codec = decode_image(b"\xff\xd8\xff\xe0 fake jpeg", 8, 8)
    assert codec == "stub"

    wav, codec = decode_audio(codecs.encode_wav(np.zeros(100), 16000), 256)
    assert codec == "wav" and wav.shape == (256,)  # padded to n_samples
    _, codec = decode_audio(b"ID3 fake mp3", 256)
    assert codec == "stub"

    frames = rng.integers(0, 256, (3, 4, 4, 3), dtype=np.uint8)
    got, codec = decode_video_frames(codecs.encode_aqv(frames), 4, 4, 3)
    assert codec == "aqv"
    np.testing.assert_array_equal(got, frames)


def test_real_payload_pipeline_end_to_end(ray_session):
    """synth_media_table(real_payloads=True) → every stage decodes REAL
    bytes (codec column never 'stub') and the image resize output
    matches a local decode+resize exactly."""
    import ray.data as rd

    from approximate_quantiles_ray.pipelines.multimodal import (
        AudioFeatures,
        FrameSampler,
        ImageDecodeResize,
        media_pipeline,
        synth_media_table,
    )

    tbl = synth_media_table(18, seed=9, real_payloads=True)
    ds = rd.from_arrow(tbl).repartition(3)

    img_out = media_pipeline(ds, "image", ImageDecodeResize, target=16).to_pandas()
    assert len(img_out) == 6 and set(img_out["codec"]) == {"bmp"}
    # exact check for one image
    row = tbl.to_pylist()[0]
    img = codecs.decode_bmp(row["payload"])
    t = 16
    ys = (np.arange(t) * img.shape[0] // t).astype(np.int64)
    xs = (np.arange(t) * img.shape[1] // t).astype(np.int64)
    exp = img[ys][:, xs].ravel()
    got = np.asarray(
        img_out.set_index("media_id").loc[row["media_id"], "pixels"], dtype=np.uint8
    )
    np.testing.assert_array_equal(got, exp)

    aud_out = media_pipeline(ds, "audio", AudioFeatures).to_pandas()
    assert len(aud_out) == 6 and set(aud_out["codec"]) == {"wav"}

    vid_out = media_pipeline(ds, "video", FrameSampler).to_pandas()
    assert set(vid_out["codec"]) == {"aqv"} and len(vid_out) > 0
