"""Real media codecs implementable without external libraries.

The container has no libjpeg/ffmpeg/soundfile, but several production
formats are pure-structure and decode exactly with numpy + stdlib:

- **BMP** (24-bit uncompressed, the Windows DIB format): 14-byte file
  header + 40-byte BITMAPINFOHEADER, BGR pixel rows padded to 4-byte
  boundaries, stored bottom-up.
- **PPM (P6)**: ASCII header ``P6 <w> <h> 255`` + raw RGB bytes.
- **WAV** (PCM16 mono/stereo) via the stdlib ``wave`` module.
- **AQV**: a minimal length-prefixed video container (magic + frame
  count + per-frame BMP blobs) — honest stand-in for a real demuxer;
  each frame decodes through the real BMP path.

``decode_image`` / ``decode_audio`` / ``decode_video_frames`` sniff
magic bytes and raise ``UnsupportedCodec`` for formats that need the
absent native libs (JPEG/PNG/MP3/H.264) — callers choose whether to
fall back to the deterministic stub (pipelines/multimodal.py does, and
labels the result).
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class UnsupportedCodec(ValueError):
    """Payload is a format that needs a native codec not in this
    container — OR is malformed/truncated. The sniffing decoders in
    pipelines/multimodal.py catch exactly this type for stub fallback,
    so every parse failure inside a decoder must surface as it."""


def _codec_errors(fn):
    """Convert internal parse failures (wave.Error for RIFF-but-not-PCM,
    struct.error / ValueError / IndexError on truncated or malformed
    headers) into UnsupportedCodec so the sniff→fallback contract holds."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except UnsupportedCodec:
            raise
        except (ValueError, struct.error, wave.Error, EOFError, IndexError) as e:
            raise UnsupportedCodec(f"{fn.__name__}: malformed payload ({e})") from e

    return wrapped


# ----------------------------------------------------------------------- BMP


def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit uncompressed BMP bytes."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    # rows bottom-up, channels BGR, each row padded to 4 bytes
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + pixel_bytes, 0, 0, 14 + 40)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    return header + info + rows.tobytes()


@_codec_errors
def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes → (h, w, 3) uint8 RGB."""
    if payload[:2] != b"BM":
        raise UnsupportedCodec("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise UnsupportedCodec(f"BMP header size {header_size} unsupported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise UnsupportedCodec(f"BMP bpp={bpp} compression={compression} unsupported")
    bottom_up = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, np.uint8, count=row_size * h, offset=data_offset)
    rows = rows.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    img = rows[:, :, ::-1]  # BGR → RGB
    return img[::-1] if bottom_up else img


# ----------------------------------------------------------------------- PPM


def encode_ppm(img: np.ndarray) -> bytes:
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


@_codec_errors
def decode_ppm(payload: bytes) -> np.ndarray:
    if payload[:2] != b"P6":
        raise UnsupportedCodec("not a P6 PPM payload")
    # header: three whitespace-separated fields after P6 (comments with #)
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise UnsupportedCodec("only 8-bit PPM supported")
    return np.frombuffer(payload, np.uint8, count=w * h * 3, offset=pos).reshape(h, w, 3)


# ----------------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """float waveform in [-1, 1] (n,) or (n, channels) → PCM16 WAV bytes."""
    x = np.asarray(samples, np.float64)
    if x.ndim == 1:
        x = x[:, None]
    pcm = np.clip(np.round(x * 32767.0), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(x.shape[1])
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


@_codec_errors
def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """PCM16 WAV bytes → (float32 waveform in [-1, 1] shaped (n,) mono /
    (n, ch) multichannel, sample_rate)."""
    if payload[:4] != b"RIFF":
        raise UnsupportedCodec("not a RIFF/WAV payload")
    with wave.open(io.BytesIO(payload), "rb") as f:
        if f.getsampwidth() != 2:
            raise UnsupportedCodec("only PCM16 WAV supported")
        n, ch, rate = f.getnframes(), f.getnchannels(), f.getframerate()
        raw = np.frombuffer(f.readframes(n), "<i2").astype(np.float32) / 32767.0
    return (raw if ch == 1 else raw.reshape(-1, ch)), rate


# ------------------------------------------------------------------ AQV video

_AQV_MAGIC = b"AQV1"


def encode_aqv(frames: np.ndarray) -> bytes:
    """(n_frames, h, w, 3) uint8 → length-prefixed BMP-frame container."""
    parts = [_AQV_MAGIC, struct.pack("<I", len(frames))]
    for fr in frames:
        blob = encode_bmp(fr)
        parts.append(struct.pack("<I", len(blob)))
        parts.append(blob)
    return b"".join(parts)


@_codec_errors
def decode_aqv(payload: bytes) -> np.ndarray:
    if payload[:4] != _AQV_MAGIC:
        raise UnsupportedCodec("not an AQV payload")
    n = struct.unpack_from("<I", payload, 4)[0]
    pos, frames = 8, []
    for _ in range(n):
        size = struct.unpack_from("<I", payload, pos)[0]
        pos += 4
        frames.append(decode_bmp(payload[pos : pos + size]))
        pos += size
    return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
