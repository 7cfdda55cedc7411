"""Raw-video container codec (stdlib-only) — the VIDEO analog of
``pngcodec.py`` (image) and ``wavcodec.py`` (audio), completing the
image/audio/video modality triad with the same design rules:

- payloads are REAL container bytes, not pickled arrays: a header the
  decoder validates plus packed pixel data, so the Arrow batch path
  exercises genuine encode -> binary column -> decode round-trips;
- everything downstream of decode is integer arithmetic a SQL oracle
  replays verbatim (per-frame pixel sums, adjacent-frame absolute
  difference) — no floats, no library-version drift.

Container format ``RVID``: magic ``b'RVID'`` + ``<HHH`` little-endian
(n_frames, height, width) + ``n_frames * height * width`` bytes of
8-bit greyscale frames, frame-major row-major.  A real pipeline swaps
this codec for an ffmpeg/PyAV seam (the LibraryCodec pattern in
operators/multimodal.py); the container here keeps the fixture
self-contained while the Spark-side plumbing — schema, batching,
per-frame explode, temporal diff — is identical either way.

Reference parity: the reference has no video path; this extends the
multimodal surface the brief mandates (frame-sample / decode /
feature-extract over opaque binary columns).
"""

from __future__ import annotations

import struct

import numpy as np

MAGIC = b"RVID"
_HEADER = struct.Struct("<4sHHH")


def encode_rvid(frames: np.ndarray) -> bytes:
    """Pack (n_frames, h, w) uint8 greyscale frames into an RVID
    container."""
    if frames.ndim != 3:
        raise ValueError(f"frames must be (n, h, w), got shape {frames.shape}")
    if frames.dtype != np.uint8:
        raise ValueError(f"frames must be uint8, got {frames.dtype}")
    n, h, w = frames.shape
    if max(n, h, w) > 0xFFFF:
        raise ValueError(
            f"dimension exceeds the container's u16 header: {(n, h, w)}"
        )
    return _HEADER.pack(MAGIC, n, h, w) + frames.tobytes()


def decode_rvid(payload: bytes) -> np.ndarray:
    """Unpack an RVID container back to (n_frames, h, w) uint8."""
    magic, n, h, w = _HEADER.unpack_from(payload, 0)
    if magic != MAGIC:
        raise ValueError(f"bad magic {magic!r}")
    body = payload[_HEADER.size :]
    if len(body) != n * h * w:
        raise ValueError(f"expected {n * h * w} pixel bytes, got {len(body)}")
    return np.frombuffer(body, dtype=np.uint8).reshape(n, h, w)


def frame_pixel_sums(frames: np.ndarray) -> np.ndarray:
    """int64 per-frame total brightness (sum of pixels)."""
    return frames.reshape(frames.shape[0], -1).astype(np.int64).sum(axis=1)


def frame_abs_diffs(frames: np.ndarray) -> np.ndarray:
    """int64 sum of per-pixel |frame_f - frame_{f-1}| for f >= 1 (the
    temporal-gradient scene-change signal); length n_frames - 1."""
    flat = frames.reshape(frames.shape[0], -1).astype(np.int64)
    return np.abs(flat[1:] - flat[:-1]).sum(axis=1)
