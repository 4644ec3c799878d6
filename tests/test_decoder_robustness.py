"""Native decoder robustness: malformed inputs must fail gracefully.

The C++ libav decoder (native/decoder.cc) backs every video ingest path
(serving uploads included, serve/server.py POST /video), so corrupt or
truncated bytes arriving from the network must produce Python-level
errors or partial frames — never a crash. The reference feeds cv2
directly (utils/inference_count.py:218) and inherits its tolerance;
these tests pin ours.
"""

import os

import numpy as np
import pytest

from workoutdetector_tpu.data.video import VideoReader


def _write(tmp_path, name, data: bytes) -> str:
    p = tmp_path / name
    p.write_bytes(data)
    return str(p)


def _real_mp4(tmp_path, frames=32) -> str:
    import cv2
    path = str(tmp_path / "ok.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 24, (64, 48))
    rng = np.random.default_rng(0)
    for i in range(frames):
        w.write(rng.integers(0, 255, (48, 64, 3), dtype=np.uint8))
    w.release()
    return path


def test_missing_file_raises():
    with pytest.raises(FileNotFoundError):
        VideoReader("/nonexistent/clip.mp4")


def test_empty_file(tmp_path):
    path = _write(tmp_path, "empty.mp4", b"")
    try:
        r = VideoReader(path)
    except IOError:
        return  # rejected at open: fine
    frames = r.read_prepped(scale=64, crop=48)
    assert frames.shape[0] == 0


def test_random_bytes(tmp_path):
    rng = np.random.default_rng(1)
    path = _write(tmp_path, "garbage.mp4", rng.bytes(1 << 16))
    try:
        r = VideoReader(path)
    except IOError:
        return
    frames = r.read_prepped(scale=64, crop=48)
    assert frames.shape[0] == 0


def test_truncated_mp4(tmp_path):
    """Half an mp4: the moov atom may be missing or the mdat cut short —
    either open fails or a frame prefix decodes; no crash, no negative
    count, frames (if any) have the requested geometry."""
    whole = open(_real_mp4(tmp_path), "rb").read()
    for frac in (0.1, 0.5, 0.9):
        path = _write(tmp_path, f"trunc_{frac}.mp4",
                      whole[:int(len(whole) * frac)])
        try:
            r = VideoReader(path)
        except IOError:
            continue
        frames = r.read_prepped(scale=64, crop=48)
        assert frames.shape[0] >= 0
        if frames.shape[0]:
            assert frames.shape[1:] == (48, 48, 3)


def test_bitflipped_mp4_body(tmp_path):
    """Corrupt the mdat payload (headers intact): decoders typically
    emit garbage pixels or stop early; the wrapper must return a valid
    (N, crop, crop, 3) array either way."""
    data = bytearray(open(_real_mp4(tmp_path), "rb").read())
    rng = np.random.default_rng(2)
    body = range(len(data) // 2, len(data) - 1)
    for i in rng.choice(list(body), size=min(200, len(data) // 4),
                        replace=False):
        data[i] ^= 0xFF
    path = _write(tmp_path, "bitflip.mp4", bytes(data))
    try:
        r = VideoReader(path)
    except IOError:
        return
    frames = r.read_prepped(scale=64, crop=48)
    assert frames.ndim == 4 and frames.dtype == np.uint8
    assert frames.shape[0] <= 64


def test_overstated_then_real_read(tmp_path):
    """A good file read twice through fresh readers returns identical
    frames (no state leaks across handles)."""
    path = _real_mp4(tmp_path, frames=12)
    a = VideoReader(path).read_prepped(scale=64, crop=48)
    b = VideoReader(path).read_prepped(scale=64, crop=48)
    assert a.shape == b.shape == (12, 48, 48, 3)
    np.testing.assert_array_equal(a, b)
