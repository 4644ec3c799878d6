"""Video codec availability probe.

Capability match of reference workoutdetector/scripts/video_codecs.py:1-8,
which test-writes an mp4 with cv2's h264 fourcc to check what the local
OpenCV build supports. This image's cv2 is a minimal build and ffmpeg is
absent, so the framework's encode/decode paths are pluggable
(data/video.py: native libav decode with cv2 fallback; cv2 writers for
encode) — this probe reports what actually works here, per codec, by
writing and reading back a tiny clip.

Usage: python -m workoutdetector_tpu.scripts.video_codecs
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np

# fourcc/container pairs the framework's writers may be asked for
# (write_video uses mp4v; the serving upload path must *read* whatever
# browsers record: vp8/webm from Chrome, h264/mp4 from Safari)
CANDIDATES = [
    ("mp4v", ".mp4"),
    ("avc1", ".mp4"),
    ("h264", ".mp4"),
    ("vp80", ".webm"),
    ("vp90", ".webm"),
    ("mjpg", ".avi"),
]


def probe_write(fourcc: str, suffix: str) -> bool:
    """True when cv2 can encode AND the frames read back (either reader)."""
    import cv2

    from workoutdetector_tpu.data.video import VideoReader
    frames = np.random.default_rng(0).integers(
        0, 256, size=(4, 32, 48, 3), dtype=np.uint8)
    fd, path = tempfile.mkstemp(suffix=suffix)
    os.close(fd)
    try:
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*fourcc), 30,
                            (48, 32))
        if not w.isOpened():
            return False
        for f in frames:
            w.write(f[..., ::-1])
        w.release()
        if os.path.getsize(path) == 0:
            return False
        with VideoReader(path) as r:
            got = r.read_raw()
        return len(got) == len(frames)
    except Exception:
        return False
    finally:
        if os.path.exists(path):
            os.remove(path)


def probe() -> dict:
    """Probe every candidate; also report decode-path availability."""
    from workoutdetector_tpu.data.video import native_available
    return {
        "native_libav_decode": native_available(),
        "encoders": {f"{fourcc}{suffix}": probe_write(fourcc, suffix)
                     for fourcc, suffix in CANDIDATES},
    }


def main() -> None:
    print(json.dumps(probe(), indent=2))


if __name__ == "__main__":
    main()
