"""Native JPEG decode for the rawframe input pipeline (native/jpeg.cc).

The reference's dataset hot loop reads num_segments JPEGs per item with
torchvision.io/cv2 (reference workoutdetector/datasets/common.py:99-117,
SURVEY §3.1 "HOT LOOP (worker procs)"). This wrapper exposes the C++
libjpeg path:

  * ``read_image(path)`` — full-resolution RGB decode (drop-in for
    cv2.imread+cvtColor).
  * ``read_batch_prepped(paths, scale, crop)`` — whole clip decoded on a
    C++ thread pool with libjpeg DCT prescaling and the in-decoder
    resize(short=scale)→center-crop(crop) geometry of
    ``VideoReader.read_prepped`` — Python never touches non-final pixels.

Every entry point falls back to the cv2/host-transform path per file, so
non-JPEG inputs (png/webp in image folders) and exotic JPEGs (CMYK) keep
working. ``WD_TPU_JPEG_LIB=`` (empty) disables the native path.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

from workoutdetector_tpu.settings import NATIVE_JPEG_LIB

_LIB: Optional[ctypes.CDLL] = None
_LIB_FAILED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    if not NATIVE_JPEG_LIB or not os.path.exists(NATIVE_JPEG_LIB):
        _LIB_FAILED = True
        return None
    try:
        lib = ctypes.CDLL(NATIVE_JPEG_LIB)
        ip = ctypes.POINTER(ctypes.c_int)
        lib.wdj_dims.argtypes = [ctypes.c_char_p, ip, ip]
        lib.wdj_dims.restype = ctypes.c_int
        lib.wdj_decode_mem.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_void_p, ctypes.c_long,
            ip, ip]
        lib.wdj_decode_mem.restype = ctypes.c_int
        lib.wdj_decode_batch_prepped.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int]
        lib.wdj_decode_batch_prepped.restype = ctypes.c_int
        _LIB = lib
    except OSError:
        _LIB_FAILED = True
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _is_jpeg(path: str) -> bool:
    return path.lower().endswith((".jpg", ".jpeg"))


def read_image(path: str) -> Optional[np.ndarray]:
    """Full-resolution RGB uint8 (H, W, 3) via libjpeg, or None when the
    native path can't take this file (caller falls back to cv2 — which
    also covers EXIF-rotated JPEGs: the C decoder rejects them so cv2's
    orientation handling applies). One disk read: the bytes feed both
    the dims probe and the decode."""
    lib = _load()
    if lib is None or not _is_jpeg(path):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_bytes(data)


def decode_bytes(data: bytes) -> Optional[np.ndarray]:
    """RGB uint8 decode of in-memory JPEG bytes (serving upload path)."""
    lib = _load()
    if lib is None or len(data) < 3 or data[:2] != b"\xff\xd8":
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.wdj_decode_mem(data, len(data), None, 0, ctypes.byref(h),
                          ctypes.byref(w)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), dtype=np.uint8)
    rc = lib.wdj_decode_mem(data, len(data),
                            out.ctypes.data_as(ctypes.c_void_p), out.nbytes,
                            ctypes.byref(h), ctypes.byref(w))
    return out if rc == 0 else None


def read_batch_prepped(paths: Sequence[str], scale: int, crop: int,
                       threads: int = 0) -> Optional[np.ndarray]:
    """Decode a clip of JPEGs → (N, crop, crop, 3) RGB uint8 with
    read_prepped geometry (short side → max(scale, crop), center crop),
    parallel across a C++ thread pool. None ⇒ caller takes the fallback
    path (any non-JPEG file or failed decode disqualifies the batch)."""
    lib = _load()
    if lib is None or not paths or not all(_is_jpeg(p) for p in paths):
        return None
    n = len(paths)
    out = np.empty((n, crop, crop, 3), dtype=np.uint8)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.wdj_decode_batch_prepped(arr, n, scale, crop,
                                      out.ctypes.data_as(ctypes.c_void_p),
                                      threads)
    return out if rc == 0 else None
