"""Device-side fused preprocessing.

The reference preprocesses on CPU with torchvision (ConvertImageDtype →
Resize → CenterCrop → Normalize, reference datasets/build.py:115-136) and
feeds fp32 to onnxruntime. Here the host ships **uint8** frames and the
whole float pipeline — dtype convert, scale, normalize, (optional resize /
crop), temporal window gather — is traced into the same XLA program as the
model, so it fuses into the first conv's HBM read. Zero extra passes.

Layout is NHWC throughout (TPU-native conv layout).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_clip(x: jnp.ndarray,
                   mean: Tuple[float, ...] = IMAGENET_MEAN,
                   std: Tuple[float, ...] = IMAGENET_STD,
                   dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """uint8 (..., H, W, C) → normalized float (..., H, W, C).

    Equivalent to torchvision ConvertImageDtype(f32) + Normalize(mean, std)
    (reference datasets/build.py:66-68, 115-136). The scale/shift folds into
    one fused multiply-add: (x/255 - mean)/std == x * (1/(255*std)) - mean/std.
    """
    scale = jnp.asarray([1.0 / (255.0 * s) for s in std], dtype=dtype)
    shift = jnp.asarray([m / s for m, s in zip(mean, std)], dtype=dtype)
    return x.astype(dtype) * scale - shift


def resize_center_crop(x: jnp.ndarray,
                       scale_size: int = 256,
                       crop_size: int = 224,
                       antialias: bool = True) -> jnp.ndarray:
    """Resize short side → ``scale_size`` then center-crop ``crop_size``.

    Device analog of torchvision Resize(256) → CenterCrop(224) for inputs of
    *static* (H, W). Shapes must be known at trace time (XLA static-shape
    rule); dynamic-size videos are letterboxed on host before this runs.
    """
    *lead, h, w, c = x.shape
    if h <= w:
        th, tw = scale_size, max(1, round(w * scale_size / h))
    else:
        th, tw = max(1, round(h * scale_size / w)), scale_size
    x = jax.image.resize(x.astype(jnp.float32), (*lead, th, tw, c), method="bilinear",
                         antialias=antialias)
    y0 = max(0, (th - crop_size) // 2)
    x0 = max(0, (tw - crop_size) // 2)
    return jax.lax.slice(
        x,
        [0] * len(lead) + [y0, x0, 0],
        list(lead) + [y0 + crop_size, x0 + crop_size, c],
    )


def sparse_window_gather(video: jnp.ndarray,
                         starts: jnp.ndarray,
                         num_frames: int = 8,
                         stride: int = 2) -> jnp.ndarray:
    """Gather N sparse temporal windows from a device-resident video.

    For each start s: frames [s, s+stride, ..., s+(num_frames-1)*stride].
    Out-of-range frames are zeroed — the reference zero-pads short tails
    (utils/inference_count.py:412-414, ``vid[i:i+16:2]`` + zero pad).

    Args:
        video: (T, H, W, C) device array (any dtype).
        starts: (N,) int32 window start frame indices.
    Returns:
        (N, num_frames, H, W, C) windows, same dtype as ``video``.
    """
    total = video.shape[0]
    offs = jnp.arange(num_frames, dtype=jnp.int32) * stride  # (F,)
    idx = starts[:, None].astype(jnp.int32) + offs[None, :]  # (N, F)
    valid = idx < total
    idx_c = jnp.clip(idx, 0, total - 1)
    out = jnp.take(video, idx_c.reshape(-1), axis=0)
    out = out.reshape(starts.shape[0], num_frames, *video.shape[1:])
    mask = valid.reshape(starts.shape[0], num_frames, 1, 1, 1)
    return jnp.where(mask, out, jnp.zeros((), dtype=video.dtype))


@functools.partial(jax.jit, static_argnames=("num_frames", "stride", "dtype"))
def preprocess_windows(video_u8: jnp.ndarray,
                       starts: jnp.ndarray,
                       num_frames: int = 8,
                       stride: int = 2,
                       dtype: jnp.dtype = jnp.float32) -> jnp.ndarray:
    """Fused window gather + normalize: uint8 video (T, 224, 224, 3) →
    (N, num_frames, 224, 224, 3) normalized float windows.

    The inference engine's device-side front end (north-star path,
    SURVEY §7 step 4): one gather + one fma, fully fused by XLA.
    """
    windows = sparse_window_gather(video_u8, starts, num_frames, stride)
    return normalize_clip(windows, dtype=dtype)
