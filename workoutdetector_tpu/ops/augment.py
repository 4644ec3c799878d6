"""Device-side training augmentation (MultiScaleCrop + flip under jit).

The reference augments on host with torchvision (MultiScaleCrop → Resize
→ RandomHorizontalFlip, reference datasets/build.py:88-112 and
datasets/transform.py:294-382). That costs host CPU per clip — on a
weak or busy host the input pipeline, not the TPU, bounds training
throughput. With ``cfg.data.device_augment`` the host only decodes and
letterboxes frames to a fixed square uint8 canvas; crop selection,
bilinear crop-resize and the horizontal flip are traced INTO the jitted
train step, where XLA fuses them with the normalize fma ahead of conv1.

TPU-first notes:
  * All shapes are static: the crop rectangle varies per sample in
    VALUE only, realised as a gather-based bilinear resample from the
    canvas to the fixed (out_size, out_size) grid — the standard way to
    express RandomResizedCrop-style ops under XLA.
  * One crop/flip decision per clip, shared by all its frames — the
    reference's clip-consistent semantics (transform.py:294-382 crops
    the whole clip with one rectangle).
  * Randomness is `jax.random` keyed per (step, sample): reproducible
    and resume-stable, unlike host worker RNG state.
  * Semantics vs host path: the canvas is the min-side square of the
    source frame (the long-side margins beyond the centered square are
    not reachable by device crops), and the resample is bilinear where
    the host uses INTER_AREA for downscales. Augmentation jitter, not a
    parity surface; the eval pipeline is untouched.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from workoutdetector_tpu.data.transforms import MULTI_SCALES

FIXED_5 = ((0, 0), (4, 0), (0, 4), (4, 4), (2, 2))
EXTRA_8 = ((0, 2), (4, 2), (2, 4), (2, 0), (1, 1), (3, 1), (1, 3), (3, 3))


def crop_candidates(base: int,
                    scales: Sequence[float] = MULTI_SCALES,
                    max_wh_scale_gap: int = 1) -> np.ndarray:
    """(K, 2) int32 [w, h] candidate crop sizes — the same candidate set
    (and enumeration order) as the host MultiScaleCrop
    (data/transforms.py:91-99, reference transform.py:294-374)."""
    sizes = [int(base * s) for s in scales]
    cand = [[w, h]
            for i, h in enumerate(sizes)
            for j, w in enumerate(sizes)
            if abs(i - j) <= max_wh_scale_gap]
    return np.asarray(cand, dtype=np.int32)


def sample_crop_params(key: jax.Array,
                       base: int,
                       scales: Sequence[float] = MULTI_SCALES,
                       max_wh_scale_gap: int = 1,
                       num_fixed_crops: int = 5,
                       flip_prob: float = 0.5,
                       ) -> Tuple[jnp.ndarray, ...]:
    """One clip's augmentation draw: (x0, y0, cw, ch, flip).

    Mirrors the host MultiScaleCrop's distribution exactly: uniform over
    the candidate (w, h) pairs, then uniform over the 5 (or 13) fixed
    quarter-step offsets (data/transforms.py:99-110)."""
    if num_fixed_crops not in (5, 13):
        raise ValueError(f"num_fixed_crops must be 5 or 13, got {num_fixed_crops}")
    kc, ko, kf = jax.random.split(key, 3)
    cand = jnp.asarray(crop_candidates(base, scales, max_wh_scale_gap))
    ci = jax.random.randint(kc, (), 0, cand.shape[0])
    cw, ch = cand[ci, 0], cand[ci, 1]
    offs = FIXED_5 + (EXTRA_8 if num_fixed_crops == 13 else ())
    offs = jnp.asarray(offs, dtype=jnp.int32)
    oi = jax.random.randint(ko, (), 0, offs.shape[0])
    x0 = offs[oi, 0] * ((base - cw) // 4)
    y0 = offs[oi, 1] * ((base - ch) // 4)
    flip = jax.random.bernoulli(kf, flip_prob)
    return x0, y0, cw, ch, flip


def bilinear_crop_resize(clip: jnp.ndarray,
                         x0: jnp.ndarray,
                         y0: jnp.ndarray,
                         cw: jnp.ndarray,
                         ch: jnp.ndarray,
                         out_size: int) -> jnp.ndarray:
    """Resample the (x0, y0, cw, ch) window of a (T, H, W, C) clip to
    (T, out_size, out_size, C) float32 with bilinear interpolation.

    The rectangle is dynamic in VALUE, static in SHAPE: sample positions
    are computed from traced scalars and realised as two axis gathers +
    lerps, so the whole op jits with fixed shapes (SURVEY §7 hard-part 5:
    never trace on data-dependent sizes). Pixel-center alignment matches
    cv2.INTER_LINEAR / jax.image 'linear' conventions. When cw == ch ==
    out_size the sample grid is integral and the window passes through
    bit-exactly."""
    t, h, w, c = clip.shape
    cw = cw.astype(jnp.float32)
    ch = ch.astype(jnp.float32)
    grid = jnp.arange(out_size, dtype=jnp.float32) + 0.5
    xs = x0.astype(jnp.float32) + grid * (cw / out_size) - 0.5
    ys = y0.astype(jnp.float32) + grid * (ch / out_size) - 0.5
    xs = jnp.clip(xs, 0.0, w - 1.0)
    ys = jnp.clip(ys, 0.0, h - 1.0)
    ix0 = jnp.floor(xs).astype(jnp.int32)
    iy0 = jnp.floor(ys).astype(jnp.int32)
    ix1 = jnp.minimum(ix0 + 1, w - 1)
    iy1 = jnp.minimum(iy0 + 1, h - 1)
    fx = (xs - ix0.astype(jnp.float32))[None, None, :, None]
    fy = (ys - iy0.astype(jnp.float32))[None, :, None, None]
    r0 = jnp.take(clip, iy0, axis=1).astype(jnp.float32)
    r1 = jnp.take(clip, iy1, axis=1).astype(jnp.float32)
    rows = r0 * (1.0 - fy) + r1 * fy          # (T, out, W, C)
    c0 = jnp.take(rows, ix0, axis=2)
    c1 = jnp.take(rows, ix1, axis=2)
    return c0 * (1.0 - fx) + c1 * fx          # (T, out, out, C)


def device_train_augment(batch: jnp.ndarray,
                         key: jax.Array,
                         out_size: int = 224,
                         scales: Sequence[float] = MULTI_SCALES,
                         max_wh_scale_gap: int = 1,
                         num_fixed_crops: int = 5,
                         flip_prob: float = 0.5) -> jnp.ndarray:
    """MultiScaleCrop + RandomHorizontalFlip for a (B, T, S, S, C) uint8
    canvas batch → (B, T, out_size, out_size, C) float32 in [0, 255].

    Traced into the train step (train/trainer.py) ahead of
    ops.preprocess.normalize_clip; each clip draws its own crop/flip
    from a per-sample fold of ``key``."""
    if batch.ndim != 5 or batch.shape[2] != batch.shape[3]:
        raise ValueError(f"expected (B, T, S, S, C) canvas batch, got {batch.shape}")
    base = batch.shape[2]

    def one(clip: jnp.ndarray, k: jax.Array) -> jnp.ndarray:
        x0, y0, cw, ch, flip = sample_crop_params(
            k, base, scales, max_wh_scale_gap, num_fixed_crops, flip_prob)
        out = bilinear_crop_resize(clip, x0, y0, cw, ch, out_size)
        return jnp.where(flip, out[:, :, ::-1, :], out)

    return jax.vmap(one)(batch, jax.random.split(key, batch.shape[0]))


@functools.partial(jax.jit,
                   static_argnames=("out_size", "scales", "max_wh_scale_gap",
                                    "num_fixed_crops", "flip_prob"))
def device_train_augment_jit(batch: jnp.ndarray,
                             key: jax.Array,
                             out_size: int = 224,
                             scales: Sequence[float] = MULTI_SCALES,
                             max_wh_scale_gap: int = 1,
                             num_fixed_crops: int = 5,
                             flip_prob: float = 0.5) -> jnp.ndarray:
    """Standalone jitted wrapper (tests / ad-hoc use; the trainer traces
    device_train_augment directly into its step)."""
    return device_train_augment(batch, key, out_size, tuple(scales),
                                max_wh_scale_gap, num_fixed_crops, flip_prob)
