"""Host-side spatial transforms (numpy/cv2).

The TPU-first split of the reference's torchvision pipelines
(reference: workoutdetector/datasets/build.py:88-136 and
workoutdetector/datasets/transform.py:226-382): geometric work (crop
selection, resize, flip) runs on host over uint8 frames; the float
convert + ImageNet normalize runs *on device*, fused into the compiled
model graph (ops.preprocess.normalize_clip). Device inputs stay uint8 —
4× less host→HBM traffic than fp32.

All transforms operate on clips shaped (T, H, W, C) uint8 and take an
explicit numpy Generator (reproducible; SURVEY §7 hard-part 6).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import cv2
import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
MULTI_SCALES = (1.0, 0.875, 0.75, 0.66)
INPUT_SIZE = 224
SCALE_SIZE = 256


def resize_clip(clip: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Resize (T, H, W, C) clip to (T, size[0], size[1], C).

    Downscales use INTER_AREA (antialiased — tracks the PIL/torchvision
    antialias behavior the reference's deployed path used,
    utils/inference_count.py:27-34 ToPILImage→Resize), upscales bilinear.
    SURVEY §7 hard-part 1: the antialias setting is the parity trap.
    """
    th, tw = size
    if clip.shape[1] == th and clip.shape[2] == tw:
        return clip
    downscale = th < clip.shape[1] or tw < clip.shape[2]
    interp = cv2.INTER_AREA if downscale else cv2.INTER_LINEAR
    out = np.empty((clip.shape[0], th, tw, clip.shape[3]), dtype=clip.dtype)
    for i in range(clip.shape[0]):
        out[i] = cv2.resize(clip[i], (tw, th), interpolation=interp)
    return out


def resize_short_side(clip: np.ndarray, short: int = SCALE_SIZE) -> np.ndarray:
    """Resize so the short side == ``short``, preserving aspect ratio
    (torchvision Resize(int) semantics)."""
    h, w = clip.shape[1:3]
    if h <= w:
        th, tw = short, max(1, round(w * short / h))
    else:
        th, tw = max(1, round(h * short / w)), short
    return resize_clip(clip, (th, tw))


def center_crop(clip: np.ndarray, size: int = INPUT_SIZE) -> np.ndarray:
    h, w = clip.shape[1:3]
    y = max(0, (h - size) // 2)
    x = max(0, (w - size) // 2)
    return clip[:, y:y + size, x:x + size]


def horizontal_flip(clip: np.ndarray) -> np.ndarray:
    return clip[:, :, ::-1]


class MultiScaleCrop:
    """mmaction-style multi-scale crop: pick (w, h) from min-side × scales
    pairs with bounded w/h scale gap, then one of 5 (or 13) fixed offsets
    (or a fully random offset). Reference transform.py:294-374.
    """

    FIXED_5 = ((0, 0), (4, 0), (0, 4), (4, 4), (2, 2))
    EXTRA_8 = ((0, 2), (4, 2), (2, 4), (2, 0), (1, 1), (3, 1), (1, 3), (3, 3))

    def __init__(self,
                 scales: Sequence[float] = MULTI_SCALES,
                 max_wh_scale_gap: int = 1,
                 random_crop: bool = False,
                 num_fixed_crops: int = 5):
        if num_fixed_crops not in (5, 13):
            raise ValueError(f"num_fixed_crops must be 5 or 13, got {num_fixed_crops}")
        self.scales = tuple(scales)
        self.max_wh_scale_gap = max_wh_scale_gap
        self.random_crop = random_crop
        self.num_fixed_crops = num_fixed_crops

    def __call__(self, clip: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        img_h, img_w = clip.shape[1:3]
        base = min(img_h, img_w)
        sizes = [int(base * s) for s in self.scales]
        candidates = [[w, h]
                      for i, h in enumerate(sizes)
                      for j, w in enumerate(sizes)
                      if abs(i - j) <= self.max_wh_scale_gap]
        crop_w, crop_h = candidates[rng.integers(0, len(candidates))]
        if self.random_crop:
            x = int(rng.integers(0, img_w - crop_w + 1))
            y = int(rng.integers(0, img_h - crop_h + 1))
        else:
            w_step = (img_w - crop_w) // 4
            h_step = (img_h - crop_h) // 4
            offsets = list(self.FIXED_5)
            if self.num_fixed_crops == 13:
                offsets += list(self.EXTRA_8)
            ox, oy = offsets[rng.integers(0, len(offsets))]
            x, y = ox * w_step, oy * h_step
        return clip[:, y:y + crop_h, x:x + crop_w]


class ThreeCrop:
    """Three square crops along the longer side; returns one at random
    (reference transform.py:265-291)."""

    def __call__(self, clip: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        h, w = clip.shape[1:3]
        s = min(h, w)
        if h > w:
            step = (h - w) // 2
            tops = [(0, 0), (step, 0), (2 * step, 0)]
        else:
            step = (w - h) // 2
            tops = [(0, 0), (0, step), (0, 2 * step)]
        y, x = tops[rng.integers(0, 3)]
        return clip[:, y:y + s, x:x + s]


class TrainTransform:
    """MultiScaleCrop → Resize(224) → RandomHorizontalFlip over uint8 clips
    (reference build.py:88-112; normalize happens on device)."""

    def __init__(self,
                 scales: Optional[Sequence[float]] = MULTI_SCALES,
                 size: int = INPUT_SIZE,
                 flip_prob: float = 0.5):
        self.msc = MultiScaleCrop(scales) if scales else None
        self.size = size
        self.flip_prob = flip_prob

    def __call__(self, clip: np.ndarray, rng: np.random.Generator) -> np.ndarray:
        if self.msc is not None:
            clip = self.msc(clip, rng)
        else:
            clip = resize_short_side(clip, SCALE_SIZE)
            h, w = clip.shape[1:3]
            y = int(rng.integers(0, h - self.size + 1))
            x = int(rng.integers(0, w - self.size + 1))
            clip = clip[:, y:y + self.size, x:x + self.size]
        clip = resize_clip(clip, (self.size, self.size))
        if rng.random() < self.flip_prob:
            clip = horizontal_flip(clip)
        return np.ascontiguousarray(clip)


class TestTransform:
    """Resize(short=256) → CenterCrop(224), deterministic
    (reference build.py:115-136; PersonCrop variant plugs in before)."""

    __test__ = False  # not a pytest class

    def __init__(self, size: int = INPUT_SIZE, scale: int = SCALE_SIZE,
                 person_crop=None, in_decoder: bool = True):
        self.size = size
        self.scale = scale
        self.person_crop = person_crop
        # allow the rawframe datasets to produce this geometry inside the
        # native JPEG decode (DCT prescale + bilinear instead of full
        # decode + INTER_AREA; drift bounds in tests/test_jpeg.py).
        # cfg.data.native_prep=false pins the exact host pixels.
        self.in_decoder = in_decoder

    def __call__(self, clip: np.ndarray,
                 rng: Optional[np.random.Generator] = None) -> np.ndarray:
        if self.person_crop is not None:
            clip = self.person_crop(clip)
            clip = resize_clip(clip, (self.size, self.size))
            return np.ascontiguousarray(clip)
        clip = resize_short_side(clip, self.scale)
        clip = center_crop(clip, self.size)
        return np.ascontiguousarray(clip)


def build_transform(split: str, person_crop=None, size: int = INPUT_SIZE,
                    scale: int = SCALE_SIZE, device_augment: bool = False,
                    native_prep: bool = True):
    """Factory mirroring reference build.py:71-86.

    With ``device_augment`` the train split only letterboxes frames to a
    fixed (scale, scale) uint8 canvas here; MultiScaleCrop + flip run on
    device inside the jitted train step (ops/augment.py).
    ``native_prep=False`` forbids fusing this geometry into the native
    JPEG decode (rawframe datasets then always resize on host)."""
    if split == "train":
        if device_augment:
            return TestTransform(size=scale, scale=scale,
                                 in_decoder=native_prep)
        return TrainTransform(size=size)
    return TestTransform(size=size, scale=scale, person_crop=person_crop,
                         in_decoder=native_prep)
