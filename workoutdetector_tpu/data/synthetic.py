"""Synthetic person scenes with known ground-truth boxes.

Training/eval fixtures for the in-framework person detector
(models/detector.py) and the PersonCrop A/B: a textured "person"
rectangle over a textured background, optionally drifting across frames
so the motion-saliency baseline (data/person.py) has something to see.
No real data needed (zero-egress image).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np


def _background(rng: np.random.Generator, size: int) -> np.ndarray:
    """Smooth low-frequency color field + mild noise."""
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    phase = rng.uniform(0, 6.28, (3,))
    freq = rng.uniform(0.05, 0.15, (3,))
    img = np.stack([
        120 + 60 * np.sin(freq[c] * xx + phase[c]) *
        np.cos(freq[c] * 0.7 * yy)
        for c in range(3)
    ], axis=-1)
    img += rng.normal(0, 6, img.shape)
    return np.clip(img, 0, 255).astype(np.uint8)


def _person_patch(rng: np.random.Generator, bh: int, bw: int) -> np.ndarray:
    """High-contrast striped patch — trivially separable from the smooth
    background by a learned model, but *static texture*, so only its
    motion is visible to the saliency baseline."""
    yy = np.arange(bh)[:, None]
    stripes = np.broadcast_to(((yy // max(2, bh // 8)) % 2) * 160 + 40,
                              (bh, bw))
    patch = np.repeat(stripes[..., None], 3, axis=-1).astype(np.float32)
    tint = rng.uniform(0.6, 1.4, (3,))
    patch = patch * tint
    patch += rng.normal(0, 10, (bh, bw, 3))
    return np.clip(patch, 0, 255).astype(np.uint8)


def person_scene(rng: np.random.Generator, size: int = 64, t: int = 8,
                 drift: float = 1.5) -> Tuple[np.ndarray, np.ndarray]:
    """One clip with one person.

    Returns:
        clip (t, size, size, 3) uint8, boxes (t, 4) float32 (x1,y1,x2,y2).
    """
    bh = int(rng.integers(size // 3, size // 2))
    bw = int(rng.integers(size // 5, size // 3))
    x = float(rng.integers(2, size - bw - 2))
    y = float(rng.integers(2, size - bh - 2))
    vx, vy = rng.uniform(-drift, drift, (2,))
    bg = _background(rng, size)
    patch = _person_patch(rng, bh, bw)
    frames, boxes = [], []
    for _ in range(t):
        f = bg.copy()
        xi = int(np.clip(x, 0, size - bw))
        yi = int(np.clip(y, 0, size - bh))
        f[yi:yi + bh, xi:xi + bw] = patch
        frames.append(f)
        boxes.append([xi, yi, xi + bw, yi + bh])
        x += vx
        y += vy
    return np.stack(frames), np.asarray(boxes, np.float32)


def person_dataset(n: int, size: int = 64, seed: int = 0
                   ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """(N, size, size, 3) single frames + per-image (1, 4) gt boxes —
    detector training set."""
    rng = np.random.default_rng(seed)
    imgs, boxes = [], []
    for _ in range(n):
        clip, b = person_scene(rng, size=size, t=1, drift=0.0)
        imgs.append(clip[0])
        boxes.append(b[:1])
    return np.stack(imgs), boxes


def iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two (4,) boxes."""
    x1, y1 = max(a[0], b[0]), max(a[1], b[1])
    x2, y2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, x2 - x1) * max(0.0, y2 - y1)
    area = ((a[2] - a[0]) * (a[3] - a[1]) +
            (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return float(inter / area) if area > 0 else 0.0


# ----------------------------------------------------------- pose fixtures

# COCO-17 canonical joint offsets within a unit body box (x, y), roughly
# anatomical: nose, eyes, ears, shoulders, elbows, wrists, hips, knees,
# ankles — enough geometric structure for a pose model to learn.
_COCO_UNIT = np.asarray([
    (0.50, 0.08), (0.46, 0.05), (0.54, 0.05), (0.40, 0.08), (0.60, 0.08),
    (0.32, 0.25), (0.68, 0.25), (0.22, 0.42), (0.78, 0.42),
    (0.18, 0.58), (0.82, 0.58), (0.40, 0.55), (0.60, 0.55),
    (0.38, 0.75), (0.62, 0.75), (0.36, 0.95), (0.64, 0.95),
], np.float32)

# distinct per-joint colors (a learnable appearance cue)
_JOINT_COLORS = ((np.arange(17)[:, None] * np.asarray([53, 97, 31]) + 60)
                 % 200 + 55).astype(np.uint8)


def pose_scene(rng: np.random.Generator, size: int = 128, t: int = 1,
               jitter: float = 0.02) -> Tuple[np.ndarray, np.ndarray]:
    """A stick figure with known COCO-17 keypoints.

    Returns:
        clip (t, size, size, 3) uint8, keypoints (t, 17, 2) float pixels.
    """
    bh = rng.uniform(0.55, 0.8) * size
    bw = bh * rng.uniform(0.4, 0.6)
    x0 = rng.uniform(0.05 * size, size - bw - 0.05 * size)
    y0 = rng.uniform(0.05 * size, size - bh - 0.05 * size)
    bg = _background(rng, size)
    r = max(2, int(size * 0.02))
    frames, kps_all = [], []
    for _ in range(t):
        f = bg.copy()
        kps = _COCO_UNIT + rng.normal(0, jitter, _COCO_UNIT.shape)
        kps = np.stack([x0 + kps[:, 0] * bw, y0 + kps[:, 1] * bh], axis=-1)
        yy, xx = np.mgrid[0:size, 0:size]
        for k, (kx, ky) in enumerate(kps):
            mask = (yy - ky) ** 2 + (xx - kx) ** 2 <= r ** 2
            f[mask] = _JOINT_COLORS[k]
        frames.append(f)
        kps_all.append(kps)
    return np.stack(frames), np.stack(kps_all).astype(np.float32)


def pose_dataset(n: int, size: int = 128, seed: int = 0
                 ) -> Tuple[np.ndarray, List[np.ndarray]]:
    """(N, size, size, 3) frames + per-image (17, 2) keypoints."""
    rng = np.random.default_rng(seed)
    imgs, kps = [], []
    for _ in range(n):
        clip, k = pose_scene(rng, size=size, t=1)
        imgs.append(clip[0])
        kps.append(k[0])
    return np.stack(imgs), kps
