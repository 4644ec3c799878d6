"""Temporal frame sampling.

Deterministic/seeded re-implementation of the reference's segment sampler
(reference: workoutdetector/datasets/transform.py:16-65 sample_frames and
workoutdetector/datasets/tdn_dataset.py:104-129 sample_indices). Unlike the
reference, randomness flows through an explicit numpy Generator so data
pipelines are reproducible per-seed (SURVEY §7 hard-part 6).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np


def sample_frames(total: int,
                  num: int,
                  offset: int = 0,
                  random: bool = True,
                  rng: Optional[np.random.Generator] = None) -> List[int]:
    """Uniform-interval segment sampling with optional per-segment jitter.

    If ``total < num`` frames are repeated (ceil(num/total) each) before
    sampling. Returns ``num`` strictly-increasing indices offset by ``offset``.

    Examples (matching reference docstring, transform.py:30-40):
        >>> sample_frames(4, 8, 0, False)
        [0, 0, 1, 1, 2, 2, 3, 3]
        >>> sample_frames(10, 8, 0, False)
        [0, 1, 2, 3, 4, 5, 6, 7]
        >>> sample_frames(40, 8, 0, False)
        [0, 5, 10, 15, 20, 25, 30, 35]
    """
    if rng is None:
        rng = np.random.default_rng()
    if total < num:
        repeats = math.ceil(num / total)
        data = [x for x in range(total) for _ in range(repeats)]
        total = len(data)
    else:
        data = list(range(total))
    interval = total // num
    indices = np.arange(0, total, interval)[:num]
    if random and interval > 0:
        for i, x in enumerate(indices):
            if i == num - 1:
                upper = total
                rand = int(rng.integers(0, upper - x))
            else:
                upper = min(interval * (i + 1), total)
                rand = int(rng.integers(0, interval))
            indices[i] = (x + rand) % upper
    assert len(indices) == num
    return [data[i] + offset for i in indices]


def tdn_sample_indices(total: int,
                       num_segments: int = 8,
                       num_frames: int = 5,
                       rng: Optional[np.random.Generator] = None,
                       random: bool = True) -> np.ndarray:
    """TDN official burst sampler: per-segment start indices; the caller
    reads ``num_frames`` consecutive frames from each (0-indexed here).

    Mirrors reference workoutdetector/datasets/tdn_dataset.py:104-129.
    """
    if rng is None:
        rng = np.random.default_rng()

    def randint(upper: int, size: Optional[int] = None):
        if not random:
            if size is None:
                return upper // 2
            return np.full(size, upper // 2, dtype=np.int64)
        return rng.integers(0, upper, size=size)

    if (total - num_frames + 1) < num_segments:
        average_duration = (total - 5 + 1) // num_segments
    else:
        average_duration = (total - num_frames + 1) // num_segments
    if average_duration > 0:
        offsets = np.multiply(np.arange(num_segments), average_duration) + \
            randint(average_duration, size=num_segments)
    elif total > num_segments:
        if (total - num_frames + 1) >= num_segments:
            offsets = np.sort(randint(total - num_frames + 1, size=num_segments))
        else:
            offsets = np.sort(randint(total - 5 + 1, size=num_segments))
    else:
        offsets = np.zeros((num_segments,))
    return np.asarray(offsets).astype(int)


def sparse_window_indices(start: int, total: int, window: int = 16,
                          stride: int = 2) -> np.ndarray:
    """Indices for the inference-time sparse window: 8 frames sampled from 16
    (``vid[i:i+16:2]`` semantics, reference utils/inference_count.py:412),
    clamped into [0, total) with an out-of-range mask.

    Returns (indices[window//stride], valid[window//stride]).
    """
    idx = np.arange(start, start + window, stride)
    valid = idx < total
    return np.clip(idx, 0, max(total - 1, 0)), valid
