"""Training-free periodicity counter (utils/similarity.count_by_periodicity
+ infer.count_by_similarity) — the RepNet-style counter that needs no
checkpoint. Reference only plots the similarity heatmap
(utils/common.py:44-148); the counter itself is beyond-reference."""

import os
import tempfile

import numpy as np
import pytest

from workoutdetector_tpu.utils.similarity import (count_by_periodicity,
                                                  estimate_period,
                                                  lag_profile)


def _periodic_features(n_reps: int, period: int, dim: int = 16,
                       noise: float = 0.02, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(n_reps * period)
    phase = 2 * np.pi * t / period
    base = rng.normal(size=(dim,))
    direction = rng.normal(size=(dim,))
    feats = (base[None, :] + np.sin(phase)[:, None] * direction[None, :] +
             0.5 * np.cos(2 * phase)[:, None] * rng.normal(size=(dim,)))
    return (feats + noise * rng.normal(size=feats.shape)).astype(np.float32)


def test_lag_profile_peaks_at_period():
    prof = lag_profile(_periodic_features(5, 20))
    # lag 20 (index 19) must beat the anti-phase lag 10 (index 9)
    assert prof[19] > prof[9] + 0.3


@pytest.mark.parametrize("n_reps,period", [(3, 48), (5, 20), (8, 12)])
def test_estimate_period_recovers_fundamental(n_reps, period):
    p, strength = estimate_period(_periodic_features(n_reps, period))
    assert p == period
    assert strength > 0.1


@pytest.mark.parametrize("n_reps,period", [(3, 48), (6, 16)])
def test_count_by_periodicity_exact(n_reps, period):
    count, p, strength = count_by_periodicity(
        _periodic_features(n_reps, period))
    assert count == n_reps
    assert p == period


def test_aperiodic_features_count_zero():
    rng = np.random.default_rng(0)
    # a random walk: smooth but aperiodic
    feats = np.cumsum(rng.normal(size=(120, 16)), axis=0).astype(np.float32)
    count, _, strength = count_by_periodicity(feats, min_strength=0.15)
    assert count == 0


def test_too_short_sequence_counts_zero():
    count, p, s = count_by_periodicity(np.ones((5, 4), np.float32))
    assert (count, p, s) == (0, 0, 0.0)


def test_count_by_similarity_on_video():
    """End-to-end: periodic mp4 → untrained backbone features → count.
    No checkpoint anywhere — the out-of-the-box counter."""
    import cv2
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.infer import InferenceEngine, count_by_similarity
    from workoutdetector_tpu.models.resnet import resnet18

    size, period, n_reps = 32, 48, 3
    tmp = tempfile.mkdtemp()
    path = os.path.join(tmp, "reps.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    rng = np.random.default_rng(0)
    for _ in range(n_reps):
        for v in (40, 220):
            for _ in range(period // 2):
                frame = np.full((64, 64, 3), v, np.uint8)
                frame += rng.integers(0, 10, frame.shape, dtype=np.uint8)
                w.write(frame)
    w.release()

    net = resnet18(num_classes=0, dtype=jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, size, size, 3)), train=False)
    engine = InferenceEngine(net, dict(variables), image_size=size,
                             input_rank=4, window_batch=16)
    count, p, strength = count_by_similarity(engine, path)
    assert count == n_reps
    assert abs(p - period) <= 2
    assert strength > 0.1
