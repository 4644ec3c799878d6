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


def test_count_by_similarity_on_video(tmp_path):
    """End-to-end: periodic mp4 → untrained backbone features → count.
    No checkpoint anywhere — the out-of-the-box counter."""
    import cv2
    import jax
    import jax.numpy as jnp

    from workoutdetector_tpu.infer import InferenceEngine, count_by_similarity
    from workoutdetector_tpu.models.resnet import resnet18

    size, period, n_reps = 32, 48, 3
    path = str(tmp_path / "reps.mp4")
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


def test_eval_dataset_similarity_mode(tmp_path):
    """eval_dataset(model_type='similarity'): the training-free counter
    sweeps a synthetic RepCount split and scores MAE 0 / OBO 1 — an
    actual accuracy number for the checkpoint-free path."""
    import cv2
    import jax
    import jax.numpy as jnp
    import pandas as pd

    from workoutdetector_tpu.infer import InferenceEngine, eval_dataset
    from workoutdetector_tpu.models.resnet import resnet18

    data_root = tmp_path / "RepCount"
    (data_root / "videos" / "test").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for v, (n_reps, half) in enumerate([(2, 24), (4, 15)]):
        name = f"s{v}.mp4"
        w = cv2.VideoWriter(str(data_root / "videos" / "test" / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
        reps, f = [], 0
        for _ in range(n_reps):
            reps.append(f)
            for val in (45, 215):
                for _ in range(half):
                    fr = np.full((64, 64, 3), val, np.uint8)
                    fr += rng.integers(0, 8, fr.shape, dtype=np.uint8)
                    w.write(fr)
                    f += 1
            reps.append(f - half)
        w.release()
        rows.append(dict(name=name, class_="squat", split="test",
                         count=n_reps, reps=" ".join(map(str, reps)),
                         vid=name, start=0, end=f))
    anno = data_root / "annotation.csv"
    pd.DataFrame(rows).to_csv(anno)

    net = resnet18(num_classes=0, dtype=jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.zeros((1, 32, 32, 3)), train=False)
    feat_engine = InferenceEngine(net, dict(variables), image_size=32,
                                  input_rank=4, window_batch=16)
    mae, obo = eval_dataset(feat_engine, ["squat"], "test",
                            str(data_root), str(anno),
                            model_type="similarity",
                            output_dir=str(tmp_path / "out"))
    assert mae == 0.0 and obo == 1.0
    import os
    assert os.path.isfile(
        tmp_path / "out" / "eval_count_similarity_model.csv")


def _localized_motion_frames(n_reps: int, period: int, size: int = 64,
                             noise: int = 6, seed: int = 0) -> np.ndarray:
    """Static noisy scene with a small oscillating patch — the motion
    covers ~3% of the pixels, which washes out of global features (the
    failure mode of the reference's real 'exercising arm' clip)."""
    rng = np.random.default_rng(seed)
    t = n_reps * period
    base = rng.integers(60, 200, (size, size, 3)).astype(np.float32)
    frames = np.repeat(base[None], t, axis=0)
    phase = np.sin(2 * np.pi * np.arange(t) / period)
    y0, x0 = size // 8, size // 8  # patch inside one grid cell
    frames[:, y0:y0 + 8, x0:x0 + 8] += 90.0 * phase[:, None, None, None]
    frames += rng.normal(0, noise, frames.shape)
    return np.clip(frames, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("n_reps,period", [(5, 60), (3, 40)])
def test_spatial_periodicity_sees_localized_motion(n_reps, period):
    from workoutdetector_tpu.utils.similarity import (
        count_by_spatial_periodicity)

    frames = _localized_motion_frames(n_reps, period)
    count, p, strength = count_by_spatial_periodicity(frames)
    assert count == n_reps
    assert abs(p - period) <= max(2, period // 10)
    assert strength > 0.1


def test_spatial_periodicity_static_video_counts_zero():
    """Pure static noise must not fabricate reps: z-scoring amplifies
    noise in motionless cells, so strengths there must stay under the
    default gate."""
    from workoutdetector_tpu.utils.similarity import (
        count_by_spatial_periodicity)

    rng = np.random.default_rng(1)
    base = rng.integers(60, 200, (64, 64, 3)).astype(np.float32)
    frames = np.clip(
        base[None] + rng.normal(0, 6, (240, 64, 64, 3)), 0,
        255).astype(np.uint8)
    count, _, strength = count_by_spatial_periodicity(frames)
    assert count == 0, f"fabricated {count} reps (strength {strength})"


def test_count_by_motion_periodicity_on_video(tmp_path):
    """End-to-end decode → spatial counter on a real mp4 with localized
    motion; no engine, no checkpoint."""
    import cv2

    from workoutdetector_tpu.infer import count_by_motion_periodicity

    n_reps, period = 4, 48
    frames = _localized_motion_frames(n_reps, period, size=64)
    path = str(tmp_path / "arm.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
    for fr in frames:
        w.write(fr[..., ::-1])
    w.release()
    count, p, strength = count_by_motion_periodicity(path)
    assert count == n_reps
    assert strength > 0.1


def test_eval_dataset_motion_mode(tmp_path):
    """eval_dataset(model_type='motion') needs no engine at all."""
    import cv2
    import pandas as pd

    from workoutdetector_tpu.infer import eval_dataset

    data_root = tmp_path / "RepCount"
    (data_root / "videos" / "test").mkdir(parents=True)
    rng = np.random.default_rng(0)
    rows = []
    for v, (n_reps, half) in enumerate([(2, 24), (4, 15)]):
        name = f"s{v}.mp4"
        w = cv2.VideoWriter(str(data_root / "videos" / "test" / name),
                            cv2.VideoWriter_fourcc(*"mp4v"), 30, (64, 64))
        reps, f = [], 0
        for _ in range(n_reps):
            reps.append(f)
            for val in (45, 215):
                for _ in range(half):
                    fr = np.full((64, 64, 3), val, np.uint8)
                    fr += rng.integers(0, 8, fr.shape, dtype=np.uint8)
                    w.write(fr)
                    f += 1
            reps.append(f - half)
        w.release()
        rows.append(dict(name=name, class_="squat", split="test",
                         count=n_reps, reps=" ".join(map(str, reps)),
                         vid=name, start=0, end=f))
    anno = data_root / "annotation.csv"
    pd.DataFrame(rows).to_csv(anno)
    mae, obo = eval_dataset(None, ["squat"], "test", str(data_root),
                            str(anno), model_type="motion")
    assert mae == 0.0 and obo == 1.0
