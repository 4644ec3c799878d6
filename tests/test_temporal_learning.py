"""Semantic gate for the TSM core op: learn a task that *requires*
temporal mixing.

Clips are brightness ramps, class 0 rising and class 1 falling, with the
SAME per-clip mean. Average consensus over per-frame logits is permutation
invariant without the shift, so better-than-chance accuracy is only
achievable if the temporal shift actually moves information across
segments — a functional test no shape check can replace."""

import jax
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.parallel.mesh import shard_batch
from workoutdetector_tpu.train.trainer import Trainer

SIZE = 16
T = 4


def ramp_batch(rng: np.random.Generator, n: int):
    y = rng.integers(0, 2, size=n).astype(np.int32)
    ramps = np.linspace(60, 200, T, dtype=np.float32)  # rising
    x = np.empty((n, T, SIZE, SIZE, 3), np.uint8)
    for i in range(n):
        vals = ramps if y[i] == 0 else ramps[::-1]
        clip = np.broadcast_to(vals[:, None, None, None],
                               (T, SIZE, SIZE, 3)).copy()
        clip += rng.normal(0, 5, clip.shape)
        x[i] = clip.clip(0, 255).astype(np.uint8)
    return x, y


def _train(is_shift: bool, steps: int = 80) -> float:
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = T
    cfg.model.is_shift = is_shift
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.model.partial_bn = False
    cfg.data.image_size = SIZE
    cfg.optimizer.lr = 0.05  # reaches 1.0 eval acc by ~step 60 (probed)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=steps, image_size=SIZE)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    for _ in range(steps):
        bx, by = shard_batch(ramp_batch(rng, 16), trainer.mesh)
        state, m = step(state, bx, by)
    # eval on fresh data
    eval_step = trainer.eval_step_fn()
    ex, ey = shard_batch(ramp_batch(np.random.default_rng(99), 32), trainer.mesh)
    res = eval_step(state, ex, ey)
    return int(res["correct"]) / int(res["total"])


def test_shift_enables_temporal_learning():
    acc_shift = _train(is_shift=True)
    assert acc_shift > 0.8, f"TSM with shift failed to learn ramps: {acc_shift}"


def test_no_shift_cannot_learn_direction():
    acc = _train(is_shift=False)
    # without temporal mixing the task is information-theoretically ~chance
    assert acc < 0.8, f"shift-free model should NOT solve ramps: {acc}"
