"""EMA weight averaging (optimizer.ema_decay — beyond-reference
production-training capability).

The average is one fused tree-fma in the jitted train step; eval and
'best' selection use the averaged weights; deployment loaders
(CheckpointManager.restore_variables) ship them as 'params'.
"""

import os

import jax
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.parallel.mesh import shard_batch
from workoutdetector_tpu.train.trainer import Trainer, swap_ema


def _cfg(tmp_path, ema=0.9) -> Config:
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = 4
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.dataset_type = "DebugDataset"
    cfg.data.debug_num_class = 2
    cfg.data.debug_size = 16
    cfg.data.batch_size = 8
    cfg.data.num_segments = 4
    cfg.data.image_size = 16
    cfg.data.num_workers = 0
    cfg.trainer.default_root_dir = str(tmp_path / "exp")
    cfg.trainer.max_epochs = 1
    cfg.log.tensorboard_enable = False
    cfg.optimizer.lr = 0.02
    cfg.optimizer.ema_decay = ema
    return cfg


def _batch(cfg, rng):
    x = rng.integers(0, 256, (8, 4, 16, 16, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)
    return x, y


def test_ema_matches_hand_rollout(tmp_path):
    """After k steps, ema == the hand-unrolled e*d + p*(1-d) recursion
    over the raw param trajectory (init at the initial params)."""
    cfg = _cfg(tmp_path, ema=0.5)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=4, image_size=16)
    step = trainer.train_step_fn()
    leaf = lambda s: np.asarray(
        s.params["backbone"]["conv1"]["kernel"])
    eleaf = lambda s: np.asarray(
        s.ema_params["backbone"]["conv1"]["kernel"])
    hand = leaf(state)
    rng = np.random.default_rng(0)
    for _ in range(4):
        bx, by = shard_batch(_batch(cfg, rng), trainer.mesh)
        state, _ = step(state, bx, by)
        hand = hand * 0.5 + leaf(state) * 0.5
    np.testing.assert_allclose(eleaf(state), hand, rtol=1e-6, atol=1e-7)
    # and the average genuinely lags the raw weights
    assert not np.allclose(eleaf(state), leaf(state))


def test_disabled_ema_keeps_old_state_structure(tmp_path):
    """ema_decay=0 ⇒ ema_params is None (an empty pytree subtree): the
    TrainState pytree is structurally identical to pre-EMA checkpoints."""
    cfg = _cfg(tmp_path, ema=0.0)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=16)
    assert state.ema_params is None
    assert swap_ema(state) is state
    # no ema leaves appear in the flattened tree
    paths = [jax.tree_util.keystr(kp)
             for kp, _ in jax.tree_util.tree_flatten_with_path(state)[0]]
    assert not any("ema" in p for p in paths)


def test_swap_ema_promotes_average(tmp_path):
    cfg = _cfg(tmp_path, ema=0.5)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=2, image_size=16)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(1)
    for _ in range(2):
        bx, by = shard_batch(_batch(cfg, rng), trainer.mesh)
        state, _ = step(state, bx, by)
    swapped = swap_ema(state)
    np.testing.assert_array_equal(
        np.asarray(swapped.params["fc"]["kernel"]),
        np.asarray(state.ema_params["fc"]["kernel"]))


def test_checkpoint_roundtrip_and_deploy_prefers_ema(tmp_path):
    """fit() saves ema_params; restore_variables ships them as 'params'
    by default (deployment weights) and the raw ones on prefer_ema=False
    (resume path)."""
    cfg = _cfg(tmp_path, ema=0.5)
    trainer = Trainer(cfg)
    ckpt_dir = str(tmp_path / "ckpts")
    state, _ = trainer.fit(ckpt_dir=ckpt_dir)
    assert state.ema_params is not None

    from workoutdetector_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(ckpt_dir)
    deploy = mgr.restore_variables("last")
    raw = mgr.restore_variables("last", prefer_ema=False)
    np.testing.assert_array_equal(
        deploy["params"]["fc"]["kernel"],
        np.asarray(state.ema_params["fc"]["kernel"]))
    np.testing.assert_array_equal(
        raw["params"]["fc"]["kernel"],
        np.asarray(state.params["fc"]["kernel"]))
    # pre-EMA-style checkpoint (ema off) still loads cleanly
    cfg0 = _cfg(tmp_path, ema=0.0)
    t0 = Trainer(cfg0)
    s0, _ = t0.fit(ckpt_dir=str(tmp_path / "ckpts0"))
    v0 = CheckpointManager(str(tmp_path / "ckpts0")).restore_variables("last")
    np.testing.assert_array_equal(
        v0["params"]["fc"]["kernel"],
        np.asarray(s0.params["fc"]["kernel"]))
