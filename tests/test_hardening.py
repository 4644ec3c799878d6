"""Trainer hardening tests: grad accumulation, early stopping, multi-host
init no-op, 3D pose renderer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.parallel.mesh import shard_batch
from workoutdetector_tpu.train.trainer import Trainer


def _cfg(tmp_path, **kw):
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
    cfg.data.num_workers = 2
    cfg.trainer.default_root_dir = str(tmp_path / "exp")
    cfg.trainer.max_epochs = 1
    cfg.log.tensorboard_enable = False
    for k, v in kw.items():
        node, leaf = k.rsplit(".", 1)
        obj = cfg
        for p in node.split("."):
            obj = getattr(obj, p)
        setattr(obj, leaf, v)
    return cfg


def test_grad_accumulation_delays_updates(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.trainer.grad_accum_steps = 2
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=4, image_size=16)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (8, 4, 16, 16, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)
    bx, by = shard_batch((x, y), trainer.mesh)
    p0 = np.asarray(state.params["fc"]["kernel"])
    state, _ = step(state, bx, by)
    p1 = np.asarray(state.params["fc"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # micro-step 1: no update yet
    state, _ = step(state, bx, by)
    p2 = np.asarray(state.params["fc"]["kernel"])
    assert not np.allclose(p1, p2)  # update lands on step 2


def test_early_stopping_breaks(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.trainer.max_epochs = 10
    cfg.callbacks.early_stopping.enable = True
    cfg.callbacks.early_stopping.patience = 1
    cfg.callbacks.early_stopping.monitor = "val/acc"
    cfg.callbacks.early_stopping.mode = "max"
    cfg.optimizer.lr = 0.0  # accuracy can never improve → stop after patience
    trainer = Trainer(cfg)
    state, history = trainer.fit()
    # 10 epochs × 2 steps each would be 20; early stop cuts it short
    # (epoch 1 sets the best, epoch 2 exhausts patience=1)
    assert int(state.step) <= 3 * 2


def test_distributed_initialize_noop(monkeypatch):
    from workoutdetector_tpu.parallel.distributed import (initialize,
                                                          is_main_process)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    initialize()  # single host: must not raise
    assert is_main_process()


def test_vis_3d_pose(tmp_path):
    from workoutdetector_tpu.utils.visualize import vis_3d_pose

    kp = np.random.default_rng(0).standard_normal((1, 3, 17, 3)).astype(np.float32)
    out = vis_3d_pose(kp, out_path=str(tmp_path / "p3d.mp4"), figsize=2)
    assert out.shape[0] == 3
    assert out.shape[-1] == 3
    assert (tmp_path / "p3d.mp4").exists()


def test_restore_variables_target_free(tmp_path):
    """Serving restores params/batch_stats from a full TrainState checkpoint
    without knowing the optimizer-state structure."""
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=1, image_size=16)
    from workoutdetector_tpu.train.checkpoint import CheckpointManager
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    mgr.save(state, name="best")
    restored = mgr.restore_variables("best")
    assert "params" in restored and "batch_stats" in restored
    got = np.asarray(restored["params"]["backbone"]["conv1"]["kernel"])
    want = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(got, want)
