"""RepNet period-counting family: model, synthetic data, training, counting.

The learnable counterpart of the reference's similarity-notebook
exploration (/root/reference/notebooks/similarity_image.ipynb,
utils/common.py:44-250) — see models/repnet.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.data.datasets import (SyntheticPeriodicDataset,
                                               build_dataset,
                                               synth_periodic_clip)
from workoutdetector_tpu.models.factory import build_model
from workoutdetector_tpu.models.repnet import (RepNet,
                                               count_from_frame_logits,
                                               period_of_class)


def tiny_cfg(num_segments=16, image_size=24, batch=16):
    cfg = Config()
    cfg.model.model_type = "repnet"
    cfg.model.base_model = "tiny"
    cfg.model.num_segments = num_segments
    cfg.model.dropout = 0.1
    cfg.model.dtype = "float32"
    cfg.model.partial_bn = False
    cfg.model.aux_loss_weight = 0.5
    cfg.data.dataset_type = "SyntheticPeriodic"
    cfg.data.num_segments = num_segments
    cfg.data.image_size = image_size
    cfg.data.batch_size = batch
    cfg.data.debug_size = 64
    cfg.optimizer.method = "adamw"
    cfg.optimizer.lr = 2e-3
    cfg.optimizer.weight_decay = 1e-4
    cfg.optimizer.use_tsn_policies = False
    cfg.trainer.enable_checkpointing = False
    return cfg


def test_forward_shapes_and_dense_aux():
    model = RepNet(num_segments=8, width=4, embed_dim=8, model_dim=16,
                   num_heads=2, sim_channels=4, dropout=0.0)
    assert model.num_class == 4
    x = jnp.zeros((2, 8, 16, 16, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, upd = model.apply(variables, x, train=False,
                           mutable=["intermediates"])
    assert out.shape == (2, 4) and out.dtype == jnp.float32
    aux = upd["intermediates"]["aux_logits"][0]
    assert aux.shape == (2, 8, 4)
    # consensus really is the frame mean of the sown logits
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(aux.mean(axis=1)), rtol=1e-5)


def test_synthetic_dataset_contract():
    ds = SyntheticPeriodicDataset(num_segments=16, size=32, image_size=24,
                                  split="val")
    x, y = ds[3]
    assert x.shape == (16, 24, 24, 3) and x.dtype == np.uint8
    assert 0 <= y < ds.num_class == 8
    x2, _ = ds[3]
    np.testing.assert_array_equal(x, x2)  # deterministic per (split, idx)
    # label ids cycle through every class
    assert sorted({ds[i][1] for i in range(8)}) == list(range(8))
    # split streams are disjoint
    tr = SyntheticPeriodicDataset(num_segments=16, size=32, image_size=24,
                                  split="train")
    assert np.abs(tr[3][0].astype(int) - x.astype(int)).mean() > 1.0
    # factory dispatch
    cfg = tiny_cfg()
    assert isinstance(build_dataset(cfg.data, "train"),
                      SyntheticPeriodicDataset)


def test_synthetic_motion_is_periodic_vs_static():
    rng = np.random.default_rng(0)
    per = synth_periodic_clip(rng, 32, 24, period=8).astype(np.int32)
    rng = np.random.default_rng(0)
    sta = synth_periodic_clip(rng, 32, 24, period=0, mode="static"
                              ).astype(np.int32)
    # the background-noise floor (σ=6/frame) affects both equally; the
    # oscillating object adds real motion energy on top of it
    motion = lambda c: np.abs(np.diff(c, axis=0)).mean()
    assert motion(per) > 1.3 * motion(sta), (motion(per), motion(sta))


def test_count_from_frame_logits_rate_invariance():
    # all frames confidently periodic: period 4 at rate 1 == period 2 at
    # rate 2 — the count must match (the property count_by_repnet uses)
    def conf_logits(t, c, class_id):
        out = np.full((t, c), -10.0, np.float32)
        out[:, class_id] = 10.0
        return out

    c1, s1 = count_from_frame_logits(conf_logits(8, 8, 3))  # period 4
    c2, s2 = count_from_frame_logits(conf_logits(4, 8, 1))  # period 2
    assert abs(c1 - 2.0) < 1e-5 and abs(c2 - 2.0) < 1e-5
    assert s1 > 0.99 and s2 > 0.99
    # aperiodic frames contribute nothing
    c0, s0 = count_from_frame_logits(conf_logits(8, 8, 0))
    assert c0 == 0.0 and s0 < 0.01
    # valid mask excludes padding
    cm, _ = count_from_frame_logits(conf_logits(8, 8, 3),
                                    valid=np.arange(8) < 4)
    assert abs(cm - 1.0) < 1e-5
    assert period_of_class(3) == 4


def test_trains_and_counts_synthetic_video(tmp_path):
    """End-to-end: train tiny RepNet on synthetic clips (dense aux CE
    through the sharded trainer), verify convergence well above chance,
    then count a long held-out periodic video via count_by_repnet."""
    from workoutdetector_tpu.infer import count_by_repnet
    from workoutdetector_tpu.infer.engine import InferenceEngine
    from workoutdetector_tpu.parallel.mesh import shard_batch
    from workoutdetector_tpu.train.trainer import Trainer

    cfg = tiny_cfg()
    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=10,
                               image_size=cfg.data.image_size)
    step = trainer.train_step_fn()
    ds = SyntheticPeriodicDataset(num_segments=16, size=10_000,
                                  image_size=24, split="train")
    rng = np.random.default_rng(0)
    accs = []
    for s in range(180):
        idx = rng.integers(0, len(ds), size=cfg.data.batch_size)
        items = [ds.__getitem__(int(i), rng) for i in idx]
        x = np.stack([it[0] for it in items])
        y = np.array([it[1] for it in items], np.int32)
        bx, by = shard_batch((x, y), trainer.mesh)
        state, m = step(state, bx, by)
        accs.append(float(m["acc"]))
    assert np.isfinite(float(m["loss"]))
    final_acc = float(np.mean(accs[-20:]))
    assert final_acc > 0.5, f"period classification stuck at {final_acc}"
    # chance is 1/8; >0.5 means the period head genuinely reads the
    # similarity matrix

    engine = InferenceEngine(
        trainer.model,
        {"params": state.params, "batch_stats": state.batch_stats},
        num_segments=16, window_batch=4,
        image_size=24, input_rank=5)
    # held-out long video: 96 frames of period-6 motion = 16 reps
    video = synth_periodic_clip(np.random.default_rng(123), 96, 24,
                                period=6)
    import workoutdetector_tpu.infer.inference_count as ic

    class _Reader:
        def __init__(self, path):
            pass

        def read_prepped(self, scale, crop, **kw):
            assert crop == video.shape[1]
            return video

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    orig = ic.VideoReader
    ic.VideoReader = _Reader
    try:
        count, period, strength = count_by_repnet(
            engine, "synthetic://", rates=(1, 2))
    finally:
        ic.VideoReader = orig
    assert strength > 0.4, f"periodicity not detected: {strength}"
    assert abs(count - 16) <= 4, f"count {count} vs true 16 (period {period})"

    # localized motion: the same periodic clip confined to the top-left
    # quadrant of a 2× frame (static background + sensor noise, matching
    # the training stats). grid=True decodes at 2× and scores quadrant
    # views — the quadrant must rescue what the full-frame downscale
    # washes out (the remedy the similarity counter's spatial grid uses).
    brng = np.random.default_rng(7)
    bg = brng.integers(0, 256, size=(48, 48, 3)).astype(np.float32)
    big = np.clip(bg[None] + brng.normal(0, 6.0, size=(96, 48, 48, 3)),
                  0, 255).astype(np.uint8)
    big[:, :24, :24] = video

    class _BigReader(_Reader):
        def read_prepped(self, scale, crop, **kw):
            assert crop == 48, "grid mode must decode at 2x image_size"
            return big

    ic.VideoReader = _BigReader
    try:
        g_count, g_period, g_strength = count_by_repnet(
            engine, "synthetic://", rates=(1, 2), grid=True)
    finally:
        ic.VideoReader = orig
    assert g_strength > 0.4, f"grid missed localized motion: {g_strength}"
    assert abs(g_count - 16) <= 4, \
        f"grid count {g_count} vs true 16 (period {g_period})"


def test_exported_artifact_counts_like_live_engine(tmp_path):
    """RepNet .jaxm artifacts bake the PER-FRAME logits graph
    (utils/export.make_inference_fn repnet branch): counting from the
    deployed artifact must match the live engine exactly."""
    from workoutdetector_tpu.infer import count_by_repnet
    from workoutdetector_tpu.infer.engine import InferenceEngine
    from workoutdetector_tpu.utils.export import export_model
    import workoutdetector_tpu.infer.inference_count as ic

    model = RepNet(num_segments=8, width=4, embed_dim=8, model_dim=16,
                   num_heads=2, sim_channels=4, dropout=0.0)
    x = jnp.zeros((1, 8, 16, 16, 3), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    path = export_model(model, variables, str(tmp_path / "repnet"),
                        input_shape=(2, 8, 16, 16, 3),
                        meta={"model_type": "repnet"})
    live = InferenceEngine(model, variables, num_segments=8,
                           window_batch=2, image_size=16)
    deployed = InferenceEngine.from_exported(path)
    assert deployed.num_segments == 8 and deployed.window_batch == 2

    video = synth_periodic_clip(np.random.default_rng(5), 24, 16, period=4)

    class _Reader:
        def __init__(self, path):
            pass

        def read_prepped(self, scale, crop, **kw):
            return video

        def __enter__(self):
            return self

        def __exit__(self, *exc):
            return False

    orig = ic.VideoReader
    ic.VideoReader = _Reader
    try:
        got_live = count_by_repnet(live, "synthetic://", rates=(1,))
        got_dep = count_by_repnet(deployed, "synthetic://", rates=(1,))
    finally:
        ic.VideoReader = orig
    assert got_dep[0] == got_live[0] and got_dep[1] == got_live[1]
    np.testing.assert_allclose(got_dep[2], got_live[2], rtol=1e-5)


def test_trainer_harness_fast_dev_run(tmp_path):
    cfg = tiny_cfg()
    cfg.trainer.fast_dev_run = True
    cfg.trainer.default_root_dir = str(tmp_path)
    cfg.data.debug_size = 16
    cfg.data.num_workers = 0
    from workoutdetector_tpu.train.trainer import Trainer
    trainer = Trainer(cfg)
    _, history = trainer.fit()
    assert "best_val_acc" in history
