"""Device-side training augmentation (ops/augment.py).

Validates the jitted MultiScaleCrop+flip against the host implementation
it mirrors (data/transforms.py MultiScaleCrop / TrainTransform, reference
datasets/build.py:88-112) and its integration into the trainer.
"""

import cv2
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from workoutdetector_tpu.data.transforms import MULTI_SCALES, MultiScaleCrop
from workoutdetector_tpu.ops.augment import (bilinear_crop_resize,
                                             crop_candidates,
                                             device_train_augment_jit,
                                             sample_crop_params)


def _canvas(b=2, t=3, s=64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (b, t, s, s, 3), dtype=np.uint8)


def test_candidates_match_host_enumeration():
    """The device candidate set is the host MultiScaleCrop's, in order."""
    base = 256
    sizes = [int(base * s) for s in MULTI_SCALES]
    host = [[w, h]
            for i, h in enumerate(sizes)
            for j, w in enumerate(sizes)
            if abs(i - j) <= 1]
    np.testing.assert_array_equal(crop_candidates(base), np.asarray(host))


def test_identity_crop_is_exact():
    """cw == ch == out_size ⇒ integral sample grid ⇒ bit-exact pass-through."""
    clip = _canvas(b=1)[0]  # (T, 64, 64, 3)
    out = bilinear_crop_resize(jnp.asarray(clip),
                               jnp.int32(0), jnp.int32(0),
                               jnp.int32(64), jnp.int32(64), 64)
    np.testing.assert_array_equal(np.asarray(out), clip.astype(np.float32))


def test_offset_identity_window():
    """An out_size window at a nonzero offset passes through exactly."""
    clip = _canvas(b=1, s=64)[0]
    out = bilinear_crop_resize(jnp.asarray(clip),
                               jnp.int32(10), jnp.int32(20),
                               jnp.int32(32), jnp.int32(32), 32)
    np.testing.assert_array_equal(np.asarray(out),
                                  clip[:, 20:52, 10:42].astype(np.float32))


def test_downscale_matches_cv2_bilinear():
    """Full-canvas resample to a smaller grid == cv2 INTER_LINEAR (same
    pixel-center convention), within uint8 rounding."""
    clip = _canvas(b=1, t=2, s=64)[0]
    out = np.asarray(bilinear_crop_resize(jnp.asarray(clip),
                                          jnp.int32(0), jnp.int32(0),
                                          jnp.int32(64), jnp.int32(64), 48))
    for i in range(clip.shape[0]):
        ref = cv2.resize(clip[i], (48, 48),
                         interpolation=cv2.INTER_LINEAR).astype(np.float32)
        assert np.max(np.abs(out[i] - ref)) <= 1.0 + 1e-4


def test_flip_is_exact_mirror():
    """flip_prob=1, identity scale, out == canvas ⇒ exact horizontal mirror."""
    batch = _canvas(b=2, s=32)
    out = device_train_augment_jit(jnp.asarray(batch), jax.random.PRNGKey(0),
                                   out_size=32, scales=(1.0,), flip_prob=1.0)
    np.testing.assert_array_equal(np.asarray(out),
                                  batch[:, :, :, ::-1, :].astype(np.float32))


def test_param_distribution_matches_host():
    """Crop draws hit every candidate and every fixed offset; flips ≈ 1/2.
    (The host draws the same uniforms over the same sets,
    data/transforms.py:99-110.)"""
    base, n = 256, 400
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    draws = jax.vmap(lambda k: jnp.stack(
        [v.astype(jnp.int32) for v in sample_crop_params(k, base)]))(keys)
    draws = np.asarray(draws)  # (n, 5): x0, y0, cw, ch, flip
    cand = {tuple(c) for c in crop_candidates(base)}
    seen = {(int(w), int(h)) for w, h in draws[:, 2:4]}
    assert seen == cand, f"missing candidates: {cand - seen}"
    # every (w, h) must place its offsets on the quarter-step lattice
    for x0, y0, cw, ch, _ in draws:
        ws, hs = (base - cw) // 4, (base - ch) // 4
        assert x0 in {o * ws for o in range(5)}
        assert y0 in {o * hs for o in range(5)}
    flip_rate = draws[:, 4].mean()
    assert 0.35 < flip_rate < 0.65
    # host sanity: the host MultiScaleCrop yields shapes from the same set
    msc = MultiScaleCrop()
    host_rng = np.random.default_rng(0)
    clip = np.zeros((1, base, base, 3), np.uint8)
    host_seen = {msc(clip, host_rng).shape[1:3] for _ in range(200)}
    assert {(h, w) for w, h in seen} == host_seen


def test_batch_shapes_and_range():
    batch = _canvas(b=3, t=2, s=64)
    out = device_train_augment_jit(jnp.asarray(batch), jax.random.PRNGKey(2),
                                   out_size=48)
    assert out.shape == (3, 2, 48, 48, 3)
    assert out.dtype == jnp.float32
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 255.0


def test_per_sample_independence():
    """Different batch entries draw different crops (vmap key split)."""
    base = np.broadcast_to(_canvas(b=1, t=1, s=64)[0], (8, 1, 64, 64, 3))
    out = np.asarray(device_train_augment_jit(
        jnp.asarray(base), jax.random.PRNGKey(3), out_size=32))
    distinct = {out[i].tobytes() for i in range(8)}
    assert len(distinct) > 1


def test_trainer_integration_device_augment():
    """fast_dev_run with device_augment: canvas batches flow through the
    jitted augment + train step (DebugDataset emits image_size clips, so
    the canvas == image_size here; the step still exercises the traced
    crop/flip path end to end)."""
    from workoutdetector_tpu.config import load_config
    from workoutdetector_tpu.train.trainer import Trainer

    cfg = load_config(None, [
        "data.dataset_type=DebugDataset", "data.debug_size=16",
        "data.batch_size=8", "data.num_workers=0", "data.image_size=32",
        "data.device_augment=true", "model.base_model=resnet18",
        "model.num_class=2", "model.dropout=0.0",
        "trainer.fast_dev_run=true", "trainer.enable_checkpointing=false",
        "log.csv_enable=false", "log.tensorboard_enable=false",
    ])
    import tempfile
    with tempfile.TemporaryDirectory() as d:
        cfg.trainer.default_root_dir = d
        trainer = Trainer(cfg)
        state, history = trainer.fit()
    assert np.isfinite(history.get("best_val_acc", 0.0))
    assert int(state.step) == 1


def test_augment_rejects_non_square():
    with pytest.raises(ValueError):
        device_train_augment_jit(jnp.zeros((1, 2, 32, 48, 3), jnp.uint8),
                                 jax.random.PRNGKey(0), out_size=16)
