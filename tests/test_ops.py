"""Preprocessing + temporal-shift op tests: numpy references as oracles,
Pallas kernel parity in interpreter mode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from workoutdetector_tpu.ops.preprocess import (normalize_clip, preprocess_windows,
                                                resize_center_crop,
                                                sparse_window_gather)
from workoutdetector_tpu.ops.temporal_shift import temporal_shift, temporal_shift_flat
from workoutdetector_tpu.ops.pallas.shift import temporal_shift_pallas


def _np_shift(x: np.ndarray, fold_div: int = 8) -> np.ndarray:
    """Reference numpy temporal shift (semantics of reference tsm.py:34-50,
    re-expressed in NHWC)."""
    out = np.zeros_like(x)
    c = x.shape[-1]
    fold = c // fold_div
    out[:, :-1, ..., :fold] = x[:, 1:, ..., :fold]  # shift left
    out[:, 1:, ..., fold:2 * fold] = x[:, :-1, ..., fold:2 * fold]  # shift right
    out[..., 2 * fold:] = x[..., 2 * fold:]
    return out


def test_normalize_clip_matches_torchvision_formula():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(2, 8, 8, 3), dtype=np.uint8)
    got = np.asarray(normalize_clip(jnp.asarray(x)))
    mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
    std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
    want = (x.astype(np.float32) / 255.0 - mean) / std
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_sparse_window_gather_semantics():
    # matches reference vid[i:i+16:2] with zero-pad tail
    t, h, w, c = 20, 4, 4, 3
    video = np.arange(t, dtype=np.float32).reshape(t, 1, 1, 1) * np.ones((t, h, w, c),
                                                                         np.float32)
    starts = jnp.asarray([0, 8, 16], dtype=jnp.int32)
    out = np.asarray(sparse_window_gather(jnp.asarray(video), starts))
    assert out.shape == (3, 8, h, w, c)
    np.testing.assert_array_equal(out[0, :, 0, 0, 0], [0, 2, 4, 6, 8, 10, 12, 14])
    np.testing.assert_array_equal(out[1, :, 0, 0, 0], [8, 10, 12, 14, 16, 18, 0, 0])
    np.testing.assert_array_equal(out[2, :, 0, 0, 0], [16, 18, 0, 0, 0, 0, 0, 0])


def test_preprocess_windows_fused():
    rng = np.random.default_rng(1)
    video = rng.integers(0, 256, size=(30, 16, 16, 3), dtype=np.uint8)
    starts = jnp.asarray([0, 24], dtype=jnp.int32)
    out = preprocess_windows(jnp.asarray(video), starts)
    assert out.shape == (2, 8, 16, 16, 3)
    # window 0 frame 0 == normalized frame 0
    want = np.asarray(normalize_clip(jnp.asarray(video[0])))
    np.testing.assert_allclose(np.asarray(out[0, 0]), want, rtol=1e-5, atol=1e-6)
    # padded tail frames normalize from zero, not to zero
    pad = np.asarray(out[1, 7])
    want_pad = np.asarray(normalize_clip(jnp.zeros((16, 16, 3), jnp.uint8)))
    np.testing.assert_allclose(pad, want_pad, rtol=1e-5)


def test_resize_center_crop_shapes():
    x = jnp.zeros((2, 240, 320, 3), jnp.uint8)
    y = resize_center_crop(x, 256, 224)
    assert y.shape == (2, 224, 224, 3)
    x2 = jnp.zeros((2, 500, 300, 3), jnp.uint8)
    assert resize_center_crop(x2, 256, 224).shape == (2, 224, 224, 3)


@pytest.mark.parametrize("c,fold_div", [(64, 8), (16, 8), (32, 4)])
def test_temporal_shift_vs_numpy(c, fold_div):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 8, 3, 3, c)).astype(np.float32)
    got = np.asarray(temporal_shift(jnp.asarray(x), fold_div))
    np.testing.assert_allclose(got, _np_shift(x, fold_div), rtol=1e-6)


def test_temporal_shift_flat_roundtrip():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2 * 8, 4, 4, 16)).astype(np.float32)
    got = np.asarray(temporal_shift_flat(jnp.asarray(x), n_segment=8))
    want = _np_shift(x.reshape(2, 8, 4, 4, 16)).reshape(16, 4, 4, 16)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_temporal_shift_grad_flows():
    x = jnp.ones((1, 4, 2, 2, 8))
    g = jax.grad(lambda v: jnp.sum(temporal_shift(v) ** 2))(x)
    assert g.shape == x.shape
    assert bool(jnp.any(g != 0))


@pytest.mark.parametrize("shape,fold_div", [((1, 8, 8, 8, 64), 8), ((2, 4, 4, 4, 32), 8)])
def test_pallas_shift_parity(shape, fold_div):
    rng = np.random.default_rng(4)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(temporal_shift_pallas(jnp.asarray(x), fold_div, interpret=True))
    np.testing.assert_allclose(got, _np_shift(x, fold_div), rtol=1e-6)


def test_nearest_resize_2x_matches_jax_image():
    """TDN's broadcast 2x-upsample fast path is bit-identical to
    jax.image.resize nearest (and falls back for non-2x shapes)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from workoutdetector_tpu.models.tdn import _nearest_resize

    rng = np.random.default_rng(0)
    for (h, w) in ((4, 4), (7, 5), (14, 14)):
        x = jnp.asarray(rng.normal(size=(2, h, w, 3)), jnp.float32)
        want = jax.image.resize(x, (2, 2 * h, 2 * w, 3), method="nearest")
        got = _nearest_resize(x, (2, 2 * h, 2 * w, 3))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # non-2x (odd upsample, stage-4's 3->7) falls back, still nearest
    x = jnp.asarray(rng.normal(size=(1, 3, 3, 2)), jnp.float32)
    got = _nearest_resize(x, (1, 7, 7, 2))
    want = jax.image.resize(x, (1, 7, 7, 2), method="nearest")
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
