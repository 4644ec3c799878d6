"""Whole-block Pallas fusion (ops/pallas/fused_block.py) parity.

The fused bottleneck must be numerically interchangeable with the unfused
flax Bottleneck at inference (same variables, same output) and must leave
the param tree bit-identical so checkpoints and train/eval steps
interoperate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from workoutdetector_tpu.models.resnet import Bottleneck, FrozenAwareBatchNorm
from workoutdetector_tpu.models.tsm import TSM
from workoutdetector_tpu.ops.pallas.fused_block import (
    FusedBlockParams, fold_bn, fused_bottleneck)
from workoutdetector_tpu.ops.temporal_shift import temporal_shift_flat

from functools import partial


def _ref_block(x, p: FusedBlockParams, n_segment, fold):
    """Unfused jnp composition with the same folded scale/bias math."""
    y = x
    if fold > 0:
        y = temporal_shift_flat(x, n_segment, x.shape[-1] // fold)
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(v, k, strides=(1, 1), padding="SAME"):
        num = jax.lax.conv_dimension_numbers(v.shape, k.shape, dn)
        return jax.lax.conv_general_dilated(v, k, strides, padding,
                                            dimension_numbers=num)

    y = jnp.maximum(conv(y, p.w1[None, None]) * p.sb1[0] + p.sb1[1], 0.0)
    y = y.astype(x.dtype)
    y = jnp.maximum(conv(y, p.w2) * p.sb2[0] + p.sb2[1], 0.0)
    y = y.astype(x.dtype)
    y = conv(y, p.w3[None, None]) * p.sb3[0] + p.sb3[1]
    res = x
    if p.wd is not None:
        res = conv(x, p.wd[None, None]) * p.sbd[0] + p.sbd[1]
    return jnp.maximum(y + res, 0.0).astype(x.dtype)


def _rand_params(rng, c, f, o, with_ds):
    ks = rng.standard_normal
    wd = sbd = None
    if with_ds:
        wd = jnp.asarray(ks((c, o)), jnp.float32) * 0.1
        sbd = jnp.asarray(np.stack([1 + 0.1 * ks(o), 0.1 * ks(o)]),
                          jnp.float32)
    return FusedBlockParams(
        w1=jnp.asarray(ks((c, f)), jnp.float32) * 0.1,
        sb1=jnp.asarray(np.stack([1 + 0.1 * ks(f), 0.1 * ks(f)]), jnp.float32),
        w2=jnp.asarray(ks((3, 3, f, f)), jnp.float32) * 0.1,
        sb2=jnp.asarray(np.stack([1 + 0.1 * ks(f), 0.1 * ks(f)]), jnp.float32),
        w3=jnp.asarray(ks((f, o)), jnp.float32) * 0.1,
        sb3=jnp.asarray(np.stack([1 + 0.1 * ks(o), 0.1 * ks(o)]), jnp.float32),
        wd=wd, sbd=sbd)


@pytest.mark.parametrize("with_ds", [False, True])
@pytest.mark.parametrize("fold_div", [0, 4])
def test_kernel_matches_reference(with_ds, fold_div):
    rng = np.random.default_rng(0)
    t, b, h, w, c, f = 4, 2, 8, 8, 16, 8
    o = c if not with_ds else 2 * c
    p = _rand_params(rng, c, f, o, with_ds)
    x = jnp.asarray(rng.standard_normal((b * t, h, w, c)), jnp.float32)
    fold = 0 if fold_div == 0 else c // fold_div
    got = fused_bottleneck(x, p, n_segment=t, fold=fold, interpret=True)
    want = _ref_block(x, p, t, fold)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_kernel_row_tiling_halo():
    """Force multiple row tiles (small VMEM budget path exercised via a
    taller frame) — the 3x3 halo rows must match the unfused conv."""
    rng = np.random.default_rng(1)
    t, b, h, w, c, f = 2, 1, 16, 8, 8, 8
    p = _rand_params(rng, c, f, c, False)
    x = jnp.asarray(rng.standard_normal((b * t, h, w, c)), jnp.float32)
    got = fused_bottleneck(x, p, n_segment=t, fold=2, row_tile=4,
                           interpret=True)
    want = _ref_block(x, p, t, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def _bottleneck(fuse, **kw):
    norm = partial(FrozenAwareBatchNorm, momentum=0.9, epsilon=1e-5,
                   dtype=jnp.float32, frozen=False)
    return Bottleneck(filters=8, strides=1, dtype=jnp.float32, norm=norm,
                      fuse_impl=fuse, **kw)


@pytest.mark.parametrize("downsample", [False, True])
def test_bottleneck_param_tree_identical(downsample):
    c_in = 16 if downsample else 32  # no-downsample blocks need C == 4F
    x = jnp.zeros((4, 8, 8, c_in), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        v_fused = _bottleneck("pallas", downsample=downsample).init(
            jax.random.PRNGKey(0), x, train=False)
    v_plain = _bottleneck(None, downsample=downsample).init(
        jax.random.PRNGKey(0), x, train=False)
    flat_f = jax.tree_util.tree_flatten_with_path(v_fused)[0]
    flat_p = jax.tree_util.tree_flatten_with_path(v_plain)[0]
    assert [(k, v.shape) for k, v in flat_f] == \
        [(k, v.shape) for k, v in flat_p]
    for (kf, vf), (_, vp) in zip(flat_f, flat_p):
        np.testing.assert_array_equal(np.asarray(vf), np.asarray(vp),
                                      err_msg=str(kf))


@pytest.mark.parametrize("downsample", [False, True])
def test_bottleneck_fused_matches_unfused(downsample):
    rng = jax.random.PRNGKey(2)
    c_in = 16 if downsample else 32  # no-downsample blocks need C == 4F
    x = jax.random.normal(jax.random.PRNGKey(3), (4, 8, 8, c_in),
                          jnp.float32)
    shift = (2, 8)  # n_segment=2, fold_div=8 → fold=2
    plain = _bottleneck(None, downsample=downsample, shift=shift)
    variables = plain.init(rng, x, train=False)
    # perturb BN stats so folding is non-trivial
    variables = jax.tree_util.tree_map(
        lambda v: v + 0.05 if v.ndim == 1 else v, variables)
    want = plain.apply(variables, x, train=False)
    fused = _bottleneck("pallas", downsample=downsample, shift=shift)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_bottleneck_train_falls_back():
    """train=True must take the unfused path (batch-stat BN) even when
    fuse_impl is set — outputs must match the plain module exactly."""
    rng = jax.random.PRNGKey(4)
    x = jax.random.normal(jax.random.PRNGKey(5), (4, 8, 8, 16), jnp.float32)
    plain = _bottleneck(None, downsample=True)
    variables = plain.init(rng, x, train=False)
    fused = _bottleneck("pallas", downsample=True)
    want, wm = plain.apply(variables, x, train=True,
                           mutable=["batch_stats"])
    got, gm = fused.apply(variables, x, train=True,
                          mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)), wm, gm)


def test_tsm_fused_matches_unfused():
    """Full TSM-R50-style model (tiny resnet50 layout is too big for a CPU
    test — use the real arch at reduced input) with fused stages 0-1."""
    kw = dict(num_class=5, num_segments=4, base_model="resnet50",
              dropout=0.0, dtype=jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 64, 64, 3),
                          jnp.float32)
    plain = TSM(fused_block=False, **kw)
    variables = plain.init({"params": jax.random.PRNGKey(7)}, x, train=False)
    want = plain.apply(variables, x, train=False)
    fused = TSM(fused_block=True, **kw)
    with pltpu.force_tpu_interpret_mode():
        got = fused.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-5, atol=5e-5)
