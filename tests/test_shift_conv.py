"""Fused shift-conv parity: ops.shift_conv must equal conv(shift(x))
exactly, op-level and model-level (same param tree drives both paths)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from workoutdetector_tpu.models import TSM
from workoutdetector_tpu.ops.temporal_shift import (shift_conv,
                                                    temporal_shift_flat)

SMALL = 32


@pytest.mark.parametrize("khw,strides,padding,c,o", [
    ((1, 1), (1, 1), "SAME", 64, 16),
    ((3, 3), (1, 1), [(1, 1), (1, 1)], 32, 32),
    ((3, 3), (2, 2), [(1, 1), (1, 1)], 16, 8),
])
def test_shift_conv_matches_unfused(khw, strides, padding, c, o):
    rng = np.random.default_rng(0)
    bt, h, w = 2 * 4, 8, 8
    x = jnp.asarray(rng.standard_normal((bt, h, w, c)).astype(np.float32))
    kernel = jnp.asarray(rng.standard_normal(khw + (c, o)).astype(np.float32) * 0.1)

    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        temporal_shift_flat(x, n_segment=4, fold_div=8), kernel, strides, padding,
        dimension_numbers=dn)
    got = shift_conv(x, kernel, n_segment=4, fold_div=8, strides=strides,
                     padding=padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_tsm_fused_matches_unfused_model():
    """Same params through the fused (shift_impl='xla') and hook-based
    ('unfused') TSM paths → identical logits; the param trees must also be
    identical (checkpoint compatibility)."""
    from flax import traverse_util

    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 4, SMALL, SMALL, 3)).astype(np.float32))
    fused = TSM(num_class=5, num_segments=4, base_model="resnet18", dropout=0.0,
                shift_impl="xla")
    unfused = TSM(num_class=5, num_segments=4, base_model="resnet18", dropout=0.0,
                  shift_impl="unfused")
    v = fused.init(jax.random.PRNGKey(0), x)
    v2 = unfused.init(jax.random.PRNGKey(0), x)
    keys1 = set(traverse_util.flatten_dict(v["params"]))
    keys2 = set(traverse_util.flatten_dict(v2["params"]))
    assert keys1 == keys2  # checkpoint-compatible
    y_fused = fused.apply(v, x)
    y_unfused = unfused.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_fused), np.asarray(y_unfused),
                               rtol=1e-4, atol=1e-5)


def test_tsm_fused_grad_flows():
    import optax
    x = jnp.asarray(np.random.default_rng(2).standard_normal(
        (1, 4, SMALL, SMALL, 3)).astype(np.float32))
    y = jnp.asarray([1])
    model = TSM(num_class=2, num_segments=4, base_model="resnet18", dropout=0.0)
    v = model.init(jax.random.PRNGKey(0), x)

    def loss(p):
        out, _ = model.apply({"params": p, "batch_stats": v["batch_stats"]},
                             x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
        return optax.softmax_cross_entropy_with_integer_labels(out, y).mean()

    g = jax.grad(loss)(v["params"])
    gk = np.asarray(g["backbone"]["layer1_0"]["conv1"]["kernel"])
    assert np.isfinite(gk).all() and (gk != 0).any()


def test_pallas_shift_matmul_parity_and_grads():
    """Single-pass Pallas shift-matmul (interpret mode) vs the XLA
    formulation: values and both gradients exact."""
    from workoutdetector_tpu.ops.pallas.shift_matmul import make_shift_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2 * 4, 8, 8, 64)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((64, 16)).astype(np.float32) * 0.1)
    op = make_shift_matmul(4, 8, interpret=True)
    want = shift_conv(x, w[None, None], 4, 8)
    np.testing.assert_allclose(np.asarray(op(x, w)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda xv: jnp.sum(op(xv, w) ** 2))(x)
    g2 = jax.grad(lambda xv: jnp.sum(shift_conv(xv, w[None, None], 4, 8) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)
    gw1 = jax.grad(lambda wv: jnp.sum(op(x, wv) ** 2))(w)
    gw2 = jax.grad(
        lambda wv: jnp.sum(shift_conv(x, wv[None, None], 4, 8) ** 2))(w)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2), rtol=1e-4,
                               atol=1e-5)


def test_tsm_pallas_impl_matches_xla():
    """shift_impl='pallas' (fused pallas matmul at 1×1 sites) must produce
    the same logits as 'xla' with shared params (interpret on CPU)."""
    from jax.experimental.pallas import tpu as pltpu

    x = jnp.asarray(np.random.default_rng(3).standard_normal(
        (1, 4, SMALL, SMALL, 3)).astype(np.float32))
    xla_model = TSM(num_class=3, num_segments=4, base_model="resnet50",
                    dropout=0.0, shift_impl="xla")
    pl_model = TSM(num_class=3, num_segments=4, base_model="resnet50",
                   dropout=0.0, shift_impl="pallas")
    v = xla_model.init(jax.random.PRNGKey(0), x)
    y_xla = xla_model.apply(v, x)
    with pltpu.force_tpu_interpret_mode():
        y_pl = pl_model.apply(v, x)
    np.testing.assert_allclose(np.asarray(y_pl), np.asarray(y_xla),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("khw,strides,padding,c,o", [
    ((1, 1), (1, 1), "SAME", 64, 16),
    ((3, 3), (1, 1), [(1, 1), (1, 1)], 32, 32),
    ((3, 3), (2, 2), [(1, 1), (1, 1)], 16, 8),
])
def test_shift_conv_edge_matches_unfused(khw, strides, padding, c, o):
    """VERDICT r4 #6 lever: the edge-correction formulation (unmasked
    rolled folds + per-clip-boundary repair convs) is EXACTLY the
    shifted conv — including the roll wraparound across clip boundaries
    and the batch wraparound at clip 0/B-1."""
    from workoutdetector_tpu.ops.temporal_shift import shift_conv_edge

    rng = np.random.default_rng(3)
    bt, h, w = 3 * 4, 8, 8  # odd clip count exercises the batch roll
    x = jnp.asarray(rng.standard_normal((bt, h, w, c)).astype(np.float32))
    kernel = jnp.asarray(
        rng.standard_normal(khw + (c, o)).astype(np.float32) * 0.1)
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    want = jax.lax.conv_general_dilated(
        temporal_shift_flat(x, n_segment=4, fold_div=8), kernel, strides,
        padding, dimension_numbers=dn)
    got = shift_conv_edge(x, kernel, n_segment=4, fold_div=8,
                          strides=strides, padding=padding)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_tsm_xla_edge_impl_matches_xla():
    x = jnp.asarray(np.random.default_rng(5).standard_normal(
        (2, 4, SMALL, SMALL, 3)).astype(np.float32))
    a = TSM(num_class=5, num_segments=4, base_model="resnet18",
            dropout=0.0, shift_impl="xla")
    b = TSM(num_class=5, num_segments=4, base_model="resnet18",
            dropout=0.0, shift_impl="xla-edge")
    v = a.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(np.asarray(b.apply(v, x)),
                               np.asarray(a.apply(v, x)),
                               rtol=1e-4, atol=1e-5)


def test_shift_round_placement():
    """shift_round=2 shifts every other block (the reference's resnet101
    n_round rule made sweepable); the param tree is unchanged, and the
    un-shifted blocks' conv1 reverts to a plain conv (logits differ from
    every-block shift but match a hook-based every-other-block oracle)."""
    from flax import traverse_util

    from workoutdetector_tpu.ops.temporal_shift import temporal_shift_flat

    x = jnp.asarray(np.random.default_rng(6).standard_normal(
        (2, 4, SMALL, SMALL, 3)).astype(np.float32))
    base = TSM(num_class=5, num_segments=4, base_model="resnet18",
               dropout=0.0, shift_impl="xla")
    half = TSM(num_class=5, num_segments=4, base_model="resnet18",
               dropout=0.0, shift_impl="xla", shift_round=2)
    half_unfused = TSM(num_class=5, num_segments=4, base_model="resnet18",
                       dropout=0.0, shift_impl="unfused", shift_round=2)
    v = base.init(jax.random.PRNGKey(0), x)
    assert set(traverse_util.flatten_dict(v["params"])) == \
        set(traverse_util.flatten_dict(
            half.init(jax.random.PRNGKey(0), x)["params"]))
    y_all = base.apply(v, x)
    y_half = half.apply(v, x)
    assert np.abs(np.asarray(y_all) - np.asarray(y_half)).max() > 1e-6
    np.testing.assert_allclose(np.asarray(half_unfused.apply(v, x)),
                               np.asarray(y_half), rtol=1e-4, atol=1e-5)
