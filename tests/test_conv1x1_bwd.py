"""Pallas backward kernels for bottleneck 1×1 convs (VERDICT r4 #2).

ops/pallas/conv1x1: forward is the IDENTICAL XLA convolution (asserted
bit-exact), backward swaps the two cotangent contractions (g @ Wᵀ and
xᵀ @ g) for Pallas matmul kernels. Gated here on the CPU interpreter;
the v5e A/B lives in tools/train_bench.py --pallas-conv-bwd with
measured numbers in docs/PERF.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from workoutdetector_tpu.ops.pallas.conv1x1 import make_conv1x1


def _ref(x, k):
    return lax.conv_general_dilated(
        x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))


@pytest.mark.parametrize("shape", [
    (8, 8, 8, 64, 128),    # rows=512: the Pallas kernels
    (4, 16, 16, 128, 64),  # rows=1024, two row tiles
    (4, 7, 7, 256, 128),   # ragged rows: XLA fallback branch
])
def test_conv1x1_vjp_matches_xla(shape):
    n, h, w, c, o = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, c, o)).astype(np.float32) * .05)
    g = jnp.asarray(rng.normal(size=(n, h, w, o)).astype(np.float32))
    op = make_conv1x1()
    y_ref, vjp_ref = jax.vjp(_ref, x, k)
    y, vjp = jax.vjp(lambda a, b: op(a, b), x, k)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    (dx, dk), (dx_r, dk_r) = vjp(g), vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)


def test_conv1x1_bf16_path():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 64)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    k = (jnp.asarray(rng.normal(size=(1, 1, 64, 128)).astype(np.float32))
         * 0.05).astype(jnp.bfloat16)
    g = jnp.asarray(rng.normal(size=(8, 8, 8, 128)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    op = make_conv1x1()
    _, vjp = jax.vjp(lambda a, b: op(a, b), x, k)
    _, vjp_ref = jax.vjp(_ref, x, k)
    (dx, dk), (dx_r, dk_r) = vjp(g), vjp_ref(g)
    assert dx.dtype == jnp.bfloat16 and dk.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(dx, np.float32),
                               np.asarray(dx_r, np.float32),
                               rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(dk, np.float32),
                               np.asarray(dk_r, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_tsm_r50_train_grads_match_with_pallas_bwd():
    """The wired lever: a TSM-R50 loss gradient with
    model.pallas_conv_bwd on equals the XLA gradient (param tree
    identical, forward bit-exact, cotangents within f32 tolerance)."""
    from workoutdetector_tpu.models.tsm import TSM

    kw = dict(num_class=2, num_segments=4, base_model="resnet50",
              dropout=0.0, dtype=jnp.float32)
    ref_m = TSM(**kw)
    pal_m = TSM(**kw, pallas_conv_bwd=True)
    # batch 4 × T4 × 32px: stage-1 rows = 16·8·8 = 1024 → Pallas path
    x = jnp.asarray(np.random.default_rng(2).normal(
        size=(4, 4, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
    variables = ref_m.init({"params": jax.random.PRNGKey(0)}, x[:1],
                           train=False)
    assert jax.tree_util.tree_structure(
        pal_m.init({"params": jax.random.PRNGKey(0)}, x[:1],
                   train=False)) == jax.tree_util.tree_structure(variables)

    def loss(m, params):
        logits = m.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         x, train=False)
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(4), y])

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(ref_m, p))(
        variables["params"])
    l_pal, g_pal = jax.value_and_grad(lambda p: loss(pal_m, p))(
        variables["params"])
    assert float(l_ref) == float(l_pal)  # identical forward
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pal))
    checked = 0
    for path, leaf in flat_r:
        other = flat_p[path]
        np.testing.assert_allclose(np.asarray(other), np.asarray(leaf),
                                   rtol=5e-4, atol=5e-5,
                                   err_msg=str(path))
        checked += 1
    assert checked == len(flat_r)


@pytest.mark.parametrize("rows_shape", [
    (8, 8, 8),    # rows=512
    (12, 4, 4),   # rows=192 (16-aligned, non-512)
    (3, 5, 5),    # rows=75: no aligned tile -> XLA vjp fallback
])
def test_shift_conv1x1_vjp_matches_xla(rows_shape):
    """The shift-fused Pallas backward (make_shift_conv1x1): forward is
    exactly shift_conv, and dx/dW match jax.vjp of shift_conv — the
    reverse-shift transpose (opposite rolls + opposite edge masks)
    included."""
    from workoutdetector_tpu.ops.pallas.conv1x1 import make_shift_conv1x1
    from workoutdetector_tpu.ops.temporal_shift import shift_conv

    bt, h, w = rows_shape[0] * 4, rows_shape[1], rows_shape[2]
    c, o = 64, 32
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(bt, h, w, c)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(1, 1, c, o)).astype(np.float32) * .05)
    g = jnp.asarray(rng.normal(size=(bt, h, w, o)).astype(np.float32))

    def ref(xv, kv):
        return shift_conv(xv, kv, n_segment=4, fold_div=8)

    op = make_shift_conv1x1(n_segment=4, fold_div=8)
    y_ref, vjp_ref = jax.vjp(ref, x, k)
    y, vjp = jax.vjp(lambda a, b: op(a, b), x, k)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))
    (dx, dk), (dx_r, dk_r) = vjp(g), vjp_ref(g)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(dx_r),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_r),
                               rtol=1e-4, atol=1e-4)


def test_tsm_r50_shifted_grads_match_with_pallas_bwd():
    """With pallas_conv_bwd on, the SHIFTED conv1 sites route through
    make_shift_conv1x1 (forward identical, grads within tolerance) —
    the full-model gate over every swapped site at once."""
    from workoutdetector_tpu.models.tsm import TSM

    kw = dict(num_class=2, num_segments=4, base_model="resnet50",
              dropout=0.0, dtype=jnp.float32, is_shift=True)
    ref_m = TSM(**kw)
    pal_m = TSM(**kw, pallas_conv_bwd=True)
    x = jnp.asarray(np.random.default_rng(8).normal(
        size=(4, 4, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(np.array([0, 1, 1, 0], np.int32))
    variables = ref_m.init({"params": jax.random.PRNGKey(1)}, x[:1],
                           train=False)

    def loss(m, params):
        logits = m.apply({"params": params,
                          "batch_stats": variables["batch_stats"]},
                         x, train=False)
        return jnp.mean(-jax.nn.log_softmax(logits)[jnp.arange(4), y])

    l_ref, g_ref = jax.value_and_grad(lambda p: loss(ref_m, p))(
        variables["params"])
    l_pal, g_pal = jax.value_and_grad(lambda p: loss(pal_m, p))(
        variables["params"])
    assert float(l_ref) == float(l_pal)
    flat_p = dict(jax.tree_util.tree_leaves_with_path(g_pal))
    for path, leaf in jax.tree_util.tree_leaves_with_path(g_ref):
        np.testing.assert_allclose(np.asarray(flat_p[path]),
                                   np.asarray(leaf),
                                   rtol=5e-4, atol=5e-5, err_msg=str(path))
