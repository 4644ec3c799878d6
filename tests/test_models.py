"""Model shape contracts, shift-injection behavior, partial-BN semantics.

Mirrors the reference suite's shape assertions (tests/test_models.py:24-59,
tests/test_tdn.py:17-66) on small inputs for CPU speed; convergence tests
live in test_trainer.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from workoutdetector_tpu.config import ModelConfig
from workoutdetector_tpu.models import TSM, TDN, build_model, create_model_state
from workoutdetector_tpu.models.resnet import resnet18, resnet50


SMALL = 64  # small spatial size for CPU tests


def test_resnet_shapes():
    model = resnet18(num_classes=10)
    x = jnp.zeros((2, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 10)
    feats = model.apply(variables, x, features_only=True)
    assert feats.shape == (2, 512)


def test_resnet50_feature_dim():
    model = resnet50(num_classes=0)
    x = jnp.zeros((1, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 2048)


def test_tsm_forward_shape():
    # (B, T, H, W, C) → (B, num_class); reference asserts
    # (B*8,3,224,224)→(B,n_cls) (tests/test_models.py:44-50)
    model = TSM(num_class=12, num_segments=8, base_model="resnet18")
    x = jnp.zeros((2, 8, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (2, 12)
    assert y.dtype == jnp.float32


def test_tsm_shift_changes_output():
    """Shift must mix information across segments: permuting segment order
    changes logits when is_shift, but consensus alone would not."""
    x = np.random.default_rng(0).standard_normal((1, 8, SMALL, SMALL, 3)).astype(
        np.float32)
    xs = jnp.asarray(x)
    perm = jnp.asarray(x[:, ::-1].copy())

    shifted = TSM(num_class=4, num_segments=8, base_model="resnet18", is_shift=True)
    v = shifted.init(jax.random.PRNGKey(1), xs)
    y1 = shifted.apply(v, xs)
    y2 = shifted.apply(v, perm)
    assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)

    unshifted = TSM(num_class=4, num_segments=8, base_model="resnet18", is_shift=False)
    v0 = unshifted.init(jax.random.PRNGKey(1), xs)
    z1 = unshifted.apply(v0, xs)
    z2 = unshifted.apply(v0, perm)
    # without shift, avg consensus is permutation-invariant
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-4)


def test_tsm_partial_bn_freezes_stats():
    model = TSM(num_class=2, num_segments=4, base_model="resnet18", partial_bn=True,
                dropout=0.0)
    x = jnp.ones((1, 4, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    _, updated = model.apply(variables, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    old = variables["batch_stats"]
    new = updated["batch_stats"]
    stem_old = old["backbone"]["bn1"]["mean"]
    stem_new = new["backbone"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(stem_old), np.asarray(stem_new))
    # a frozen body BN must be bit-identical
    body_old = old["backbone"]["layer1_0"]["bn1"]["mean"]
    body_new = new["backbone"]["layer1_0"]["bn1"]["mean"]
    np.testing.assert_array_equal(np.asarray(body_old), np.asarray(body_new))


def test_tsm_no_partial_bn_updates_all():
    model = TSM(num_class=2, num_segments=4, base_model="resnet18", partial_bn=False,
                dropout=0.0)
    x = jnp.ones((1, 4, SMALL, SMALL, 3)) * 2.0
    variables = model.init(jax.random.PRNGKey(0), x)
    _, updated = model.apply(variables, x, train=True, mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    body_old = variables["batch_stats"]["backbone"]["layer1_0"]["bn1"]["mean"]
    body_new = updated["batch_stats"]["backbone"]["layer1_0"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(body_old), np.asarray(body_new))


def test_tdn_forward_shape():
    # reference tests/test_tdn.py: input (B, T, 5, 3, H, W) → (B, n_cls)
    model = TDN(num_class=6, num_segments=4, base_model="resnet50")
    x = jnp.zeros((1, 4, 5, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(variables, x)
    assert y.shape == (1, 6)


def test_tdn_uses_diffs():
    """A constant-in-time clip has zero diffs; adding motion changes logits."""
    rng = np.random.default_rng(0)
    static = np.repeat(rng.standard_normal((1, 1, 1, SMALL, SMALL, 3)), 5,
                       axis=2).astype(np.float32)
    static = np.repeat(static, 4, axis=1)
    moving = static.copy()
    moving[:, :, 3:] += 0.5
    model = TDN(num_class=3, num_segments=4)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(static))
    y_static = model.apply(v, jnp.asarray(static))
    y_moving = model.apply(v, jnp.asarray(moving))
    assert not np.allclose(np.asarray(y_static), np.asarray(y_moving), atol=1e-5)


def test_factory_dispatch():
    for mt, shape in [("tsm", (1, 8, SMALL, SMALL, 3)),
                      ("image", (2, SMALL, SMALL, 3))]:
        cfg = ModelConfig(model_type=mt, num_class=5, base_model="resnet18",
                          dtype="float32")
        model, variables = create_model_state(cfg, jax.random.PRNGKey(0),
                                              batch=shape[0], image_size=SMALL)
        y = model.apply(variables, jnp.zeros(shape))
        assert y.shape == (shape[0], 5)


def test_tsm_bf16_compute():
    model = TSM(num_class=2, num_segments=4, base_model="resnet18",
                dtype=jnp.bfloat16)
    x = jnp.zeros((1, 4, SMALL, SMALL, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    # params stay fp32
    k = variables["params"]["backbone"]["conv1"]["kernel"]
    assert k.dtype == jnp.float32
    y = model.apply(variables, x)
    assert y.dtype == jnp.float32  # consensus promotes logits


def test_tdn_accepts_flat_burst_layout():
    """TDNDataset batches are (B, T*5, H, W, C); the model must unflatten
    and produce identical logits to the explicit 6-D layout."""
    model = TDN(num_class=3, num_segments=2)
    x6 = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 2, 5, SMALL, SMALL, 3)).astype(np.float32))
    v = model.init(jax.random.PRNGKey(0), x6)
    y6 = model.apply(v, x6)
    x5 = x6.reshape(2, 10, SMALL, SMALL, 3)
    y5 = model.apply(v, x5)
    np.testing.assert_allclose(np.asarray(y5), np.asarray(y6), atol=1e-6)


def test_tsm_block_shift_place():
    """shift_place='block' (whole-block input shift, reference
    make_temporal_shift place='block', tsm.py:116-123) runs and mixes time."""
    model = TSM(num_class=3, num_segments=4, base_model="resnet18",
                shift_place="block", dropout=0.0)
    x = np.random.default_rng(0).standard_normal((1, 4, SMALL, SMALL, 3)).astype(
        np.float32)
    v = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y1 = model.apply(v, jnp.asarray(x))
    y2 = model.apply(v, jnp.asarray(x[:, ::-1].copy()))
    assert y1.shape == (1, 3)
    assert not np.allclose(np.asarray(y1), np.asarray(y2), atol=1e-4)


def test_tsm_identity_consensus():
    """consensus_type='identity' returns per-segment logits
    (reference SegmentConsensus 'identity', tsm.py:169-170)."""
    model = TSM(num_class=5, num_segments=4, base_model="resnet18",
                consensus_type="identity", dropout=0.0)
    x = jnp.zeros((2, 4, SMALL, SMALL, 3))
    v = model.init(jax.random.PRNGKey(0), x)
    y = model.apply(v, x)
    assert y.shape == (2, 4, 5)


def test_tdn_partial_bn_freezes_stats():
    """partial_bn must freeze BN running stats model-side for TDN too —
    the optimizer freezes the same BNs' scale/bias (optim 'frozen'
    labels), and stats drifting under pinned affine breaks ported
    checkpoints. The RGB stem bn1 (the one live BN) must still update."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 1.0, (1, 2, 5, SMALL, SMALL, 3))
                    .astype(np.float32))
    model = TDN(num_class=2, num_segments=2, partial_bn=True, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, updated = model.apply(variables, x, train=True,
                             mutable=["batch_stats"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    old, new = variables["batch_stats"], updated["batch_stats"]
    assert not np.allclose(np.asarray(old["bn1"]["mean"]),
                           np.asarray(new["bn1"]["mean"]))
    for frozen_key in ("bn1_5",):
        np.testing.assert_array_equal(np.asarray(old[frozen_key]["mean"]),
                                      np.asarray(new[frozen_key]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(old["layer1_0"]["bn1"]["mean"]),
        np.asarray(new["layer1_0"]["bn1"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(old["layer2_0"]["mse"]["bn1"]["mean"]),
        np.asarray(new["layer2_0"]["mse"]["bn1"]["mean"]))

    # and without partial_bn everything updates
    model2 = TDN(num_class=2, num_segments=2, partial_bn=False, dropout=0.0)
    v2 = model2.init(jax.random.PRNGKey(0), x)
    _, up2 = model2.apply(v2, x, train=True, mutable=["batch_stats"],
                          rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(
        np.asarray(v2["batch_stats"]["layer1_0"]["bn1"]["mean"]),
        np.asarray(up2["batch_stats"]["layer1_0"]["bn1"]["mean"]))


def test_tpn_partial_bn_freezes_stats():
    from workoutdetector_tpu.models.tpn import TPN
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(2.0, 1.0, (1, 4, SMALL, SMALL, 3))
                    .astype(np.float32))
    model = TPN(num_class=2, num_segments=4, base_model="resnet18",
                partial_bn=True, dropout=0.0)
    variables = model.init(jax.random.PRNGKey(0), x)
    _, updated = model.apply(variables, x, train=True,
                             mutable=["batch_stats", "intermediates"],
                             rngs={"dropout": jax.random.PRNGKey(1)})
    old, new = variables["batch_stats"], updated["batch_stats"]
    # backbone stem live, backbone body + neck frozen
    assert not np.allclose(np.asarray(old["backbone"]["bn1"]["mean"]),
                           np.asarray(new["backbone"]["bn1"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(old["backbone"]["layer1_0"]["bn1"]["mean"]),
        np.asarray(new["backbone"]["layer1_0"]["bn1"]["mean"]))
    np.testing.assert_array_equal(
        np.asarray(old["pyramid_fusion"]["bn"]["mean"]),
        np.asarray(new["pyramid_fusion"]["bn"]["mean"]))
