"""MoE MLP (models/moe.py) + expert parallelism over the mesh.

The reference has no MoE (SURVEY §2.8 "EP — NO"); this beyond-reference
family completes the parallelism coverage. Pinned here: top-1 routing
math against a hand-computed oracle, capacity-overflow dropping, the
Switch aux loss reaching the trainer objective, and expert-parallel
(sharded) == replicated training on the 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.models.moe import MoEMlp
from workoutdetector_tpu.parallel.mesh import create_mesh, shard_batch
from workoutdetector_tpu.train.trainer import Trainer, collect_sown

SMALL = 16


def _gelu(x):
    return np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))


def test_top1_routing_matches_manual():
    """With ample capacity every token goes through exactly its argmax
    expert, scaled by the chosen gate probability."""
    d, h, e, t = 4, 6, 3, 10
    m = MoEMlp(dim=d, hidden=h, num_experts=e, capacity_factor=float(t))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(t, d)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(1), x)
    y = np.asarray(m.apply(variables, x))

    p = jax.device_get(variables["params"])
    logits = x @ p["router"]["kernel"] + p["router"]["bias"]
    gates = np.asarray(jax.nn.softmax(logits, axis=-1))
    xs = np.asarray(x)
    for i in range(t):
        ei = int(np.argmax(gates[i]))
        hdn = _gelu(xs[i] @ p["w1"][ei] + p["b1"][ei][0])
        expect = gates[i, ei] * (hdn @ p["w2"][ei] + p["b2"][ei][0])
        np.testing.assert_allclose(y[i], expect, rtol=1e-4, atol=1e-5)


def test_capacity_overflow_drops_tokens():
    """cap=1 per expert: with every token routed to the same expert only
    the first survives; dropped tokens output exactly 0 (the residual in
    the host block carries them)."""
    d, h, t = 4, 6, 8
    m = MoEMlp(dim=d, hidden=h, num_experts=2, capacity_factor=1e-9)
    # identical tokens → identical routing → one expert gets them all
    x = jnp.ones((t, d), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = np.asarray(m.apply(variables, x))
    assert np.any(y[0] != 0.0)
    np.testing.assert_array_equal(y[1:], 0.0)


def test_moe_aux_loss_sown_and_collected():
    d = 8
    m = MoEMlp(dim=d, hidden=16, num_experts=2)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 5, d)),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    _, inter = m.apply(variables, x, mutable=["intermediates"])
    vals = collect_sown(inter["intermediates"], "moe_loss")
    assert len(vals) == 1
    # Switch aux: E * Σ f_e p_e ∈ [1 (balanced), E (collapsed)]
    v = float(vals[0])
    assert 1.0 - 1e-5 <= v <= 2.0 + 1e-5

    # nested scopes are reached too
    nested = {"block_0": {"mlp": {"moe_loss": (jnp.float32(1.5),)}},
              "block_1": {"mlp": {"moe_loss": (jnp.float32(2.0),)}}}
    got = sorted(float(v) for v in collect_sown(nested, "moe_loss"))
    assert got == [1.5, 2.0]


def _moe_tsf_cfg():
    cfg = Config()
    cfg.model.model_type = "timesformer"
    cfg.model.base_model = "tiny"
    cfg.model.num_class = 2
    cfg.model.num_segments = 4
    cfg.model.image_size = SMALL
    cfg.model.patch_size = 8
    cfg.model.embed_dims = 32
    cfg.model.num_layers = 2
    cfg.model.num_heads = 2
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.model.partial_bn = False
    cfg.model.moe_experts = 2
    cfg.data.image_size = SMALL
    cfg.data.num_segments = 4
    cfg.optimizer.use_tsn_policies = False
    return cfg


def test_expert_parallel_matches_replicated():
    """TimeSformer-tiny with MoE MLPs: on a (4,2) mesh each device holds
    E/2 experts (w1/w2 stacks partitioned on their leading dim) and the
    run matches the (8,1) replicated run exactly."""
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (8, 4, SMALL, SMALL, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)

    results = {}
    for model_axis in (1, 2):
        mesh = create_mesh(model=model_axis)
        trainer = Trainer(_moe_tsf_cfg(), mesh=mesh)
        state = trainer.init_state(steps_per_epoch=2, image_size=SMALL)
        if model_axis == 2:
            w1 = state.params["block_0"]["mlp"]["w1"]
            assert not w1.sharding.is_fully_replicated, \
                "expert stack not partitioned (ep is decorative)"
            shard = w1.addressable_shards[0].data.shape
            assert shard[0] * 2 == w1.shape[0], \
                f"expected 1 expert/device, got shard {shard} of {w1.shape}"
        step = trainer.train_step_fn()
        bx, by = shard_batch((x, y), mesh)
        state, m1 = step(state, bx, by)
        state, m2 = step(state, bx, by)
        results[model_axis] = (float(m1["loss"]), float(m2["loss"]),
                               np.asarray(state.params["fc"]["kernel"]))

    a, b = results[1], results[2]
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-4)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-4, atol=1e-6)


def test_moe_aux_loss_reaches_objective():
    """The trainer adds moe_aux_weight × mean(sown aux): zeroing the
    weight changes the loss by exactly that contribution."""
    rng = np.random.default_rng(1)
    x = rng.integers(0, 256, (8, 4, SMALL, SMALL, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)

    losses = {}
    for w in (0.0, 0.01):
        cfg = _moe_tsf_cfg()
        cfg.model.moe_aux_weight = w
        trainer = Trainer(cfg)
        state = trainer.init_state(steps_per_epoch=1, image_size=SMALL)
        bx, by = shard_batch((x, y), trainer.mesh)
        _, m = trainer.train_step_fn()(state, bx, by)
        losses[w] = float(m["loss"])
    diff = losses[0.01] - losses[0.0]
    # aux ∈ [1, E]: contribution ∈ [0.01, 0.02] for E=2
    assert 0.01 - 1e-4 <= diff <= 0.02 + 1e-4, diff
