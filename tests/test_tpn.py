"""TPN (temporal pyramid network) — shapes, aux head, trainer integration.

Capability gate for the reference's TPN config
(workoutdetector/configs/tpn.py: ResNetTSM out_indices (2,3) backbone,
TPN neck with aux head loss_weight 0.5, TPNHead)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.models.resnet import resnet18
from workoutdetector_tpu.models.tpn import TPN

B, T, SIZE, NCLS = 2, 4, 32, 3


def _model(**kw) -> TPN:
    kw.setdefault("num_class", NCLS)
    kw.setdefault("num_segments", T)
    kw.setdefault("base_model", "resnet18")
    kw.setdefault("dropout", 0.0)
    kw.setdefault("aux_dropout", 0.0)
    kw.setdefault("dtype", jnp.float32)
    return TPN(**kw)


def _x(seed: int = 0) -> jnp.ndarray:
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(B, T, SIZE, SIZE, 3)), jnp.float32)


def test_resnet_out_indices_taps():
    """out_indices returns the requested stages' spatial maps (mmaction
    ResNetTSM semantics, reference configs/tpn.py:7-11)."""
    net = resnet18(num_classes=0, out_indices=(2, 3))
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    variables = net.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    f2, f3 = net.apply(variables, x, train=False)
    assert f2.shape == (2, 2, 2, 256)  # stride 16, C=256 (r18 stage 3)
    assert f3.shape == (2, 1, 1, 512)  # stride 32, C=512 (r18 stage 4)


def test_forward_shape_and_aux():
    model = _model()
    x = _x()
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (B, NCLS)
    assert out.dtype == jnp.float32
    # train mode sows the aux head's logits for the trainer's 0.5×CE term
    _, upd = model.apply(variables, x, train=True,
                         mutable=["batch_stats", "intermediates"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert upd["intermediates"]["aux_logits"][0].shape == (B, NCLS)


def test_shift_changes_output():
    """The backbone really is a ResNetTSM: disabling the shift changes
    logits on temporally-varying input but the param tree is identical
    (the fused shift-conv is checkpoint-compatible)."""
    x = _x(1)
    m_shift = _model(is_shift=True)
    m_noshift = _model(is_shift=False)
    v = m_shift.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    flat = jax.tree_util.tree_leaves(v["params"])
    v2 = m_noshift.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    a = m_shift.apply(v, x, train=False)
    b = m_noshift.apply(v, x, train=False)
    assert not np.allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_trainer_aux_loss_and_convergence(tmp_path):
    """model_type=tpn through the sharded trainer: the aux CE term is in
    the jitted loss and the step reduces the loss."""
    from workoutdetector_tpu.parallel.mesh import shard_batch
    from workoutdetector_tpu.train.trainer import Trainer

    cfg = Config()
    cfg.model.model_type = "tpn"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = 4
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.model.aux_loss_weight = 0.5
    cfg.optimizer.use_tsn_policies = False
    cfg.optimizer.nesterov = True
    cfg.optimizer.grad_clip = 20.0
    cfg.optimizer.lr = 0.02
    cfg.data.batch_size = 8
    cfg.trainer.default_root_dir = str(tmp_path / "exp")

    trainer = Trainer(cfg)
    state = trainer.init_state(steps_per_epoch=2, image_size=16)
    step = trainer.train_step_fn()
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, size=(8, 4, 16, 16, 3), dtype=np.uint8)
    y = (x.reshape(8, -1).mean(1) > 127).astype(np.int32)
    bx, by = shard_batch((x, y), trainer.mesh)
    losses = []
    for _ in range(6):
        state, m = step(state, bx, by)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]

    # the aux term is really in the loss: weight 0 gives a smaller step-0
    # loss on the same init/batch
    cfg0 = Config()
    cfg0.merge_dict(cfg.to_dict())
    cfg0.model.aux_loss_weight = 0.0
    trainer0 = Trainer(cfg0)
    state0 = trainer0.init_state(steps_per_epoch=2, image_size=16)
    _, m0 = trainer0.train_step_fn()(state0, bx, by)
    assert float(m0["loss"]) < losses[0]
