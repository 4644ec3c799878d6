"""FSDP (ZeRO-3) param/opt-state sharding over the data axis, and
elastic-topology resume (save on one mesh shape, restore on another).

The reference is DP-only with fully replicated weights (SURVEY §2.8);
cfg.parallel.fsdp partitions every eligible param + optimizer-momentum
leaf over the 'data' axis (parallel/mesh.param_spec fsdp_axis) so each
rank holds 1/data of the state — GSPMD inserts the per-use all-gather
and the grad reduce-scatter. These tests pin: (a) the leaves really are
partitioned, (b) training is numerically identical to the replicated
run, (c) fsdp composes with the model axis on a (4,2) mesh, and (d) an
orbax checkpoint saved under one topology restores and CONTINUES
identically under another (pod resize / preemption-with-fewer-chips).
"""

import jax
import numpy as np
import pytest

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.parallel.mesh import create_mesh, shard_batch
from workoutdetector_tpu.train.trainer import Trainer

SMALL = 16


def _tiny_tsm_cfg(fsdp=False):
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = 2
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.image_size = SMALL
    cfg.data.num_segments = 2
    cfg.parallel.fsdp = fsdp
    return cfg


def _batch(seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, (8, 2, SMALL, SMALL, 3), dtype=np.uint8)
    y = rng.integers(0, 2, (8,)).astype(np.int32)
    return x, y


def _frac_sharded(tree, denom):
    """Leaves partitioned to exactly 1/denom of their elements per device."""
    out = []
    for p in jax.tree_util.tree_leaves(tree):
        if hasattr(p, "sharding") and not p.sharding.is_fully_replicated:
            shard = p.addressable_shards[0].data.shape
            if int(np.prod(shard)) * denom == int(np.prod(p.shape)):
                out.append(p)
    return out


def test_fsdp_param_spec_rules():
    from jax.sharding import PartitionSpec as P

    from workoutdetector_tpu.parallel.mesh import param_spec

    mesh = create_mesh(model=2)  # (4, 2)
    # conv HWIO: model shards O, fsdp shards I — composed
    assert param_spec((3, 3, 64, 128), mesh, fsdp_axis="data") == \
        P(None, None, "data", "model")
    # dense: model shards in, fsdp shards out when divisible
    assert param_spec((512, 64), mesh, fsdp_axis="data") == P("model", "data")
    # fc head: out=12 not divisible by data=4 → only model sharding
    assert param_spec((512, 12), mesh, fsdp_axis="data") == P("model", None)
    # 1-D BN scale: fsdp shards the vector when big enough
    assert param_spec((64,), mesh, fsdp_axis="data") == P("data")
    assert param_spec((8,), mesh, fsdp_axis="data") == P()  # 8/4 < min 8
    # no fsdp axis → round-2 behavior unchanged
    assert param_spec((3, 3, 64, 128), mesh) == P(None, None, None, "model")
    assert param_spec((64,), mesh) == P()


@pytest.mark.parametrize("model_axis", [1, 2])
def test_fsdp_matches_replicated(model_axis):
    """FSDP run == replicated run: identical losses, metrics, and final
    params over two train steps + an eval, while params/momentum actually
    hold 1/data (or 1/(data*model)) per device."""
    x, y = _batch()
    results = {}
    for fsdp in (False, True):
        mesh = create_mesh(model=model_axis)
        trainer = Trainer(_tiny_tsm_cfg(fsdp=fsdp), mesh=mesh)
        state = trainer.init_state(steps_per_epoch=2, image_size=SMALL)
        if fsdp:
            denom = mesh.shape["data"]
            assert _frac_sharded(state.params, denom), \
                "fsdp on but no param holds 1/data per device"
            assert _frac_sharded(state.opt_state, denom), \
                "fsdp on but optimizer state not partitioned"
            if model_axis > 1:  # composition: 1/(data*model) leaves exist
                assert _frac_sharded(state.params, denom * model_axis), \
                    "no leaf partitioned over BOTH axes on the 2D mesh"
        step = trainer.train_step_fn()
        bx, by = shard_batch((x, y), mesh)
        state, m1 = step(state, bx, by)
        state, m2 = step(state, bx, by)
        ev = trainer.eval_step_fn()(state, bx, by)
        results[fsdp] = (float(m1["loss"]), float(m2["loss"]),
                         float(ev["loss"]), int(ev["correct"]),
                         np.asarray(state.params["fc"]["kernel"]))

    a, b = results[False], results[True]
    assert a[3] == b[3]
    np.testing.assert_allclose(a[0], b[0], rtol=1e-5)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-4)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-4)
    np.testing.assert_allclose(a[4], b[4], rtol=1e-4, atol=1e-6)


def test_elastic_topology_resume(tmp_path):
    """A checkpoint saved on an (8,1) replicated run restores onto a
    (4,2)+fsdp mesh — different device count per axis AND different
    param layout — and the next train step produces the same numbers as
    never having stopped. This is the pod-resize/preemption story: orbax
    restores into the target's shardings, so topology is a free variable
    across restarts."""
    from workoutdetector_tpu.train.checkpoint import CheckpointManager

    x, y = _batch()
    x2, y2 = _batch(seed=1)

    # original run: two steps on the default (8,1) mesh, save after step 1
    mesh_a = create_mesh(model=1)
    tr_a = Trainer(_tiny_tsm_cfg(fsdp=False), mesh=mesh_a)
    state_a = tr_a.init_state(steps_per_epoch=2, image_size=SMALL)
    step_a = tr_a.train_step_fn()
    bx, by = shard_batch((x, y), mesh_a)
    state_a, _ = step_a(state_a, bx, by)
    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(state_a, name="elastic", meta={"step": 1})
    bx2, by2 = shard_batch((x2, y2), mesh_a)
    state_a, m_a = step_a(state_a, bx2, by2)

    # resumed run: new process topology — (4,2) mesh, fsdp on
    mesh_b = create_mesh(model=2)
    tr_b = Trainer(_tiny_tsm_cfg(fsdp=True), mesh=mesh_b)
    state_b = tr_b.init_state(steps_per_epoch=2, image_size=SMALL)
    state_b, meta = ckpt.restore("elastic", state_b)
    assert meta["step"] == 1
    # restore must land in the NEW layout, not the saved one
    assert _frac_sharded(state_b.params, mesh_b.shape["data"]), \
        "restored params lost the fsdp sharding"
    bx2b, by2b = shard_batch((x2, y2), mesh_b)
    state_b, m_b = tr_b.train_step_fn()(state_b, bx2b, by2b)

    np.testing.assert_allclose(float(m_a["loss"]), float(m_b["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_a.params["fc"]["kernel"]),
                               np.asarray(state_b.params["fc"]["kernel"]),
                               rtol=1e-4, atol=1e-6)
