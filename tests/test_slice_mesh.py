"""Hybrid multi-slice (DCN) mesh tests — parallel/mesh.create_mesh(slices=).

The scaling recipe for DCN-connected TPU slices: a leading 'slice' mesh
axis carries pure data parallelism (params replicate across slices, one
gradient all-reduce per step crosses DCN), while 'data' (DP/FSDP) and
'model' (tensor/sp/ep) collectives stay inside a slice on ICI. The
reference has no multi-node story beyond gloo DDP (SURVEY §2.8); this is
the TPU-native multi-pod equivalent. Runs on the conftest's virtual
8-device CPU mesh.
"""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from workoutdetector_tpu.config import Config
from workoutdetector_tpu.parallel.mesh import (batch_sharding, create_mesh,
                                               dp_entry, dp_size,
                                               local_batch_size, param_spec,
                                               shard_batch)
from workoutdetector_tpu.train.trainer import Trainer


def _tiny_cfg(**kw) -> Config:
    cfg = Config()
    cfg.model.model_type = "tsm"
    cfg.model.base_model = "resnet18"
    cfg.model.num_class = 2
    cfg.model.num_segments = 4
    cfg.model.dropout = 0.0
    cfg.model.dtype = "float32"
    cfg.data.image_size = 32
    cfg.data.num_segments = 4
    for k, v in kw.items():
        parent, key = k.split(".")
        setattr(getattr(cfg, parent), key, v)
    return cfg


def _batch(n, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 256, size=(n, 4, 32, 32, 3), dtype=np.uint8)
    y = rng.integers(0, 2, size=(n,)).astype(np.int32)
    return x, y


def test_hybrid_mesh_shape_and_axes():
    mesh = create_mesh(slices=2, model=2)
    assert mesh.axis_names == ("slice", "data", "model")
    assert dict(mesh.shape) == {"slice": 2, "data": 2, "model": 2}
    assert dp_size(mesh) == 4
    assert dp_entry(mesh) == ("slice", "data")
    assert local_batch_size(8, mesh) == 2
    # 2D mesh unchanged
    flat = create_mesh(model=2)
    assert dp_entry(flat) == "data"
    assert dp_size(flat) == 4


def test_hybrid_mesh_batch_spans_slice_and_data():
    mesh = create_mesh(slices=2, model=1)
    assert batch_sharding(mesh).spec == P(("slice", "data"))
    x, y = _batch(8)
    bx, _ = shard_batch((x, y), mesh)
    # every device holds batch/(slice*data) rows
    assert bx.addressable_shards[0].data.shape[0] == 8 // dp_size(mesh)


def test_params_never_shard_over_slice():
    mesh = create_mesh(slices=2, model=2)
    # the param rule treats 'slice' as invisible: conv O-dim on 'model',
    # fsdp (when on) on 'data' — never 'slice'
    for shape in [(3, 3, 256, 512), (2048, 12), (8, 64, 128), (512,)]:
        spec = param_spec(shape, mesh, fsdp_axis="data")
        flat = [a for e in spec if e is not None
                for a in (e if isinstance(e, tuple) else (e,))]
        assert "slice" not in flat, (shape, spec)


def test_hybrid_train_step_matches_flat_mesh():
    """One train step on (2,2,2) == the same step on (4,2): the slice
    axis is pure DP, so the global math is identical."""
    x, y = _batch(8, seed=3)

    def run(mesh):
        trainer = Trainer(_tiny_cfg(), mesh=mesh)
        state = trainer.init_state(steps_per_epoch=2, image_size=32)
        bx, by = shard_batch((x, y), mesh)
        state, metrics = trainer.train_step_fn()(state, bx, by)
        ev = trainer.eval_step_fn()(state, bx, by)
        return (float(metrics["loss"]), float(metrics["acc"]),
                int(ev["correct"]))

    flat = run(create_mesh(model=2))
    hybrid = run(create_mesh(slices=2, model=2))
    np.testing.assert_allclose(hybrid[0], flat[0], rtol=2e-5)
    assert hybrid[1] == pytest.approx(flat[1], abs=1e-6)
    assert hybrid[2] == flat[2]


def test_hybrid_mesh_with_fsdp():
    """fsdp composes: params shard over 'data' (intra-slice) + 'model',
    replicate over 'slice'; the step still runs."""
    mesh = create_mesh(slices=2, model=2)
    trainer = Trainer(_tiny_cfg(**{"parallel.fsdp": True}), mesh=mesh)
    state = trainer.init_state(steps_per_epoch=2, image_size=32)
    sharded = [p for p in jax.tree_util.tree_leaves(state.params)
               if not p.sharding.is_fully_replicated]
    assert sharded
    for p in sharded:
        flat = [a for e in p.sharding.spec if e is not None
                for a in (e if isinstance(e, tuple) else (e,))]
        assert "slice" not in flat
    x, y = _batch(8, seed=5)
    bx, by = shard_batch((x, y), mesh)
    state, metrics = trainer.train_step_fn()(state, bx, by)
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_builds_hybrid_mesh_from_config():
    cfg = _tiny_cfg(**{"parallel.slices": 2, "parallel.model_axis": 2})
    trainer = Trainer(cfg)
    assert trainer.mesh.axis_names == ("slice", "data", "model")
    assert dict(trainer.mesh.shape) == {"slice": 2, "data": 2, "model": 2}
