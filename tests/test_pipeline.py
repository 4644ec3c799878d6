"""Pipeline parallelism (parallel/pipeline.py): GPipe-over-ppermute.

Verifies the pipelined schedule is numerically IDENTICAL to running the
stage stack sequentially — forward and gradients — for plain Dense
stages and for real TimeSformer DividedBlocks (tuple activations), on a
(data, model) mesh so dp composes with pp.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from workoutdetector_tpu.parallel.mesh import create_mesh
from workoutdetector_tpu.parallel.pipeline import (pipeline_apply,
                                                   stack_stage_params)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device CPU mesh")


def _dense_stack(n_stages, dim, key):
    from flax import linen as nn

    class Stage(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.tanh(nn.Dense(dim, name="fc")(x))

    stage = Stage()
    params = {
        f"block_{i}": stage.init(jax.random.fold_in(key, i),
                                 jnp.zeros((1, dim)))["params"]
        for i in range(n_stages)
    }
    return stage, params


@pytest.mark.parametrize("mesh_shape,microbatches", [((2, 4), 4), ((4, 2), 2)])
def test_pipeline_matches_sequential_dense(mesh_shape, microbatches):
    data, s = mesh_shape
    mesh = create_mesh(devices=jax.devices()[:data * s], data=data, model=s)
    dim = 16
    stage, params = _dense_stack(s, dim, jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(
        size=(8, dim)).astype(np.float32))

    seq = x
    for i in range(s):
        seq = stage.apply({"params": params[f"block_{i}"]}, seq)

    stacked = stack_stage_params(params, [f"block_{i}" for i in range(s)])

    @jax.jit
    def run(stacked, x):
        return pipeline_apply(
            lambda p, a: stage.apply({"params": p}, a),
            stacked, x, mesh, microbatches=microbatches)

    out = run(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-6, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    mesh = create_mesh(devices=jax.devices()[:8], data=2, model=4)
    dim = 8
    stage, params = _dense_stack(4, dim, jax.random.PRNGKey(1))
    names = [f"block_{i}" for i in range(4)]
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(4, dim)).astype(np.float32))

    def loss_seq(params):
        h = x
        for n in names:
            h = stage.apply({"params": params[n]}, h)
        return jnp.sum(h ** 2)

    def loss_pp(params):
        stacked = stack_stage_params(params, names)
        out = pipeline_apply(lambda p, a: stage.apply({"params": p}, a),
                             stacked, x, mesh, microbatches=2)
        return jnp.sum(out ** 2)

    g_seq = jax.grad(loss_seq)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                rtol=1e-5, atol=1e-6),
        g_seq, g_pp)


def test_pipeline_timesformer_blocks():
    """pp over a real model family: 4 TimeSformer DividedBlocks (tuple
    (cls, patches) activations) pipelined over model=4 == the sequential
    block loop."""
    from workoutdetector_tpu.models.timesformer import DividedBlock

    mesh = create_mesh(devices=jax.devices()[:8], data=2, model=4)
    d, heads, p, t = 32, 2, 16, 4
    block = DividedBlock(d, heads, dtype=jnp.float32)
    rng = np.random.default_rng(2)
    cls_tok = jnp.asarray(rng.normal(size=(4, 1, d)).astype(np.float32))
    patches = jnp.asarray(rng.normal(size=(4, p, t, d)).astype(np.float32))

    params = {
        f"block_{i}": block.init(jax.random.PRNGKey(10 + i), cls_tok,
                                 patches)["params"]
        for i in range(4)
    }
    names = [f"block_{i}" for i in range(4)]

    seq_c, seq_p = cls_tok, patches
    for n in names:
        seq_c, seq_p = block.apply({"params": params[n]}, seq_c, seq_p)

    stacked = stack_stage_params(params, names)

    @jax.jit
    def run(stacked, c, pch):
        return pipeline_apply(
            lambda pp, act: block.apply({"params": pp}, *act),
            stacked, (c, pch), mesh, microbatches=2)

    out_c, out_p = run(stacked, cls_tok, patches)
    np.testing.assert_allclose(np.asarray(out_c), np.asarray(seq_c),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(seq_p),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_single_microbatch_and_errors():
    mesh = create_mesh(devices=jax.devices()[:8], data=2, model=4)
    stage, params = _dense_stack(4, 8, jax.random.PRNGKey(3))
    names = [f"block_{i}" for i in range(4)]
    stacked = stack_stage_params(params, names)
    x = jnp.ones((4, 8))
    out = pipeline_apply(lambda p, a: stage.apply({"params": p}, a),
                         stacked, x, mesh, microbatches=1)
    seq = x
    for n in names:
        seq = stage.apply({"params": params[n]}, seq)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq),
                               rtol=1e-6, atol=1e-6)
    with pytest.raises(AssertionError):
        pipeline_apply(lambda p, a: a, stacked, jnp.ones((5, 8)), mesh,
                       microbatches=2)  # 5 % 2 != 0
