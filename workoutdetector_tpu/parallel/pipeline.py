"""Pipeline parallelism (pp): GPipe-style stage pipelining over the mesh
'model' axis.

The TPU-native formulation (no send/recv, no schedulers): the S stages'
parameters are STACKED on a leading stage dim and sharded over 'model' —
each device holds one stage — and a ``lax.scan`` over M + S - 1 ticks
moves microbatch activations around the ICI ring with ``lax.ppermute``.
Device s computes microbatch m at tick m + s; the (S-1)/(M+S-1) bubble is
the standard GPipe cost and shrinks with more microbatches. Everything
is one jitted SPMD program: differentiable (ppermute transposes to the
reverse permutation, scan reverses), so ``jax.grad`` through a pipelined
forward just works.

No reference analog (the reference is DP-only gloo DDP, SURVEY §2.8);
this completes the dp/tp/sp/pp coverage of the (data, model) mesh for
models with homogeneous block stacks (TimeSformer's divided blocks —
see tests/test_pipeline.py for a DividedBlock-stack pipeline).

Constraints (by construction of the stacked formulation):
  * every stage maps activations to SAME-shaped activations (true for
    transformer block stacks); pre/post processing stays outside.
  * the global batch splits into M microbatches on the leading dim;
    the 'data' axis still shards each microbatch (dp composes with pp).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exports shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

Pytree = Any


def stack_stage_params(params: Pytree, names: Sequence[str]) -> Pytree:
    """Stack homogeneous per-stage param subtrees (e.g. ``block_0`` …
    ``block_{L-1}``) into one tree whose leaves carry a leading stage dim
    — the layout :func:`pipeline_apply` shards over 'model'."""
    trees = [params[n] for n in names]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *trees)


def pipeline_apply(stage_fn: Callable[[Pytree, Pytree], Pytree],
                   stacked_params: Pytree,
                   x: Pytree,
                   mesh: Mesh,
                   microbatches: int,
                   axis: str = "model",
                   data_axis: str = "data") -> Pytree:
    """Run ``x`` through S pipelined stages on an S-wide ``axis``.

    Args:
        stage_fn: ``(stage_params, activations) -> activations`` — one
            stage, same pytree structure and shapes in and out.
        stacked_params: per-stage params stacked on a leading dim of
            size S = ``mesh.shape[axis]`` (see :func:`stack_stage_params`).
        x: activations pytree; leaves have leading batch dim B with
            B % microbatches == 0 and (B/microbatches) divisible by the
            'data' axis.
        microbatches: M pipeline microbatches (bubble = (S-1)/(M+S-1)).
    Returns:
        Same structure as ``x``: the batch restored to B on dim 0.
    """
    s_size = int(mesh.shape[axis])
    m = int(microbatches)
    assert m >= 1, "need at least one microbatch"

    def split(v):
        b = v.shape[0]
        assert b % m == 0, f"batch {b} not divisible by microbatches={m}"
        return v.reshape(m, b // m, *v.shape[1:])

    xm = jax.tree_util.tree_map(split, x)
    perm = [(i, (i + 1) % s_size) for i in range(s_size)]
    ticks = m + s_size - 1

    def local_fn(params_loc, xm_loc):
        # local views: params (1, ...) per device → drop the stage dim
        params_loc = jax.tree_util.tree_map(lambda a: a[0], params_loc)
        s = jax.lax.axis_index(axis)
        # the carry comes back from ppermute varying over `axis`; the
        # zeros seed must carry the same varying-manual-axes type
        act0 = jax.tree_util.tree_map(
            lambda v: jax.lax.pcast(jnp.zeros_like(v[0]), (axis,),
                                    to="varying"), xm_loc)

        def tick(act, t):
            idx = jnp.clip(t, 0, m - 1)
            x_t = jax.tree_util.tree_map(lambda v: v[idx], xm_loc)
            # stage 0 feeds from the microbatch queue; later stages from
            # the ring (their left neighbour's previous-tick output)
            inp = jax.tree_util.tree_map(
                lambda a, b: jnp.where(s == 0, a, b), x_t, act)
            y = stage_fn(params_loc, inp)
            nxt = jax.tree_util.tree_map(
                lambda v: jax.lax.ppermute(v, axis, perm), y)
            # only the last stage's compute is pipeline output
            out = jax.tree_util.tree_map(
                lambda v: jnp.where(s == s_size - 1, v, jnp.zeros_like(v)), y)
            return nxt, out

        _, outs = jax.lax.scan(tick, act0, jnp.arange(ticks))
        # add the stage dim back so out_specs can lay devices on it
        return jax.tree_util.tree_map(lambda v: v[None], outs)

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    x_specs = jax.tree_util.tree_map(lambda _: P(None, data_axis), xm)
    out_specs = jax.tree_util.tree_map(lambda _: P(axis, None, data_axis), xm)
    outs = _shard_map(local_fn, mesh=mesh,
                      in_specs=(param_specs, x_specs),
                      out_specs=out_specs)(stacked_params, xm)

    def collect(v):
        # (S, ticks, mb, ...) → microbatch i completed at tick i + S - 1
        # on stage S - 1; earlier/zero rows are the warm-up bubble
        done = v[s_size - 1, s_size - 1:]
        return done.reshape(done.shape[0] * done.shape[1], *done.shape[2:])

    return jax.tree_util.tree_map(collect, outs)
