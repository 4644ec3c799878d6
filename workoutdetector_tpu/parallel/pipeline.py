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

:func:`pipeline_apply_het` lifts the same-shape constraint so CONV
models (ResNet stages, whose activation shapes halve spatially and
double in channels per stage) can pipeline too — demonstrated on
TSM/ResNet via their segment-ranged forwards (models/tsm.py seg_lo/
seg_hi); TDN/TPN stacks fit the same mechanism once given their own
segment splits. See its docstring for the flat-buffer + ``lax.switch``
formulation.
"""

from __future__ import annotations

import math
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


def pipeline_apply_het(stage_fns: Sequence[Callable[[Pytree, jnp.ndarray],
                                                    jnp.ndarray]],
                       params: Pytree,
                       x: jnp.ndarray,
                       mesh: Mesh,
                       microbatches: int,
                       axis: str = "model",
                       data_axis: str = "data") -> jnp.ndarray:
    """GPipe over HETEROGENEOUS stages: activation shapes may differ at
    every stage boundary (ResNet stages halve spatially / double in
    channels), which the stacked :func:`pipeline_apply` cannot express.

    The TPU-native formulation stays one SPMD program on the same
    ``ppermute`` ring; two changes make ragged shapes legal under SPMD's
    one-program rule:

      * **flat ring buffer**: every boundary activation is flattened and
        zero-padded to W = max boundary size, so the scan carry and the
        ring traffic have ONE static shape. The pad is pure ICI/HBM
        overhead bounded by (W - true_size)/W per hop — pick stage cuts
        that balance boundary sizes.
      * **per-device stage dispatch via ``lax.switch`` on
        ``axis_index``**: all S stage programs are compiled once, but at
        runtime each device executes ONLY its own branch — MPMD-grade
        heterogeneity inside one SPMD program. Compile time grows ~S×;
        step time does not.

    Bubble overhead is the standard GPipe (S-1)/(M+S-1) of ticks, PLUS
    each tick now lasts as long as the SLOWEST stage (heterogeneous
    stages rarely cost the same — balance FLOPs across cuts, not layer
    counts). Parameters are passed REPLICATED over ``axis`` (each branch
    reads only its own stage's subtree; XLA dead-code-eliminates the
    rest per branch): pp here pipelines COMPUTE and activation memory —
    compose with fsdp/tensor sharding for parameter memory, as
    tests/test_composed_parallel.py does for the homogeneous form.

    Args:
        stage_fns: S = ``mesh.shape[axis]`` functions, each
            ``(params, act_in) -> act_out`` with static shapes; stage s's
            output shape must equal stage s+1's input shape. All
            activations must share one dtype.
        params: the FULL parameter pytree, passed to every stage fn.
        x: stage-0 input, leading batch dim B with B % microbatches == 0
            and (B / microbatches) divisible by the 'data' axis size.
        microbatches: M pipeline microbatches (bubble = (S-1)/(M+S-1)).
    Returns:
        The last stage's output with the batch restored to B on dim 0.
    """
    s_size = int(mesh.shape[axis])
    assert len(stage_fns) == s_size, \
        f"need {s_size} stages for the {axis}={s_size} axis, got {len(stage_fns)}"
    m = int(microbatches)
    assert m >= 1, "need at least one microbatch"
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible by microbatches={m}"
    d_size = int(mesh.shape[data_axis])
    mb = b // m
    assert mb % d_size == 0, \
        f"microbatch {mb} not divisible by data axis {d_size}"
    mb_loc = mb // d_size

    # derive every boundary shape by abstract evaluation (no FLOPs)
    shapes = [x.shape[1:]]
    dtype = x.dtype
    for s, fn in enumerate(stage_fns):
        out = jax.eval_shape(
            fn, params,
            jax.ShapeDtypeStruct((mb_loc,) + tuple(shapes[s]), dtype))
        assert out.dtype == dtype, \
            f"stage {s} changed dtype {dtype} -> {out.dtype}; unify first"
        shapes.append(out.shape[1:])
    sizes = [int(math.prod(sh)) if sh else 1 for sh in shapes]
    width = max(sizes)

    def pad_flat(v):
        flat = v.reshape(v.shape[0], -1)
        return jnp.pad(flat, ((0, 0), (0, width - flat.shape[1])))

    xm = x.reshape(m, mb, *x.shape[1:])
    perm = [(i, (i + 1) % s_size) for i in range(s_size)]
    ticks = m + s_size - 1

    def _branch(s):
        def br(p, flat):
            a = flat[:, :sizes[s]].reshape(flat.shape[0], *shapes[s])
            return pad_flat(stage_fns[s](p, a))
        return br

    branches = [_branch(s) for s in range(s_size)]

    # custom-VJP dispatch: ``lax.switch`` on an axis_index-derived index
    # MIS-TRANSPOSES inside shard_map (observed jax 0.7: every branch's
    # cotangent collapses onto branch 0) — so the backward pass re-runs
    # the switch over per-branch VJP functions in primal mode. Residuals
    # are (index, params, input): the stage forward is RECOMPUTED in the
    # backward pass, which is exactly GPipe's stage rematerialization —
    # O(1) activation memory per device instead of O(ticks).
    @jax.custom_vjp
    def dispatch(s, p, flat):
        return jax.lax.switch(s, branches, p, flat)

    def dispatch_fwd(s, p, flat):
        return dispatch(s, p, flat), (s, p, flat)

    def dispatch_bwd(res, ct):
        s, p, flat = res

        def _bwd_branch(k):
            def b(p, flat, ct):
                _, vjp = jax.vjp(branches[k], p, flat)
                return vjp(ct)
            return b

        dp, dflat = jax.lax.switch(s, [_bwd_branch(k) for k in range(s_size)],
                                   p, flat, ct)
        return None, dp, dflat

    dispatch.defvjp(dispatch_fwd, dispatch_bwd)

    def local_fn(params_loc, xm_loc):
        s = jax.lax.axis_index(axis)
        # plain zeros: this shard_map runs check_vma=False (see below),
        # so no varying-manual-axes typing applies to the carry
        act0 = jnp.zeros((mb_loc, width), dtype)

        def tick(act, t):
            idx = jnp.clip(t, 0, m - 1)
            x_t = pad_flat(xm_loc[idx])
            # stage 0 feeds from the microbatch queue; later stages from
            # the ring (their left neighbour's previous-tick output)
            inp = jnp.where(s == 0, x_t, act)
            y = dispatch(s, params_loc, inp)
            nxt = jax.lax.ppermute(y, axis, perm)
            out = jnp.where(s == s_size - 1, y, jnp.zeros_like(y))
            return nxt, out

        _, outs = jax.lax.scan(tick, act0, jnp.arange(ticks))
        return outs[None]  # add the stage dim back for out_specs

    param_specs = jax.tree_util.tree_map(lambda _: P(), params)
    # check_vma=False: the varying-manual-axes checker MIS-TRANSPOSES a
    # ``lax.switch`` whose index derives from axis_index (observed jax
    # 0.7, minimal repro in tests/test_pipeline.py: every branch's
    # parameter cotangent collapses onto branch 0, summed). With the
    # checker off, both the plain switch and the custom-VJP dispatch
    # transpose correctly (gradient parity asserted in tests).
    outs = _shard_map(local_fn, mesh=mesh,
                      in_specs=(param_specs, P(None, data_axis)),
                      out_specs=P(axis, None, data_axis),
                      check_vma=False)(params, xm)

    # (S, ticks, mb, W) → microbatch i completed at tick i + S - 1 on
    # stage S - 1; earlier/zero rows are the warm-up bubble
    done = outs[s_size - 1, s_size - 1:]
    flat = done.reshape(done.shape[0] * done.shape[1], width)
    return flat[:, :sizes[-1]].reshape(b, *shapes[-1])
