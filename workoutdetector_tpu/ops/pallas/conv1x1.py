"""Pallas backward kernels for the bottleneck 1×1 convs (VERDICT r4 #2).

Train MFU sits at 29.4% vs 38.7% inference, and the round-3 profile
attributed the gap to conv-BACKWARD codegen (docs/PERF.md: bwd conv
fusions are 68% of the backward). The 1×1 conv sites — conv1/conv3 of
every ResNet-50 bottleneck, ≈half the network FLOPs — are pure matmuls,
the friendliest possible Mosaic target, and this module is the probe the
round-4 verdict asked for: keep the FORWARD exactly XLA's conv (so the
fwd schedule, BN/ReLU fusions and numerics are untouched) and swap only
the two backward contractions for Pallas kernels:

    bwd-input :  dx[r, c] = Σ_o g[r, o] · W[c, o]      (g @ Wᵀ)
    bwd-filter:  dW[c, o] = Σ_r x[r, c] · g[r, o]      (xᵀ @ g)

with r = N·H·W rows. bwd-input tiles rows on the grid with the full
(C, O) kernel resident in VMEM; bwd-filter is a row-chunk reduction that
accumulates the (C, O) cotangent in a VMEM f32 scratch across grid
steps (output written on the last step). Both issue one MXU contraction
per grid step with f32 accumulation (preferred_element_type), matching
XLA's conv-backward numerics.

Wiring: ``cfg.model.pallas_conv_bwd`` routes every stride-1 1×1 conv of
models/resnet.Bottleneck through :func:`conv1x1` (param tree unchanged —
same 'kernel' HWIO leaf), so the real train step A/Bs with one flag
(tools/train_bench.py --pallas-conv-bwd). Measured results live in
docs/PERF.md's lever table. Reference capability bar: the reference's
torch models train these sites at cuDNN efficiency
(/root/reference/workoutdetector/models/tsm.py:189-419).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DIMS = ("NHWC", "HWIO", "NHWC")


def _dx_kernel(g_ref, wt_ref, o_ref):
    # (1, tile_r, O) @ (O, C) -> (1, tile_r, C); lanes carry channels
    o_ref[0] = lax.dot_general(
        g_ref[0], wt_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _dx_pallas(g2: jnp.ndarray, wt: jnp.ndarray, tile_r: int,
               interpret: bool) -> jnp.ndarray:
    """(R, O) @ (O, C) with rows tiled on the grid."""
    r, o = g2.shape
    c = wt.shape[1]
    n_tiles = pl.cdiv(r, tile_r)
    gb = g2.reshape(n_tiles, tile_r, o)
    out = pl.pallas_call(
        _dx_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles, tile_r, c), g2.dtype),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile_r, o), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o, c), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile_r, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(gb, wt)
    return out.reshape(r, c)


def _dw_kernel(x_ref, g_ref, o_ref, acc_ref):
    @pl.when(pl.program_id(0) == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # (tile_r, C)ᵀ @ (tile_r, O) -> (C, O), accumulated across row chunks
    acc_ref[...] += lax.dot_general(
        x_ref[0], g_ref[0],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(0) == pl.num_programs(0) - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _dw_pallas(x2: jnp.ndarray, g2: jnp.ndarray, tile_r: int,
               interpret: bool) -> jnp.ndarray:
    """xᵀ @ g over R rows: (R, C), (R, O) -> (C, O) via a sequential
    row-chunk reduction with a VMEM f32 accumulator."""
    r, c = x2.shape
    o = g2.shape[1]
    n_tiles = pl.cdiv(r, tile_r)
    xb = x2.reshape(n_tiles, tile_r, c)
    gb = g2.reshape(n_tiles, tile_r, o)
    return pl.pallas_call(
        _dw_kernel,
        out_shape=jax.ShapeDtypeStruct((c, o), jnp.float32),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile_r, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r, o), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, o), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, o), jnp.float32)],
        interpret=interpret,
    )(xb, gb)


def _round_rows(r: int, c: int, o: int, dtype, budget=3 * 1024 * 1024
                ) -> int:
    """Row tile: the largest DIVISOR of ``r`` that is a multiple of 16
    (sublane-aligned for f32 and bf16) and whose two input blocks fit
    the VMEM budget. Channel dims count LANE-PADDED (a (tile, 16) block
    occupies (tile, 128) of VMEM — narrow fold blocks OOM'd the 16 MB
    scoped limit under the raw-byte estimate), and Mosaic double-buffers
    both inputs, so the budget is ~1/4 of VMEM. Returns 0 when no tile
    exists — the caller falls back to the XLA transpose (tiny eval
    shapes)."""
    def up(n):
        return -(-n // 128) * 128

    per_row = (up(c) + up(o)) * jnp.dtype(dtype).itemsize
    cap = min(r, max(16, budget // max(per_row, 1)))
    tile = cap // 16 * 16
    while tile >= 16:
        if r % tile == 0:
            return tile
        tile -= 16
    return 0


def make_conv1x1(interpret: bool = None):
    """Differentiable stride-1 1×1 conv: XLA forward, Pallas backward.

    Returns op(x, k) with x (N, H, W, C) and k (1, 1, C, O) HWIO —
    drop-in for ``nn.Conv(features, (1, 1), use_bias=False)``'s
    underlying convolution. ``interpret=None`` resolves per-trace: the
    Mosaic kernels on TPU backends, the Pallas interpreter on CPU (so
    the hermetic test mesh exercises the same code path).
    """

    @jax.custom_vjp
    def op(x, k):
        return lax.conv_general_dilated(
            x, k, (1, 1), "VALID",
            dimension_numbers=_DIMS)

    def fwd(x, k):
        return op(x, k), (x, k)

    def bwd(res, g):
        x, k = res
        n, h, w, c = x.shape
        o = k.shape[-1]
        r = n * h * w
        g2 = g.reshape(r, o).astype(x.dtype)
        x2 = x.reshape(r, c)
        w2 = k[0, 0]  # (C, O)
        interp = interpret
        if interp is None:
            interp = jax.default_backend() == "cpu"
        tile = _round_rows(r, c, o, x.dtype)
        if tile == 0:
            # no aligned row tile (tiny eval shapes): XLA fallback
            dx2 = g2 @ w2.T.astype(g2.dtype)
            dw = (x2.astype(jnp.float32).T @ g2.astype(jnp.float32))
        else:
            dx2 = _dx_pallas(g2, w2.T.astype(g2.dtype), tile, interp)
            dw = _dw_pallas(x2, g2, tile, interp)
        return (dx2.reshape(x.shape).astype(x.dtype),
                dw[None, None].astype(k.dtype))

    op.defvjp(fwd, bwd)
    return op


conv1x1 = make_conv1x1()
conv1x1_interpret = make_conv1x1(interpret=True)


def make_shift_conv1x1(n_segment: int, fold_div: int = 8,
                       interpret: bool = None):
    """Shift-fused 1×1 conv with the Pallas backward — the SHIFTED conv1
    sites own the pathological contraction (measured standalone on v5e:
    XLA runs the stage-1 bwd-input matmul (802816, 64) @ (64, 256) at
    0.22 TFLOP/s = 118.5 ms; the Pallas row-tiled kernel does it in
    3.3 ms — tools/conv1x1_bench.py), and TSM-R50 shifts EVERY
    bottleneck's conv1, so :func:`make_conv1x1` alone never touches it.

    Forward: exactly ops.temporal_shift.shift_conv (the shipped fused
    split-conv — inference and fwd schedules untouched). Backward, with
    S the fold shift (a linear operator):

        d(shift_x) = g @ Wᵀ                (Pallas _dx_pallas)
        dx         = Sᵀ(d(shift_x))        (reverse rolls + masks on the
                                            two thin folds only)
        dW[:2f]    = folds(x)ᵀ @ g         (Pallas _dw_pallas)
        dW[2f:]    = x[..., 2f:]ᵀ @ g      (Pallas _dw_pallas)

    Sᵀ: the forward's left fold reads out[i] = x[i+1]·[t(i) ≠ T-1], so
    its transpose scatters dx_l[i] = dsh_l[i-1]·[t(i) ≠ 0] — the
    opposite roll with the opposite edge mask (and symmetrically for the
    right fold). Parity vs jax.vjp(shift_conv) gated in
    tests/test_conv1x1_bwd.py.
    """
    from workoutdetector_tpu.ops.temporal_shift import shift_conv

    @jax.custom_vjp
    def op(x, k):
        return shift_conv(x, k, n_segment, fold_div)

    def fwd(x, k):
        return op(x, k), (x, k)

    def bwd(res, g):
        x, k = res
        bt, h, w, c = x.shape
        o = k.shape[-1]
        fold = c // fold_div
        r = bt * h * w
        interp = interpret
        if interp is None:
            interp = jax.default_backend() == "cpu"
        tile = _round_rows(r, c, o, x.dtype)
        if tile == 0:
            def ref(xv, kv):
                return shift_conv(xv, kv, n_segment, fold_div)
            _, vjp = jax.vjp(ref, x, k)
            return vjp(g)
        g2 = g.reshape(r, o).astype(x.dtype)
        w2 = k[0, 0]
        dsh = _dx_pallas(g2, w2.T.astype(g2.dtype), tile,
                         interp).reshape(bt, h, w, c)
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1, 1),
                                         0) % n_segment
        dx_l = jnp.roll(dsh[..., :fold], 1, axis=0) * \
            (t_idx != 0).astype(dsh.dtype)
        dx_r = jnp.roll(dsh[..., fold:2 * fold], -1, axis=0) * \
            (t_idx != n_segment - 1).astype(dsh.dtype)
        dx = jnp.concatenate([dx_l, dx_r, dsh[..., 2 * fold:]], axis=-1)
        # dW needs shift(x); only the two thin folds materialize
        xl = jnp.roll(x[..., :fold], -1, axis=0) * \
            (t_idx != n_segment - 1).astype(x.dtype)
        xr = jnp.roll(x[..., fold:2 * fold], 1, axis=0) * \
            (t_idx != 0).astype(x.dtype)
        folds2 = jnp.concatenate([xl, xr], axis=-1).reshape(r, 2 * fold)
        rest2 = x[..., 2 * fold:].reshape(r, c - 2 * fold)
        tf = _round_rows(r, 2 * fold, o, x.dtype)
        tr = _round_rows(r, c - 2 * fold, o, x.dtype)
        dw_f = _dw_pallas(folds2, g2, tf, interp)
        dw_r = _dw_pallas(rest2, g2, tr, interp)
        dw = jnp.concatenate([dw_f, dw_r], axis=0)
        return (dx.astype(x.dtype), dw[None, None].astype(k.dtype))

    op.defvjp(fwd, bwd)
    return op
