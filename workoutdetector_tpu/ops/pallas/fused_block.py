"""Pallas kernel: one WHOLE ResNet bottleneck block fused in VMEM.

The inference-time MFU wall (docs/PERF.md "lever sweep") sits in the
early ResNet stages: layer1's 1×1 convs run at ~32 FLOP/byte arithmetic
intensity — far under the v5e ridge point (~240) — so they are
HBM-bandwidth-bound and XLA's per-conv schedule pays the full activation
round-trip between every conv in the block (~18 MB/frame of HBM traffic
for layer1's three blocks vs the ~8 MB a fused block needs). No
framework-level lever can fix that from outside the block: the r1 Pallas
experiments (ops/pallas/shift.py, shift_matmul.py) fused single ops and
LOST end-to-end because every pallas_call boundary breaks XLA's
conv+BN+ReLU fusions around it. This kernel removes the interior
boundaries entirely — it computes

    y1 = relu(s1 * (tsm_shift(x) @ W1) + b1)        # 1x1, BN folded
    y2 = relu(s2 * conv3x3(y1) + b2)                # 3x3, zero-pad SAME
    y3 = s3 * (y2 @ W3) + b3                        # 1x1 expand
    out = relu(y3 + residual)                       # residual = x or
                                                    #   sd*(x@Wd)+bd

for one (all-T x row-tile) slab per grid step, entirely in VMEM: x is
read from HBM exactly once (plus a 2-row halo) and only `out` is written
back. The temporal shift (reference workoutdetector/models/tsm.py:34-50
semantics, same fold math as ops/pallas/shift_matmul.py) happens on the
VMEM-resident slab, so all T segments of a spatial tile travel together.

BatchNorm is FOLDED to per-channel scale/bias from running statistics —
inference semantics only (use_running_average). The training path keeps
the XLA formulation (models/resnet.py gates on ``train``).

The 3x3 convolution is 3 accumulated K=3F MXU matmuls (one per kernel
column) over a dy-concatenated, W-padded y1 slab; the row halo comes
from two extra 1-row input blocks whose index maps clamp at the frame
edge and whose contribution is masked to zero there (the same zero
padding the unfused conv applies). See the in-kernel comment for why
this shape: Mosaic's tpu.concatenate rejects inputs at differing
sublane offsets, which rules out the classic 9-view im2col concat (and
its pltpu.roll variant — tpu.dynamic_rotate is 32-bit-only), while
dot_general happily takes offset-layout operands.

RESULT — measured wall, OFF by default (v5e, TSM-R50 e2e inference,
batch 32, 2026-08-17): stages 0-1 fused = 982 clips/s vs 1189 unfused
(earlier forms: 9 separate K=F matmuls 905, th=2 auto-tile 876). The
~2x HBM-traffic saving (~3 ms/step at these shapes) cannot recover the
MXU efficiency the hand schedule gives up: every matmul here has N=64
(half the MXU width) and no cross-grid-step pipelining, where XLA's
conv codegen reaches ~45 TF/s. The kernel stays as a parity-locked,
TPU-validated artifact (tests/test_fused_block.py) and a base for
future shapes where bandwidth binds harder; cfg.model.fused_block
'auto' therefore resolves to OFF (docs/PERF.md lever table).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class FusedBlockParams(NamedTuple):
    """Folded inference parameters of one bottleneck block.

    w1/w2/w3: conv kernels as (C,F), (3,3,F,F), (F,O) — squeezed HWIO.
    sb1/sb2/sb3: (2, features) fp32 rows [scale; bias] from BN folding.
    wd/sbd: optional 1x1 downsample projection (C,O) + its (2,O) fold.
    """
    w1: jnp.ndarray
    sb1: jnp.ndarray
    w2: jnp.ndarray
    sb2: jnp.ndarray
    w3: jnp.ndarray
    sb3: jnp.ndarray
    wd: Optional[jnp.ndarray] = None
    sbd: Optional[jnp.ndarray] = None


def fold_bn(scale: jnp.ndarray, bias: jnp.ndarray, mean: jnp.ndarray,
            var: jnp.ndarray, eps: float) -> jnp.ndarray:
    """BN(running stats) → (2, F) fp32 [multiplier; offset]."""
    s = scale.astype(jnp.float32) * jax.lax.rsqrt(var.astype(jnp.float32) + eps)
    b = bias.astype(jnp.float32) - mean.astype(jnp.float32) * s
    return jnp.stack([s, b])


def _kernel(xt_ref, xm_ref, xb_ref, w1_ref, sb1_ref, w2_ref, sb2_ref,
            w3_ref, sb3_ref, *rest, fold: int, th: int, n_tiles: int,
            with_ds: bool):
    # positional tail: [wd, sbd when with_ds], out ref, y1p scratch
    if with_ds:
        wd_ref, sbd_ref, o_ref, y1p = rest
    else:
        o_ref, y1p = rest
    j = pl.program_id(1)
    t, _, w, c = xm_ref.shape[1:]
    f = w1_ref.shape[-1]
    o_c = w3_ref.shape[-1]
    cdt = o_ref.dtype

    def tshift(xs):
        """TSM fold shift along the slab's T axis (axis 0)."""
        if fold == 0:
            return xs
        zeros = jnp.zeros_like(xs[:1, ..., :fold])
        left = jnp.concatenate([xs[1:, ..., :fold], zeros], axis=0)
        right = jnp.concatenate([zeros, xs[:-1, ..., fold:2 * fold]], axis=0)
        return jnp.concatenate([left, right, xs[..., 2 * fold:]], axis=-1)

    # one conv1 matmul over tile+halo rows: shift → 1x1 → folded BN → relu.
    # Out-of-frame halo rows are zeroed AFTER the relu (they stand in for
    # the 3x3's zero padding, which pads the conv2 INPUT).
    xall = jnp.concatenate([xt_ref[0], xm_ref[0], xb_ref[0]], axis=1)
    m_all = t * (th + 2) * w
    y1 = jax.lax.dot_general(tshift(xall).reshape(m_all, c), w1_ref[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y1 = jnp.maximum(y1 * sb1_ref[0] + sb1_ref[1], 0.0)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, th + 2, 1, 1), 1)
    edge = jnp.logical_or(jnp.logical_and(row == 0, j == 0),
                          jnp.logical_and(row == th + 1, j == n_tiles - 1))
    y1 = y1.astype(cdt).reshape(t, th + 2, w, f) * \
        jnp.where(edge, 0.0, 1.0).astype(cdt)
    y1p[:, :, 1:w + 1] = y1
    y1p[:, :, 0:1] = jnp.zeros((t, th + 2, 1, f), cdt)
    y1p[:, :, w + 1:w + 2] = jnp.zeros((t, th + 2, 1, f), cdt)

    # 3x3 as THREE accumulated K=3F matmuls (one per dx column). The dy
    # views are concatenated over channels — dy slices the UNTILED row
    # dim, so every concat input sits at layout offset {0,0} (Mosaic's
    # tpu.concatenate refuses inputs with differing sublane offsets:
    # "result/input offset mismatch on non-concat dimension", which kills
    # both the 9-view im2col concat and its pltpu.roll variant). The dx
    # shifts live only in the matmul OPERAND slices — dot_general accepts
    # offset-layout operands (the shipped 1×1 path relies on this).
    # K=3F beats 9 separate K=F matmuls (~1.7× slower e2e: MXU pipeline
    # drain) while staying inside Mosaic's concat rules.
    m_rows = t * th * w
    xcat = jnp.concatenate(
        [y1p[:, dy:dy + th] for dy in range(3)], axis=-1)  # (t,th,w+2,3F)
    acc = None
    for dx in range(3):
        xo = xcat[:, :, dx:dx + w, :].reshape(m_rows, 3 * f)
        part = jax.lax.dot_general(xo, w2_ref[dx],
                                   dimension_numbers=(((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    y2 = jnp.maximum(acc * sb2_ref[0] + sb2_ref[1], 0.0).astype(cdt)

    # 1x1 expand + residual + relu
    y3 = jax.lax.dot_general(y2, w3_ref[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    y3 = y3 * sb3_ref[0] + sb3_ref[1]
    res = xm_ref[0].reshape(m_rows, c)
    if with_ds:
        res = jax.lax.dot_general(res, wd_ref[...],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        res = res * sbd_ref[0] + sbd_ref[1]
    else:
        res = res.astype(jnp.float32)
    out = jnp.maximum(y3 + res, 0.0)
    o_ref[0] = out.astype(cdt).reshape(t, th, w, o_c)


def _lane_pad(n: int) -> int:
    return -(-n // 128) * 128


def _pick_tile(h: int, t: int) -> int:
    """Row tile: the largest divisor of H that is ≤ 8.

    Empirical on v5e (2026-08-17, T=8 slabs at every TSM-R50 stage-0/1
    shape): per-step VMEM peaks are far below a worst-case sum — Mosaic's
    liveness analysis reuses the f32 temporaries — so tiles sized by a
    byte estimate land at th=2 and run 1.5× slower than th=8 (tiny
    matmuls + 2× halo re-reads). th=8 compiles and is fastest at
    (56,56,256→64), (56,56,64→64 ds) and th=7 at (28,28,512→128);
    th=14 exceeds VMEM at both. With T=1 (no shift, image models) the
    slab is 8× thinner, so allow deeper tiles: th ≤ 64 // T.
    """
    cap = max(8, 64 // max(t, 1))
    for th in range(min(cap, h), 0, -1):
        if h % th == 0:
            return th
    return 1


def fused_bottleneck(x: jnp.ndarray, params: FusedBlockParams, *,
                     n_segment: int, fold: int,
                     row_tile: Optional[int] = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Run one fused bottleneck block.

    Args:
        x: (B*T, H, W, C) activations (any float dtype; compute follows it).
        params: folded weights (see FusedBlockParams).
        n_segment: T (1 when fold == 0 disables the shift).
        fold: channels shifted each way (C // fold_div), 0 = no shift.
    Returns:
        (B*T, H, W, O) block output.
    """
    bt, h, w, c = x.shape
    f = params.w1.shape[-1]
    o = params.w3.shape[-1]
    with_ds = params.wd is not None
    t = n_segment if fold > 0 else 1
    b = bt // t
    xs = x.reshape(b, t, h, w, c)
    th = row_tile if row_tile is not None else _pick_tile(h, t)
    assert h % th == 0, f"row_tile {th} must divide H={h}"
    n_tiles = h // th
    grid = (b, n_tiles)

    def top_idx(i, j):
        return (i, 0, jnp.maximum(j * th - 1, 0), 0, 0)

    def bot_idx(i, j):
        return (i, 0, jnp.minimum(j * th + th, h - 1), 0, 0)

    in_specs = [
        pl.BlockSpec((1, t, 1, w, c), top_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, th, w, c), lambda i, j: (i, 0, j, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, t, 1, w, c), bot_idx, memory_space=pltpu.VMEM),
        pl.BlockSpec((c, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((3, 3 * f, f), lambda i, j: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, f), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((f, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((2, o), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
    ]
    # w2 regrouped dx-major: [dx] is the (3F, F) kernel slab whose rows
    # are the dy taps stacked over channels, matching xcat's dy-concat.
    w2g = params.w2.transpose(1, 0, 2, 3).reshape(3, 3 * f, f)
    args = [xs, xs, xs, params.w1, params.sb1, w2g, params.sb2,
            params.w3, params.sb3]
    if with_ds:
        in_specs += [
            pl.BlockSpec((c, o), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, o), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [params.wd, params.sbd]

    out = pl.pallas_call(
        functools.partial(_kernel, fold=fold, th=th, n_tiles=n_tiles,
                          with_ds=with_ds),
        out_shape=jax.ShapeDtypeStruct((b, t, h, w, o), x.dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, t, th, w, o), lambda i, j: (i, 0, j, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((t, th + 2, w + 2, f), x.dtype)],
        interpret=interpret,
    )(*args)
    return out.reshape(bt, h, w, o)
