"""Temporal shift — the TSM core op, TPU-native.

Semantics (reference workoutdetector/models/tsm.py:34-50): with fold =
C // fold_div, channels [0, fold) shift left in time (t ← t+1), channels
[fold, 2*fold) shift right (t ← t-1), the rest pass through; vacated slots
are zero.

Two implementations:
  * ``temporal_shift`` — pure XLA (pad + slice + concat). XLA fuses this
    into the surrounding convolution's input read; zero-FLOP, one HBM pass.
    This is the default and is differentiable for free.
  * ``temporal_shift_pallas`` (ops/pallas/shift.py) — an explicit fused
    VMEM kernel for when profiling shows the concat materializing.

Layout: (B, T, H, W, C) NHWC with channels last — the shifted folds are
contiguous lanes, so the rolls are cheap lane-aligned copies.
"""

from __future__ import annotations

import jax.numpy as jnp


def temporal_shift(x: jnp.ndarray, fold_div: int = 8) -> jnp.ndarray:
    """Shift channel folds across time.

    Args:
        x: (B, T, H, W, C) activation.
        fold_div: C // fold_div channels shift each way.
    Returns:
        same-shape array with first fold shifted left (future→present),
        second fold shifted right, remainder unchanged. Zero fill.
    """
    c = x.shape[-1]
    fold = c // fold_div
    zeros_t = jnp.zeros_like(x[:, :1, ..., :fold])
    # left shift: out[:, t] = x[:, t+1] for the first fold
    left = jnp.concatenate([x[:, 1:, ..., :fold], zeros_t], axis=1)
    # right shift: out[:, t] = x[:, t-1] for the second fold
    right = jnp.concatenate([zeros_t, x[:, :-1, ..., fold:2 * fold]], axis=1)
    return jnp.concatenate([left, right, x[..., 2 * fold:]], axis=-1)


def temporal_shift_flat(x: jnp.ndarray, n_segment: int, fold_div: int = 8) -> jnp.ndarray:
    """Temporal shift over a flattened (B*T, H, W, C) batch — the layout
    convs run in. Reshapes to expose T, shifts, flattens back; XLA fuses
    the reshapes away."""
    bt, h, w, c = x.shape
    b = bt // n_segment
    y = temporal_shift(x.reshape(b, n_segment, h, w, c), fold_div)
    return y.reshape(bt, h, w, c)
