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

import jax
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
    convs run in. Uses the flat roll + time-edge-mask formulation (no
    reshape/concat chain; fuses into consumers — see shift_conv notes)."""
    bt = x.shape[0]
    c = x.shape[-1]
    fold = c // fold_div
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1, 1), 0) % n_segment
    left = jnp.roll(x[..., :fold], -1, axis=0) * \
        (t_idx != n_segment - 1).astype(x.dtype)
    right = jnp.roll(x[..., fold:2 * fold], 1, axis=0) * \
        (t_idx != 0).astype(x.dtype)
    return jnp.concatenate([left, right, x[..., 2 * fold:]], axis=-1)


def shift_conv(x: jnp.ndarray,
               kernel: jnp.ndarray,
               n_segment: int,
               fold_div: int = 8,
               strides=(1, 1),
               padding="SAME") -> jnp.ndarray:
    """Fused conv(temporal_shift(x)) without materializing the shifted
    tensor.

    Measured on v5e: the naive concat shift costs ~15 ms of a 39 ms
    TSM-R50 step (the whole activation is rewritten to HBM at all 16 shift
    sites even though only C/4 channels change). Splitting the consumer
    conv by input-channel fold —

        conv(shift(x)) = conv(x_rest, W_rest)
                       + conv(shift_left(x[..:f]),   W[..:f])
                       + conv(shift_right(x[f:2f]),  W[f:2f])

    — time-shifts only the thin folds (C/8 each) and lets XLA fuse the
    partial sums into one conv epilogue. Same math (exact), same FLOPs,
    no full-tensor rewrite. Semantics identical to
    conv(temporal_shift_flat(x, n_segment, fold_div)).

    Args:
        x: (B*T, H, W, C) activations.
        kernel: (kh, kw, C, O) HWIO conv kernel.
    """
    bt, h, w, c = x.shape
    fold = c // fold_div
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(v, k):
        return jax.lax.conv_general_dilated(v, k, strides, padding,
                                            dimension_numbers=dn)

    # Split the conv by input-channel fold: pass-through channels (the
    # bulk) read in place, and ONE conv over the two shifted folds. The
    # fold shifts stay in the FLAT (B*T) layout: a roll along the batch
    # axis plus a time-edge mask — no reshape/concat chain, so XLA fuses
    # the whole thing into the conv input read (the reshape→concat variant
    # forced real HBM copies).
    # Variants measured e2e on v5e (TSM-R50, batch 32): this roll+mask
    # split 1138 clips/s, reshape/concat two-way split 912, three-way
    # split 898, tail-fold reorder 897, full-conv + delta corrections 840,
    # naive concat shift 836, pallas fused matmul 827.
    y = conv(x[..., 2 * fold:], kernel[:, :, 2 * fold:, :])
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1, 1), 0) % n_segment
    # left fold: row i reads i+1 (zero at t == T-1; the roll's wraparound
    # row lands where the mask is zero, including across clip boundaries)
    xl = jnp.roll(x[..., :fold], -1, axis=0) * \
        (t_idx != n_segment - 1).astype(x.dtype)
    # right fold: row i reads i-1 (zero at t == 0)
    xr = jnp.roll(x[..., fold:2 * fold], 1, axis=0) * \
        (t_idx != 0).astype(x.dtype)
    folds = jnp.concatenate([xl, xr], axis=-1)
    return y + conv(folds, kernel[:, :, :2 * fold, :])


def shift_conv_edge(x: jnp.ndarray,
                    kernel: jnp.ndarray,
                    n_segment: int,
                    fold_div: int = 8,
                    strides=(1, 1),
                    padding="SAME") -> jnp.ndarray:
    """``shift_conv`` with the time-edge masks moved PAST the conv
    (VERDICT r4 #6 lever on the measured ~1.7 ms/site of mask
    elementwise): the rolled folds convolve UNMASKED, and the
    clip-boundary rows — where the roll wrapped into the neighboring
    clip — are repaired by subtracting two tiny convs over only those
    rows (B of B·T rows each, fold channels). The full-batch VPU mask
    multiply over both folds becomes 2/T-of-rows MXU work:

        out[t==T-1] -= conv(next clip's t==0 left fold)
        out[t==0]   -= conv(prev clip's t==T-1 right fold)

    Exact same math (linearity of conv; each output frame depends only
    on its own input frame, so per-frame corrections are local even for
    spatial kernels). A/B'd against shift_conv on v5e via
    ``cfg.model.shift_impl='xla-edge'`` — numbers in docs/PERF.md.
    """
    bt, h, w, c = x.shape
    b = bt // n_segment
    fold = c // fold_div
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel.shape,
                                        ("NHWC", "HWIO", "NHWC"))

    def conv(v, k):
        return jax.lax.conv_general_dilated(v, k, strides, padding,
                                            dimension_numbers=dn)

    y = conv(x[..., 2 * fold:], kernel[:, :, 2 * fold:, :])
    xl = jnp.roll(x[..., :fold], -1, axis=0)
    xr = jnp.roll(x[..., fold:2 * fold], 1, axis=0)
    y = y + conv(jnp.concatenate([xl, xr], axis=-1),
                 kernel[:, :, :2 * fold, :])
    xv = x.reshape(b, n_segment, h, w, c)
    # clip k's t==T-1 row wrongly received clip (k+1)%b's t==0 left fold
    wrong_l = jnp.roll(xv[:, 0, ..., :fold], -1, axis=0)
    corr_l = conv(wrong_l, kernel[:, :, :fold, :])
    # clip k's t==0 row wrongly received clip (k-1)%b's t==T-1 right fold
    wrong_r = jnp.roll(xv[:, -1, ..., fold:2 * fold], 1, axis=0)
    corr_r = conv(wrong_r, kernel[:, :, fold:2 * fold, :])
    yv = y.reshape(b, n_segment, *y.shape[1:])
    yv = yv.at[:, n_segment - 1].add(-corr_l).at[:, 0].add(-corr_r)
    return yv.reshape(bt, *y.shape[1:])
