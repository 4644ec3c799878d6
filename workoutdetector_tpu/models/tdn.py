"""TDN — Temporal Difference Network, TPU-native.

Capability match of the reference TDN (workoutdetector/models/tdn.py):
two-path stem (RGB center frame + stacked frame-diffs through a 12-channel
conv), α/β fusion at layer1/2, FBResNet body whose stages 2-4 use
BottleneckShift blocks (bottleneck + motion-excitation mSE + learnable
temporal-shift conv), segment consensus head (TSN wrapper semantics,
reference models/tsn.py:335-351).

TPU re-design notes:
  * input is (B, T, D=5, H, W, C) NHWC; all (B, T) pairs flatten into one
    MXU batch.
  * the learnable ShiftModule (reference tdn.py:337-376, a grouped Conv1d
    over time) is expressed as a 3-tap depthwise temporal filter — three
    weighted time-rolls, which XLA fuses; identical math, no im2col.
  * mSE's F.interpolate is nearest-neighbor resize at trace-time-static
    sizes (SURVEY §7 hard-part 7).
  * FBResNet convs carry biases (reference tdn.py:431-442) — kept for
    checkpoint-port parity.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _nearest_resize(x: jnp.ndarray, shape: Sequence[int]) -> jnp.ndarray:
    """Nearest-neighbor spatial resize with a fused fast path for the
    exact-2× upsample (the only case TDN's fusion points hit at standard
    resolutions): broadcast+reshape instead of jax.image.resize's
    gather/while lowering. Profiled on v5e: the gather form cost
    ~1.2 ms/step of `while` loops + ~0.4 ms of dynamic-slice fusions
    across the 26 mSE branch resizes; the broadcast form fuses into the
    consumer add. Identical values (out[i] = in[i//2] both ways); odd
    sizes (stage-4's 3→7) fall back to jax.image.resize."""
    b, h_in, w_in, c = x.shape
    h_out, w_out = shape[1], shape[2]
    if h_out == 2 * h_in and w_out == 2 * w_in:
        y = jnp.broadcast_to(x[:, :, None, :, None, :],
                             (b, h_in, 2, w_in, 2, c))
        return y.reshape(b, h_out, w_out, c)
    return jax.image.resize(x, shape, method="nearest")


def _flat_time_shift(x: jnp.ndarray, n_segment: int, direction: int) -> jnp.ndarray:
    """Zero-padded time shift in the FLAT (B*T, ...) layout: roll along the
    batch axis + edge mask. Fuses into consumers (no reshape/concat copies
    — the same trick that took TSM 912 → 1155 clips/s, see
    ops.temporal_shift.shift_conv)."""
    bt = x.shape[0]
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (bt,) + (1,) * (x.ndim - 1),
                                     0) % n_segment
    if direction == 1:  # y[i] = x[i+1], zero at t == T-1
        return jnp.roll(x, -1, axis=0) * (t_idx != n_segment - 1).astype(x.dtype)
    if direction == -1:  # y[i] = x[i-1], zero at t == 0
        return jnp.roll(x, 1, axis=0) * (t_idx != 0).astype(x.dtype)
    return x


class TemporalShiftConv(nn.Module):
    """Learnable per-channel 3-tap temporal filter.

    Equivalent to reference ShiftModule(mode='shift') (tdn.py:337-376): a
    grouped Conv1d over T with kernels initialized to [left-shift,
    right-shift, identity] per channel fold. Implemented as three weighted
    time-rolls — same math, no layout permutes.
    """
    channels: int
    n_segment: int = 8
    n_div: int = 8
    mode: str = "shift"

    def _init_kernel(self, key) -> jnp.ndarray:
        c = self.channels
        fold = c // self.n_div
        w = jnp.zeros((c, 3), jnp.float32)
        if self.mode == "shift":
            # taps: [w_prev, w_self, w_next]; conv1d kernel index 2 ⇒ next
            w = w.at[:fold, 2].set(1.0)  # shift left
            w = w.at[fold:2 * fold, 0].set(1.0)  # shift right
            if 2 * fold < c:
                w = w.at[2 * fold:, 1].set(1.0)  # fixed
        elif self.mode == "fixed":
            w = w.at[:, 1].set(1.0)
        else:  # norm: random init
            w = jax.random.normal(key, (c, 3)) * (1.0 / 3.0) ** 0.5
        return w

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B*T, H, W, C) → same shape."""
        w = self.param("kernel", self._init_kernel)
        prev = _flat_time_shift(x, self.n_segment, -1)
        nxt = _flat_time_shift(x, self.n_segment, 1)
        return prev * w[:, 0] + x * w[:, 1] + nxt * w[:, 2]


class MSEModule(nn.Module):
    """Motion excitation (reference mSEModule, tdn.py:196-334): bottleneck
    1x1, forward/backward temporal feature diffs at two scales, sigmoid
    gate x + x*y."""
    channels: int
    n_segment: int = 8
    reduction: int = 16
    dtype: Any = jnp.float32
    frozen_bn: bool = False  # partial-BN: stats frozen like the affine

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        bt, h, w, c = x.shape
        b = bt // self.n_segment
        r = self.channels // self.reduction
        norm = partial(nn.BatchNorm,
                       use_running_average=(not train) or self.frozen_bn,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        bott = nn.Conv(r, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        bott = norm(name="bn1")(bott)
        conv_bott = nn.Conv(r, (3, 3), padding=[(1, 1), (1, 1)], feature_group_count=r,
                            use_bias=False, dtype=self.dtype, name="conv2")(bott)

        # temporal diffs in the flat layout (roll + edge mask — no
        # reshape/concat copies). Zero row where the reference zero-pads.
        t_idx = jax.lax.broadcasted_iota(jnp.int32, (bt, 1, 1, 1),
                                         0) % self.n_segment
        last = (t_idx != self.n_segment - 1).astype(bott.dtype)
        first = (t_idx != 0).astype(bott.dtype)
        # forward diff: conv(t+1) - raw(t), zero at last t
        diff_fwd = (jnp.roll(conv_bott, -1, axis=0) - bott) * last
        # backward diff: conv(t-1) - raw(t), zero at first t
        diff_bwd = (jnp.roll(conv_bott, 1, axis=0) - bott) * first

        conv_s2 = nn.Conv(r, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                          dtype=self.dtype, name="conv3_smallscale2")
        bn_s2 = norm(name="bn3_smallscale2")
        conv_s4 = nn.Conv(r, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
                          dtype=self.dtype, name="conv3_smallscale4")
        bn_s4 = norm(name="bn3_smallscale4")
        conv3 = nn.Conv(self.channels, (1, 1), use_bias=False, dtype=self.dtype,
                        name="conv3")
        bn3 = norm(name="bn3")

        def branch(diff):
            if diff.shape[1] >= 2 and diff.shape[2] >= 2:
                pooled = nn.avg_pool(diff, (2, 2), strides=(2, 2))
                y2 = bn_s2(conv_s2(pooled))
                y2 = _nearest_resize(y2, diff.shape)
            else:  # spatial already 1×1 (tiny inputs): skip the downscale
                y2 = bn_s2(conv_s2(diff))
            y4 = bn_s4(conv_s4(diff))
            y = bn3(conv3(diff / 3.0 + y2 / 3.0 + y4 / 3.0))
            return nn.sigmoid(y) - 0.5

        y = 0.5 * branch(diff_fwd) + 0.5 * branch(diff_bwd)
        return x + x * y


class TDNBottleneck(nn.Module):
    """FBResNet bottleneck (convs with bias, reference tdn.py:421-469);
    with_shift adds mSE + temporal shift after conv1 (BottleneckShift,
    tdn.py:472-520)."""
    filters: int
    n_segment: int
    strides: int = 1
    downsample: bool = False
    with_shift: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4
    frozen_bn: bool = False  # partial-BN: stats frozen like the affine

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        norm = partial(nn.BatchNorm,
                       use_running_average=(not train) or self.frozen_bn,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv1")(x)
        y = norm(name="bn1")(y)
        y = nn.relu(y)
        if self.with_shift:
            y = MSEModule(self.filters, n_segment=self.n_segment, dtype=self.dtype,
                          frozen_bn=self.frozen_bn, name="mse")(y, train=train)
            y = TemporalShiftConv(self.filters, n_segment=self.n_segment,
                                  name="shift")(y)
        y = nn.Conv(self.filters, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=True, dtype=self.dtype,
                    name="conv2")(y)
        y = norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * self.expansion, (1, 1), use_bias=True,
                    dtype=self.dtype, name="conv3")(y)
        y = norm(name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.filters * self.expansion, (1, 1),
                               (self.strides, self.strides), use_bias=True,
                               dtype=self.dtype, name="downsample_conv")(residual)
            residual = norm(name="downsample_bn")(residual)
        return nn.relu(y + residual)


def _stage(x, *, name, filters, blocks, n_segment, strides, with_shift,
           dtype, train, frozen_bn=False):
    for j in range(blocks):
        s = strides if j == 0 else 1
        downsample = j == 0 and (s != 1 or x.shape[-1] != filters * 4)
        x = TDNBottleneck(filters=filters,
                          n_segment=n_segment,
                          strides=s,
                          downsample=downsample,
                          with_shift=with_shift,
                          dtype=dtype,
                          frozen_bn=frozen_bn,
                          name=f"{name}_{j}")(x, train=train)
    return x


TDN_STAGES = {"resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3]}


class TDN(nn.Module):
    """Temporal Difference Network.

    Call: logits = model(x, train) with x (B, T, 5, H, W, C) float.
    """
    num_class: int
    num_segments: int = 8
    num_frames: int = 5
    base_model: str = "resnet50"
    consensus_type: str = "avg"
    dropout: float = 0.5
    dtype: Any = jnp.float32
    # fusion weights (reference tdn.py:189-192: 0.5/0.5 for 8 seg else 0.75/0.25)
    alpha: Optional[float] = None
    beta: Optional[float] = None
    # partial-BN (reference TSN partialBN semantics): every BN except the
    # RGB stem's bn1 runs in eval mode during training — running stats
    # stay pinned, matching the optimizer's 'frozen' scale/bias labels
    # (train/optim.classify_param). Without this the stats would drift
    # while the affine stays frozen, breaking checkpoint-port accuracy.
    partial_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 seg_lo: int = 0, seg_hi: int = 5) -> jnp.ndarray:
        """seg_lo/seg_hi run a static SEGMENT RANGE for pipeline-parallel
        stage functions (parallel/pipeline.pipeline_apply_het): segment 0
        = both stems + layer1 + the two diff fusions (the part with
        cross-path structure), segments 1-3 = layer2-4, segment 4 = head
        (pool + dropout + new_fc + consensus). Boundary activations are
        exchanged CLIP-major (B, T, h, w, c), as in models/tsm.py."""
        assert 0 <= seg_lo < seg_hi <= 5, (seg_lo, seg_hi)
        t = self.num_segments
        if seg_lo == 0:
            if x.ndim == 5:
                # dataset-pipeline layout (B, T*5, H, W, C) — the shape
                # TDNDataset batches yield (reference tdn_dataset.py
                # returns (T*5, C, H, W) stacks); unflatten the burst axis
                bb, td, hh, ww, cc = x.shape
                x = x.reshape(bb, td // self.num_frames, self.num_frames,
                              hh, ww, cc)
            b, t, d, h, w, c = x.shape
            assert d == self.num_frames == 5, "TDN uses 5-frame bursts"
        else:
            b_in, t_in = x.shape[:2]
            assert t_in == t, f"boundary expects T={t}, got {t_in}"
            y = x.reshape(b_in * t_in, *x.shape[2:]).astype(self.dtype)
        alpha = self.alpha if self.alpha is not None else (0.5 if t == 8 else 0.75)
        beta = self.beta if self.beta is not None else (0.5 if t == 8 else 0.25)
        stages = TDN_STAGES[self.base_model]
        # stem bn1 is the one BN partial-BN keeps live; bn1_5 (diff
        # stem) freezes with the rest (optim._is_stem_bn keeps only bn1)
        norm = partial(nn.BatchNorm, use_running_average=not train, momentum=0.9,
                       epsilon=1e-5, dtype=self.dtype)
        frozen = self.partial_bn
        norm_f = partial(nn.BatchNorm,
                         use_running_average=(not train) or frozen,
                         momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        if seg_lo == 0:
            x = x.reshape(b * t, d, h, w, c).astype(self.dtype)
            frames = [x[:, i] for i in range(5)]  # 5 × (B*T, H, W, C)
            diffs = jnp.concatenate(
                [frames[i + 1] - frames[i] for i in range(4)], axis=-1)  # (B*T, H, W, 12)

            # diff path (reference tdn.py:150-156)
            xd = nn.avg_pool(diffs, (2, 2), strides=(2, 2))
            xd = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
                         dtype=self.dtype, name="conv1_5")(xd)
            xd = norm_f(name="bn1_5")(xd)
            xd = nn.relu(xd)
            xd = nn.max_pool(xd, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            temp_out_diff1 = xd
            xd = _stage(xd, name="resnext_layer1", filters=64, blocks=stages[0],
                        n_segment=t, strides=1, with_shift=False, dtype=self.dtype,
                        train=train, frozen_bn=frozen)

            # RGB path on center frame (reference tdn.py:157-167)
            y = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=True,
                        dtype=self.dtype, name="conv1")(frames[2])
            y = norm(name="bn1")(y)
            y = nn.relu(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
            up1 = _nearest_resize(temp_out_diff1, y.shape)
            y = alpha * y + beta * up1
            y = _stage(y, name="layer1", filters=64, blocks=stages[0], n_segment=t,
                       strides=1, with_shift=False, dtype=self.dtype, train=train,
                       frozen_bn=frozen)
            up2 = _nearest_resize(xd, y.shape)
            y = alpha * y + beta * up2
        for seg, (nm, flt, blk) in enumerate(
                [("layer2", 128, stages[1]), ("layer3", 256, stages[2]),
                 ("layer4", 512, stages[3])], start=1):
            if seg_lo <= seg < seg_hi:
                y = _stage(y, name=nm, filters=flt, blocks=blk, n_segment=t,
                           strides=2, with_shift=True, dtype=self.dtype,
                           train=train, frozen_bn=frozen)
        if seg_hi < 5:
            # boundary activation for the next pipeline stage, clip-major
            return y.reshape(-1, t, *y.shape[1:])

        feat = jnp.mean(y, axis=(1, 2))  # (B*T, 2048)
        feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        logits = nn.Dense(self.num_class, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.zeros, name="new_fc")(feat)
        logits = logits.reshape(-1, t, self.num_class)
        if self.consensus_type == "avg":
            logits = jnp.mean(logits.astype(jnp.float32), axis=1)
        else:
            logits = logits.astype(jnp.float32)
        return logits
