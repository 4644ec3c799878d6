"""TSM — Temporal Shift Module video classifier, TPU-native.

Capability match of the reference TSM (workoutdetector/models/tsm.py:189-419):
ResNet backbone with zero-FLOP temporal shifts injected at residual-branch
inputs ('blockres', every block; every other block when a stage has ≥23
blocks) or whole-block inputs ('block'), average consensus over segments,
dropout + linear head, partial-BN freeze.

TPU design:
  * input is (B, T, H, W, C) normalized float; the backbone runs on the
    flattened (B*T) batch so every conv sees a big MXU-friendly batch.
  * the shift is ops.temporal_shift (pad/slice/concat — XLA fuses it into
    the following conv) or the Pallas kernel when cfg.model.shift_impl ==
    'pallas'.
  * consensus mean is a single reshape+mean, fused into the head matmul.
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from workoutdetector_tpu.models.resnet import STAGE_SIZES, BOTTLENECK, ResNet
from workoutdetector_tpu.ops.temporal_shift import temporal_shift_flat
from workoutdetector_tpu.ops.pallas.shift import temporal_shift_pallas


class TSM(nn.Module):
    """Temporal Shift Module network.

    Call: logits = model(x, train) with x (B, T, H, W, C) float.
    """
    num_class: int
    num_segments: int = 8
    base_model: str = "resnet50"
    is_shift: bool = True
    shift_div: int = 8
    shift_place: str = "blockres"  # blockres | block
    consensus_type: str = "avg"  # avg | identity
    dropout: float = 0.5
    partial_bn: bool = True
    temporal_pool: bool = False
    non_local: bool = False  # accepted for config parity; the reference
    # stores but never wires this flag either (models/tsm.py:237)
    dtype: Any = jnp.float32
    shift_impl: str = "xla"  # xla | xla-edge | pallas | unfused
    # shift-site placement stride (reference n_round, tsm.py:125-137):
    # 0 = the reference's depth rule (2 for resnet101, else 1); 2 shifts
    # every other block — the VERDICT r4 #6 placement-sweep lever
    shift_round: int = 0
    remat: bool = False  # rematerialize blocks (activation-memory lever)
    # whole-block Pallas fusion for INFERENCE (train steps keep XLA):
    # eligible bottleneck blocks of the listed stages run as single
    # VMEM-resident kernels (ops/pallas/fused_block.py). Measured wall
    # on v5e — slower than XLA's schedule e2e (docs/PERF.md lever
    # table) — so this stays opt-in; stages 0-1 are the bandwidth-bound
    # candidates the kernel was built for.
    fused_block: bool = False
    fused_stages: Any = (0, 1)
    # TRAIN-path probe: bottleneck 1×1 convs keep their XLA forward but
    # compute backward through Pallas matmul kernels
    # (ops/pallas/conv1x1.py; measured in docs/PERF.md's lever table)
    pallas_conv_bwd: bool = False

    def _seg_at_stage(self, stage_idx: int) -> int:
        """Segments alive at a stage: temporal_pool halves T after stage 1
        (reference make_temporal_shift n_segment_list, tsm.py:109-112)."""
        if self.temporal_pool and stage_idx >= 1:
            return self.num_segments // 2
        return self.num_segments

    def _shift(self, x: jnp.ndarray, n_segment: int) -> jnp.ndarray:
        if self.shift_impl == "pallas":
            bt, h, w, c = x.shape
            b = bt // n_segment
            y = temporal_shift_pallas(
                x.reshape(b, n_segment, h, w, c), self.shift_div)
            return y.reshape(bt, h, w, c)
        return temporal_shift_flat(x, n_segment, self.shift_div)

    def _block_hook(self, x: jnp.ndarray, stage_idx: int, block_idx: int) -> jnp.ndarray:
        """Shift injection policy of reference make_temporal_shift
        (models/tsm.py:125-137): under 'blockres', shift before conv1 of
        each residual branch; stride to every other block when the 3rd
        stage has ≥23 blocks (resnet101)."""
        if not self.is_shift:
            return x
        n_round = self.shift_round or \
            (2 if STAGE_SIZES[self.base_model][2] >= 23 else 1)
        if self.shift_place == "blockres" and block_idx % n_round == 0:
            return self._shift(x, self._seg_at_stage(stage_idx))
        return x

    def _stage_hook(self, x: jnp.ndarray, stage_idx: int) -> jnp.ndarray:
        """Max-pool time in front of stage 2 when temporal_pool
        (reference TemporalPool, tsm.py:83-101: max_pool3d kernel (3,1,1)
        stride (2,1,1) pad (1,0,0))."""
        if not self.temporal_pool or stage_idx != 1:
            return x
        bt, h, w, c = x.shape
        t = self.num_segments
        b = bt // t
        xt = x.reshape(b, t, h * w * c)
        # max over a window of 3 along T, stride 2, pad 1 → T/2
        pad = jnp.full((b, 1, h * w * c), -jnp.inf, xt.dtype)
        xp = jnp.concatenate([pad, xt, pad], axis=1)  # (b, t+2, ·)
        windows = jnp.stack([xp[:, 0:-2:2], xp[:, 1:-1:2], xp[:, 2::2]], axis=0)
        pooled = jnp.max(windows, axis=0)  # (b, t//2, ·)
        return pooled.reshape(b * (t // 2), h, w, c)

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 seg_lo: int = 0, seg_hi: int = 6) -> jnp.ndarray:
        """seg_lo/seg_hi run a static segment range for pipeline-parallel
        stage functions (models/resnet.py ResNet.__call__ segments 0-4;
        segment 5 = pool + dropout + fc + consensus). Boundary
        activations are exchanged CLIP-major — (B, T', h, w, c), T' = T
        (or T/2 past the temporal pool) — so the pipeline's batch dim
        stays the clip batch; the frame-flat (B*T') backbone layout is
        internal."""

        def t_at(boundary: int) -> int:
            # temporal_pool halves T inside segment 2's stage hook, so
            # boundaries ≥ 3 carry T/2 frames
            if self.temporal_pool and boundary >= 3:
                return self.num_segments // 2
            return self.num_segments

        if seg_lo == 0:
            b, t, h, w, c = x.shape
            assert t == self.num_segments, \
                f"expected T={self.num_segments}, got {t}"
            x = x.reshape(b * t, h, w, c).astype(self.dtype)
        else:
            t = self.num_segments
            b_in, t_in, h, w, c = x.shape
            assert t_in == t_at(seg_lo), \
                f"boundary {seg_lo} expects T'={t_at(seg_lo)}, got {t_in}"
            x = x.reshape(b_in * t_in, h, w, c).astype(self.dtype)

        hook = None
        pre_hook = None
        shift_spec = None
        if self.is_shift and self.shift_place == "block":
            # whole-block variant: the reference wraps the entire block
            # module (tsm.py:114-123), so the shift feeds BOTH the residual
            # branch and the identity path — a block pre-hook, not a
            # residual-branch hook.
            def pre_hook(y, stage_idx, block_idx):
                return self._shift(y, self._seg_at_stage(stage_idx))
        elif self.is_shift and self.shift_place == "blockres" and \
                self.shift_impl in ("xla", "xla-edge", "pallas"):
            # fused path: conv1 absorbs the shift — only the thin folds
            # move through HBM vs materializing the shifted tensor
            # ('xla' = ops.shift_conv split convs; 'pallas' = single-pass
            # shift-matmul kernel at 1×1 sites)
            n_round = self.shift_round or \
                (2 if STAGE_SIZES[self.base_model][2] >= 23 else 1)

            def shift_spec(stage_idx, block_idx):
                if block_idx % n_round == 0:
                    return (self._seg_at_stage(stage_idx), self.shift_div,
                            self.shift_impl)
                return None
        elif self.is_shift:
            # any other shift_impl (e.g. 'unfused'): hook-based shift that
            # materializes the shifted tensor — the semantic oracle the
            # fused paths are parity-locked against (tests/test_shift_conv)
            hook = self._block_hook

        fuse_spec = None
        if self.fused_block and BOTTLENECK[self.base_model]:
            stages = tuple(self.fused_stages)

            def fuse_spec(stage_idx, block_idx):
                return "pallas" if stage_idx in stages else None

        backbone = ResNet(stage_sizes=STAGE_SIZES[self.base_model],
                          bottleneck=BOTTLENECK[self.base_model],
                          num_classes=0,
                          dtype=self.dtype,
                          partial_bn=self.partial_bn,
                          block_input_hook=hook,
                          block_pre_hook=pre_hook,
                          block_shift_spec=shift_spec,
                          stage_input_hook=self._stage_hook,
                          block_fuse_spec=fuse_spec,
                          conv1x1_bwd="pallas" if self.pallas_conv_bwd
                          else None,
                          remat=self.remat,
                          name="backbone")
        feat = backbone(x, train=train, seg_lo=seg_lo,
                        seg_hi=seg_hi)  # (B*T', F), T' = T or T/2
        if seg_hi < 6:
            # boundary activation for the next pipeline stage, clip-major
            t_b = t_at(seg_hi)
            return feat.reshape(-1, t_b, *feat.shape[1:])
        feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        logits = nn.Dense(self.num_class, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          bias_init=nn.initializers.zeros, name="fc")(feat)
        t_out = t // 2 if self.temporal_pool else t
        b = feat.shape[0] // t_out
        logits = logits.reshape(b, t_out, self.num_class)
        if self.consensus_type == "avg":
            logits = jnp.mean(logits.astype(jnp.float32), axis=1)
        else:  # identity
            logits = logits.astype(jnp.float32)
        return logits
