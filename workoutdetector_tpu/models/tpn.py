"""TPN — Temporal Pyramid Network on a TSM-ResNet backbone, TPU-native.

Capability match of the reference's TPN training config
(workoutdetector/configs/tpn.py:2-31: mmaction ``Recognizer2D`` with a
``ResNetTSM`` backbone tapped at stages 3/4 (out_indices (2,3), shift_div
8), a ``TPN`` neck — spatial modulation to the deepest resolution,
grouped temporal modulation with ×8 temporal downsampling, bidirectional
(top-down + bottom-up) level fusion, pyramid fusion to 2048 channels, and
an auxiliary classification head with loss_weight 0.5 — and a ``TPNHead``
(avg consensus + dropout 0.5 + fc)).

TPU design:
  * the backbone reuses this framework's fused shift-conv ResNet (same
    roll+mask fold path as TSM — the shift costs ~0 HBM traffic).
  * pyramid features live as (B, T, H, W, C): temporal modulation is a
    (3,1,1) grouped conv + T-max-pool, spatial modulation a (1,3,3)
    stride-(1,2,2) conv — all NDHWC, all MXU-lowered, no layout
    transposes anywhere.
  * the aux head's logits are sown into the 'intermediates' collection;
    the trainer adds ``aux_loss_weight × CE`` when present (the mmaction
    neck returns (out, loss_aux) — here loss composition stays in the
    train step where it belongs under jit).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from workoutdetector_tpu.models.resnet import BOTTLENECK, STAGE_SIZES, ResNet


class ConvBN3D(nn.Module):
    """ConvModule analog: 3D conv (NDHWC, D=time) + BN + ReLU."""
    features: int
    kernel: Tuple[int, int, int] = (1, 1, 1)
    strides: Tuple[int, int, int] = (1, 1, 1)
    groups: int = 1
    use_bn: bool = True
    relu: bool = True
    dtype: Any = jnp.float32
    frozen_bn: bool = False  # partial-BN: stats frozen like the affine

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        pad = [((k - 1) // 2, (k - 1) // 2) for k in self.kernel]
        x = nn.Conv(self.features, self.kernel, self.strides, padding=pad,
                    feature_group_count=self.groups, use_bias=not self.use_bn,
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            x = nn.BatchNorm(momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                             name="bn")(
                x, use_running_average=(not train) or self.frozen_bn)
        return nn.relu(x) if self.relu else x


class LevelFusion(nn.Module):
    """Per-level grouped 1×1×1 conv-BN-ReLU, concat, fuse to ``out``
    (mmaction TPN level_fusion_cfg: mid (1024,1024) → out 2048)."""
    mid: Sequence[int]
    out: int
    dtype: Any = jnp.float32
    frozen_bn: bool = False

    @nn.compact
    def __call__(self, feats, train: bool = False) -> jnp.ndarray:
        outs = [ConvBN3D(m, (1, 1, 1), groups=32, dtype=self.dtype,
                         frozen_bn=self.frozen_bn, name=f"down{i}")(f, train)
                for i, (f, m) in enumerate(zip(feats, self.mid))]
        x = jnp.concatenate(outs, axis=-1)
        return ConvBN3D(self.out, (1, 1, 1), dtype=self.dtype,
                        frozen_bn=self.frozen_bn, name="fusion")(x, train)


class TPN(nn.Module):
    """TSM-ResNet + temporal pyramid neck + TPN head.

    Call: logits = model(x, train) with x (B, T, H, W, C) normalized float
    → (B, num_class) fp32. During training the aux head's logits are sown
    as intermediates['aux_logits'] for the trainer's aux CE term.
    """
    num_class: int
    num_segments: int = 8
    base_model: str = "resnet50"
    is_shift: bool = True  # ResNetTSM backbone (reference tpn.py:7-11)
    shift_div: int = 8
    out_indices: Tuple[int, int] = (2, 3)
    neck_out: int = 1024
    fusion_out: int = 2048
    temporal_scales: Tuple[int, int] = (8, 8)  # downsample_scales
    dropout: float = 0.5
    aux_dropout: float = 0.5
    dtype: Any = jnp.float32
    # partial-BN: freeze running stats of every BN except the backbone
    # stem's, mirroring the optimizer's 'frozen' labels (train/optim)
    partial_bn: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        assert t == self.num_segments, f"expected T={self.num_segments}, got {t}"
        x = x.reshape(b * t, h, w, c).astype(self.dtype)

        shift_spec = None
        if self.is_shift:
            # same blockres fused shift-conv policy as TSM (n_round on
            # deep third stages, reference models/tsm.py:125-137)
            n_round = 2 if STAGE_SIZES[self.base_model][2] >= 23 else 1

            def shift_spec(stage_idx, block_idx):
                if block_idx % n_round == 0:
                    return (self.num_segments, self.shift_div, "xla")
                return None

        backbone = ResNet(stage_sizes=STAGE_SIZES[self.base_model],
                          bottleneck=BOTTLENECK[self.base_model],
                          num_classes=0,
                          dtype=self.dtype,
                          partial_bn=self.partial_bn,
                          block_shift_spec=shift_spec,
                          out_indices=self.out_indices,
                          name="backbone")
        feats = backbone(x, train=train)
        # (B*T, H_i, W_i, C_i) → (B, T, H_i, W_i, C_i)
        feats = [f.reshape(b, t, *f.shape[1:]) for f in feats]

        # auxiliary head on the second-to-last tap (mmaction AuxHead:
        # conv ×2-channels stride-2 → pool → dropout → fc, loss_weight .5)
        if train or self.is_initializing():  # params must exist at init
            a = ConvBN3D(feats[-2].shape[-1] * 2, (1, 3, 3), (1, 2, 2),
                         dtype=self.dtype, frozen_bn=self.partial_bn,
                         name="aux_conv")(feats[-2], train)
            a = jnp.mean(a, axis=(1, 2, 3))
            a = nn.Dropout(self.aux_dropout, deterministic=not train)(a)
            a = nn.Dense(self.num_class, dtype=self.dtype,
                         kernel_init=nn.initializers.normal(0.01),
                         name="aux_fc")(a)
            if train:
                self.sow("intermediates", "aux_logits", a.astype(jnp.float32))

        # spatial modulation: bring every level to the deepest level's
        # spatial resolution and channel width
        deep_c = feats[-1].shape[-1]
        levels = []
        for i, f in enumerate(feats):
            k = len(feats) - 1 - i  # stride-2 conv-BN-ReLUs to apply
            for s in range(k):
                f = ConvBN3D(deep_c, (1, 3, 3), (1, 2, 2), dtype=self.dtype,
                             frozen_bn=self.partial_bn,
                             name=f"spatial{i}_{s}")(f, train)
            levels.append(f)

        # temporal modulation: grouped (3,1,1) conv + max-pool over T
        outs = []
        for i, (f, scale) in enumerate(zip(levels, self.temporal_scales)):
            f = nn.Conv(self.neck_out, (3, 1, 1), padding=[(1, 1), (0, 0), (0, 0)],
                        feature_group_count=32, use_bias=False,
                        dtype=self.dtype, name=f"temporal{i}_conv")(f)
            scale = min(scale, f.shape[1])
            f = nn.max_pool(f, (scale, 1, 1), strides=(scale, 1, 1))
            outs.append(f)

        # top-down path (upsample scale (1,1,1) ⇒ identity resampling)
        td = list(outs)
        for i in range(len(td) - 1, 0, -1):
            td[i - 1] = td[i - 1] + td[i]
        td_fused = LevelFusion(mid=(self.neck_out,) * len(td),
                               out=self.fusion_out, dtype=self.dtype,
                               frozen_bn=self.partial_bn,
                               name="fusion_td")(td, train)
        # bottom-up path (downsample scale (1,1,1) ⇒ identity)
        bu = list(outs)
        for i in range(len(bu) - 1):
            bu[i + 1] = bu[i + 1] + bu[i]
        bu_fused = LevelFusion(mid=(self.neck_out,) * len(bu),
                               out=self.fusion_out, dtype=self.dtype,
                               frozen_bn=self.partial_bn,
                               name="fusion_bu")(bu, train)
        # pyramid fusion over both directions
        y = jnp.concatenate([td_fused, bu_fused], axis=-1)
        y = ConvBN3D(self.fusion_out, (1, 1, 1), dtype=self.dtype,
                     frozen_bn=self.partial_bn,
                     name="pyramid_fusion")(y, train)

        # TPN head: avg over (T', H, W) = avg consensus + spatial pool
        y = jnp.mean(y, axis=(1, 2, 3))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        logits = nn.Dense(self.num_class, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.zeros, name="fc")(y)
        return logits.astype(jnp.float32)
