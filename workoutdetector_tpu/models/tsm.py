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
    dtype: Any = jnp.float32
    shift_impl: str = "xla"  # xla | pallas

    def _shift(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.shift_impl == "pallas":
            bt, h, w, c = x.shape
            b = bt // self.num_segments
            y = temporal_shift_pallas(
                x.reshape(b, self.num_segments, h, w, c), self.shift_div)
            return y.reshape(bt, h, w, c)
        return temporal_shift_flat(x, self.num_segments, self.shift_div)

    def _block_hook(self, x: jnp.ndarray, stage_idx: int, block_idx: int) -> jnp.ndarray:
        """Shift injection policy of reference make_temporal_shift
        (models/tsm.py:125-137): under 'blockres', shift before conv1 of
        each residual branch; stride to every other block when the 3rd
        stage has ≥23 blocks (resnet101)."""
        if not self.is_shift:
            return x
        n_round = 2 if STAGE_SIZES[self.base_model][2] >= 23 else 1
        if self.shift_place == "blockres" and block_idx % n_round == 0:
            return self._shift(x)
        return x

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        assert t == self.num_segments, f"expected T={self.num_segments}, got {t}"
        x = x.reshape(b * t, h, w, c).astype(self.dtype)

        if self.is_shift and self.shift_place == "block":
            # whole-block variant: shift the stage input once per block
            def hook(y, stage_idx, block_idx):
                return self._shift(y)
        else:
            hook = self._block_hook

        backbone = ResNet(stage_sizes=STAGE_SIZES[self.base_model],
                          bottleneck=BOTTLENECK[self.base_model],
                          num_classes=0,
                          dtype=self.dtype,
                          partial_bn=self.partial_bn,
                          block_input_hook=hook,
                          name="backbone")
        feat = backbone(x, train=train)  # (B*T, F)
        feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        logits = nn.Dense(self.num_class, dtype=self.dtype,
                          kernel_init=nn.initializers.normal(0.001),
                          bias_init=nn.initializers.zeros, name="fc")(feat)
        logits = logits.reshape(b, t, self.num_class)
        if self.consensus_type == "avg":
            logits = jnp.mean(logits.astype(jnp.float32), axis=1)
        else:  # identity
            logits = logits.astype(jnp.float32)
        return logits
