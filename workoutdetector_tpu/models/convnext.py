"""ConvNeXt image backbone — NHWC, TPU-native.

The reference's image-classifier path defaults to timm ``convnext_base``
(workoutdetector/train_img.py:44); this is the in-framework equivalent.
Written for XLA:TPU: NHWC end-to-end (depthwise 7×7 rides the VPU,
pointwise MLPs are pure MXU matmuls), LayerNorm over the trailing channel
dim (no transposes anywhere), configurable compute dtype (params fp32).

State-dict layout maps 1:1 onto timm's ConvNeXt
(stem.0/stem.1, stages.{i}.downsample.{0,1}, stages.{i}.blocks.{j}.
{conv_dw,norm,mlp.fc1,mlp.fc2,gamma}, head.norm/head.fc) via
models/convert.port_convnext_checkpoint, so real timm checkpoints port
without surgery.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

# (depths, dims) per variant — timm convnext_* definitions
CONVNEXT_VARIANTS = {
    "convnext_atto": ((2, 2, 6, 2), (40, 80, 160, 320)),
    "convnext_tiny": ((3, 3, 9, 3), (96, 192, 384, 768)),
    "convnext_small": ((3, 3, 27, 3), (96, 192, 384, 768)),
    "convnext_base": ((3, 3, 27, 3), (128, 256, 512, 1024)),
    "convnext_large": ((3, 3, 27, 3), (192, 384, 768, 1536)),
}


class ConvNeXtBlock(nn.Module):
    """dw7×7 → LN → pw(4×) → GELU → pw → γ-scale → +residual."""
    dim: int
    layer_scale_init: float = 1e-6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        residual = x
        y = nn.Conv(self.dim, (7, 7), padding=[(3, 3), (3, 3)],
                    feature_group_count=self.dim, dtype=self.dtype,
                    name="conv_dw")(x)
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(y)
        y = nn.Dense(4 * self.dim, dtype=self.dtype, name="fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(y)
        gamma = self.param("gamma",
                           nn.initializers.constant(self.layer_scale_init),
                           (self.dim,))
        return residual + y * gamma.astype(y.dtype)


class ConvNeXt(nn.Module):
    """ConvNeXt classifier / feature extractor.

    Call: (B, H, W, 3) float → (B, num_classes) logits
    (num_classes=0 ⇒ pooled pre-head features; spatial=True ⇒ map).
    """
    depths: Sequence[int] = (3, 3, 9, 3)
    dims: Sequence[int] = (96, 192, 384, 768)
    num_classes: int = 1000
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False,
                 spatial: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        x = nn.Conv(self.dims[0], (4, 4), (4, 4), padding="VALID",
                    dtype=self.dtype, name="stem_conv")(x)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="stem_norm")(x)
        for i, (depth, dim) in enumerate(zip(self.depths, self.dims)):
            if i > 0:
                x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                 name=f"down{i}_norm")(x)
                x = nn.Conv(dim, (2, 2), (2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down{i}_conv")(x)
            for j in range(depth):
                x = ConvNeXtBlock(dim, dtype=self.dtype,
                                  name=f"stage{i}_block{j}")(x)
        if spatial:
            return x
        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="head_norm")(x)
        if self.num_classes == 0:
            return x
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="head")(x)
        return x.astype(jnp.float32)


def make_convnext(variant: str, num_classes: int = 1000,
                  dtype: Any = jnp.float32) -> ConvNeXt:
    depths, dims = CONVNEXT_VARIANTS[variant]
    return ConvNeXt(depths=depths, dims=dims, num_classes=num_classes,
                    dtype=dtype)
