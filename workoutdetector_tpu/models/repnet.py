"""RepNet-style learnable period estimator — a third counting family.

The reference explores RepNet-style self-similarity counting in its
analysis notebook (/root/reference/notebooks/similarity_image.ipynb and
utils/common.py:44-250 plot_sim/pose heatmaps) but never ships a
learnable counter; its deployed counters are the state-classifier
transition counter (utils/inference_count.py:114-165) which needs
labeled per-action state data. This module closes that gap with a model
in the spirit of "Counting Out Time" (Dwibedi et al., CVPR 2020):

  frames → per-frame embeddings → temporal self-similarity matrix
  → 2D conv → transformer → per-frame period classification

trained purely on synthetic periodic clips
(data/datasets.SyntheticPeriodicDataset) — no annotation packs needed —
and counting any video via count = Σ_t periodic(t) / period(t).

TPU-first design notes:
  * the self-similarity matrix is ONE batched matmul
    (‖a−b‖² = ‖a‖² + ‖b‖² − 2ab) — no (B,T,T,D) broadcast tensor ever
    materializes in HBM;
  * every shape is static under jit: T = num_segments frames per window,
    periods 2..T/2 as classes, class 0 = aperiodic (periodicity head and
    period head folded into one softmax — one CE, one argmax);
  * the transformer reuses the TimeSformer MHA block (same packed-qkv
    layout, head-major matmuls).

Class convention: id 0 = aperiodic; id k ≥ 1 = period of (k+1) frames.
num_class = T//2 (ids 0..T//2−1, max period T//2 so ≥2 cycles fit).

Trainer integration: __call__ returns frame-averaged logits (B, C) — the
standard CE/acc contract — and sows the per-frame logits (B, T, C) as
'aux_logits' for dense supervision (train/trainer.py broadcasts labels
over T, weight cfg.model.aux_loss_weight).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from workoutdetector_tpu.models.timesformer import MHA

# base_model → (encoder width, embed dim, transformer dim, heads)
REPNET_VARIANTS = {
    "base": (32, 128, 512, 4),
    "small": (16, 64, 128, 4),
    "tiny": (8, 32, 64, 2),
}

# softmax temperature over the negative squared distances (RepNet §3.1
# uses 13.544 at D=512; embeddings here are LayerNormed so the scale is
# architecture-independent)
_SIM_TEMPERATURE = 13.544


def period_of_class(class_id) -> Any:
    """Class id k≥1 → period in frames (k+1); 0 is aperiodic."""
    return class_id + 1


class RepNet(nn.Module):
    """Per-window period classifier over T = num_segments frames."""
    num_segments: int = 64
    width: int = 32
    embed_dim: int = 128
    model_dim: int = 512
    num_heads: int = 4
    sim_channels: int = 32
    dropout: float = 0.25
    dtype: Any = jnp.float32

    @property
    def num_class(self) -> int:
        return self.num_segments // 2

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        b, t, h, w, c = x.shape
        assert t == self.num_segments, \
            f"window length {t} != num_segments {self.num_segments}"
        norm = lambda: nn.BatchNorm(use_running_average=not train,
                                    momentum=0.9, epsilon=1e-5,
                                    dtype=self.dtype)
        # per-frame encoder: 4× stride-2 conv (NHWC, bf16-friendly)
        y = x.reshape(b * t, h, w, c).astype(self.dtype)
        for i in range(4):
            y = nn.Conv(self.width * (2 ** min(i, 3)), (3, 3), strides=(2, 2),
                        use_bias=False, dtype=self.dtype,
                        name=f"enc_conv{i}")(y)
            y = nn.relu(norm()(y))
        y = jnp.mean(y, axis=(1, 2))  # (B*T, width*8)
        emb = nn.Dense(self.embed_dim, dtype=self.dtype, name="embed")(y)
        emb = emb.reshape(b, t, self.embed_dim).astype(jnp.float32)
        emb = nn.LayerNorm(epsilon=1e-6, name="embed_norm")(emb)

        # temporal self-similarity: softmax(−‖eᵢ−eⱼ‖²/τ) via one matmul
        gram = jnp.einsum("btd,bsd->bts", emb, emb)
        sq = jnp.sum(emb * emb, axis=-1)
        dist = sq[:, :, None] + sq[:, None, :] - 2.0 * gram  # (B, T, T)
        sim = nn.softmax(-dist / _SIM_TEMPERATURE, axis=-1)

        # the matrix is the input image of the period head
        f = nn.Conv(self.sim_channels, (3, 3), dtype=self.dtype,
                    name="sim_conv")(sim[..., None].astype(self.dtype))
        f = nn.relu(f).reshape(b, t, t * self.sim_channels)
        f = nn.Dense(self.model_dim, dtype=self.dtype, name="proj")(f)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, t, self.model_dim))
        f = f + pos.astype(self.dtype)

        # one transformer block (pre-LN), MHA shared with TimeSformer
        a = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="attn_norm")(f)
        a = MHA(self.model_dim, self.num_heads, self.dtype,
                proj_drop=self.dropout, name="attn")(a, train)
        f = f + a
        m = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="mlp_norm")(f)
        m = nn.Dense(self.model_dim * 2, dtype=self.dtype, name="mlp_fc1")(m)
        m = nn.Dense(self.model_dim, dtype=self.dtype,
                     name="mlp_fc2")(nn.gelu(m))
        f = f + m
        f = nn.Dropout(self.dropout, deterministic=not train)(f)

        frame_logits = nn.Dense(self.num_class, dtype=self.dtype,
                                name="period_fc")(f)
        frame_logits = frame_logits.astype(jnp.float32)  # (B, T, C)
        # dense per-frame supervision (trainer broadcasts labels over T)
        self.sow("intermediates", "aux_logits", frame_logits)
        return jnp.mean(frame_logits, axis=1)  # (B, C) consensus


def count_from_frame_logits(frame_logits: np.ndarray,
                            valid: np.ndarray = None,
                            min_periodicity: float = 0.5
                            ) -> Tuple[float, float]:
    """Frame logits → (fractional rep count, mean periodicity).

    count = Σ_t 1/period(t) over frames whose periodic probability
    (1 − P[class 0]) clears ``min_periodicity`` — RepNet's counting rule.
    Rate-invariant: subsampling a video by r scales both the number of
    frames and each frame's predicted period by 1/r, leaving the sum
    unchanged, so one model covers all frame rates.

    Args:
        frame_logits: (..., T, C) array (any leading batch dims).
        valid: optional (..., T) bool mask (False = padding frames).
    """
    x = np.asarray(frame_logits, np.float32)
    x = x - x.max(axis=-1, keepdims=True)
    p = np.exp(x)
    p /= p.sum(axis=-1, keepdims=True)
    periodic = 1.0 - p[..., 0]
    best = np.argmax(p[..., 1:], axis=-1) + 1  # best periodic class id
    contrib = np.where(periodic >= min_periodicity,
                       1.0 / period_of_class(best), 0.0)
    if valid is not None:
        contrib = np.where(valid, contrib, 0.0)
        periodic = np.where(valid, periodic, 0.0)
        n = max(int(np.sum(valid)), 1)
    else:
        n = periodic.size
    return float(contrib.sum()), float(periodic.sum() / n)
