"""Model factory (reference workoutdetector/models/build.py:13-31) plus
state initialization helpers."""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from workoutdetector_tpu.config import ModelConfig
from workoutdetector_tpu.models.resnet import STAGE_SIZES, _make
from workoutdetector_tpu.models.tsm import TSM
from workoutdetector_tpu.models.tdn import TDN

_DTYPES = {"float32": jnp.float32, "bfloat16": jnp.bfloat16, "bf16": jnp.bfloat16,
           "fp32": jnp.float32}


def _resolve_fused(flag: str) -> bool:
    """Resolve cfg.model.fused_block ∈ {auto,true,false}.

    'auto' currently resolves to OFF everywhere: the whole-block Pallas
    fusion measured SLOWER end-to-end on v5e (982 vs 1189 clips/s,
    TSM-R50 batch 32, 2026-08-17 — see ops/pallas/fused_block.py and the
    docs/PERF.md lever table), so only an explicit 'true' enables it.
    'auto' is kept so a future backend/shape profile can flip the
    default without a config migration. Note the kernel targets TPU
    (CPU needs interpret mode) and GSPMD cannot partition the
    pallas_call — 'true' is a single-chip inference knob.
    """
    f = str(flag).lower()
    if f in ("true", "1", "yes", "on"):
        return True
    return False


def build_model(cfg: ModelConfig) -> nn.Module:
    """Dispatch on cfg.model_type ∈ {tsm, tdn, image}."""
    dtype = _DTYPES[cfg.dtype]
    mt = cfg.model_type.lower()
    if mt == "tsm":
        return TSM(num_class=cfg.num_class,
                   fused_block=_resolve_fused(cfg.fused_block),
                   fused_stages=tuple(cfg.fused_stages),
                   pallas_conv_bwd=cfg.pallas_conv_bwd,
                   num_segments=cfg.num_segments,
                   base_model=cfg.base_model,
                   is_shift=cfg.is_shift,
                   shift_div=cfg.shift_div,
                   shift_place=cfg.shift_place,
                   consensus_type=cfg.consensus_type,
                   dropout=cfg.dropout,
                   partial_bn=cfg.partial_bn,
                   temporal_pool=cfg.temporal_pool,
                   non_local=cfg.non_local,
                   dtype=dtype,
                   shift_impl=cfg.shift_impl,
                   shift_round=cfg.shift_round,
                   remat=cfg.remat)
    if mt == "tdn":
        return TDN(num_class=cfg.num_class,
                   num_segments=cfg.num_segments,
                   num_frames=max(cfg.num_frames, 5),
                   base_model=cfg.base_model,
                   consensus_type=cfg.consensus_type,
                   dropout=cfg.dropout,
                   partial_bn=cfg.partial_bn,
                   dtype=dtype)
    if mt == "tpn":
        # reference configs/tpn.py: ResNetTSM backbone (out_indices (2,3),
        # shift_div 8) + TPN neck + TPNHead, trained via train.py
        from workoutdetector_tpu.models.tpn import TPN
        return TPN(num_class=cfg.num_class,
                   num_segments=cfg.num_segments,
                   base_model=cfg.base_model,
                   is_shift=cfg.is_shift,
                   shift_div=cfg.shift_div,
                   dropout=cfg.dropout,
                   partial_bn=cfg.partial_bn,
                   dtype=dtype)
    if mt == "timesformer":
        # reference configs/timesformer_div_8x4x1_k400.py:5-23 (mmaction
        # TimeSformer backbone + TimeSformerHead, trained via train.py)
        from workoutdetector_tpu.models.timesformer import (TimeSformer,
                                                            VIT_VARIANTS)
        embed, depth, heads = VIT_VARIANTS.get(
            cfg.base_model, (cfg.embed_dims, cfg.num_layers, cfg.num_heads))
        flash = str(cfg.flash_attention).lower()
        if flash in ("true", "1", "yes", "on"):
            use_flash = True
        else:
            # 'auto' resolves OFF everywhere: measured exactly neutral on
            # v5e (67.8 vs 67.6 ms wall, identical device time — the
            # 197→256 pad wastes 30% of key reads, offsetting the saved
            # (n,h,l,l) materialization; docs/PERF.md lever table). The
            # kernel also doesn't lower on CPU. Explicit 'true' remains
            # for larger-sequence variants where the math flips.
            use_flash = False
        return TimeSformer(num_class=cfg.num_class,
                           flash_attention=use_flash,
                           num_segments=cfg.num_segments,
                           image_size=cfg.image_size,
                           patch_size=cfg.patch_size,
                           embed_dims=embed,
                           num_layers=depth,
                           num_heads=heads,
                           mlp_ratio=cfg.mlp_ratio,
                           attention_type=cfg.attention_type,
                           dropout=cfg.dropout,
                           drop_path_rate=cfg.drop_path_rate,
                           moe_experts=cfg.moe_experts,
                           moe_capacity_factor=cfg.moe_capacity_factor,
                           dtype=dtype)
    if mt == "repnet":
        # RepNet-style period counter (models/repnet.py; the learnable
        # counterpart of the reference's similarity-notebook exploration).
        # num_class is DERIVED (= num_segments // 2, class 0 aperiodic);
        # cfg.num_class is ignored by design.
        from workoutdetector_tpu.models.repnet import (REPNET_VARIANTS,
                                                       RepNet)
        width, embed, model_dim, heads = REPNET_VARIANTS.get(
            cfg.base_model, REPNET_VARIANTS["base"])
        return RepNet(num_segments=cfg.num_segments,
                      width=width,
                      embed_dim=embed,
                      model_dim=model_dim,
                      num_heads=heads,
                      dropout=cfg.dropout,
                      dtype=dtype)
    if mt == "image":
        # image-classifier path (reference train_img.py:28-45 takes ANY
        # timm model name via config, defaulting to convnext_base):
        # ConvNeXt zoo + ResNet zoo + ViT zoo (timm vit_* names)
        from workoutdetector_tpu.models.convnext import CONVNEXT_VARIANTS
        from workoutdetector_tpu.models.timesformer import VIT_VARIANTS
        if cfg.base_model not in STAGE_SIZES and \
                cfg.base_model not in CONVNEXT_VARIANTS and \
                cfg.base_model not in VIT_VARIANTS:
            raise KeyError(f"Unknown image backbone '{cfg.base_model}'")
        return ImageClassifier(base_model=cfg.base_model,
                               num_class=cfg.num_class,
                               dtype=dtype)
    raise KeyError(f"Model '{cfg.model_type}' is not supported.")


class ImageClassifier(nn.Module):
    """Image classifier shell (the reference train_img.py LitModel's
    timm backbone, :28-60). Accepts (B, H, W, C) or the dataset-pipeline
    shape (B, 1, H, W, C) — single-frame clips squeeze through."""
    base_model: str = "resnet50"
    num_class: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        if x.ndim == 5:
            assert x.shape[1] == 1, f"expected single-frame clips, got {x.shape}"
            x = x[:, 0]
        if self.base_model.startswith("vit_"):
            # ViT image classifier == TimeSformer space_only at T=1 (the
            # per-frame ViT with cls averaged over one frame IS a plain
            # ViT) — one encoder implementation serves both surfaces.
            # Port timm/HF checkpoints with models/convert.
            #     port_vit_checkpoint(sd, n)
            from workoutdetector_tpu.models.timesformer import (
                TimeSformer, VIT_VARIANTS, vit_patch_size)
            d, depth, heads = VIT_VARIANTS[self.base_model]
            net = TimeSformer(num_class=self.num_class, num_segments=1,
                              patch_size=vit_patch_size(self.base_model),
                              embed_dims=d, num_layers=depth,
                              num_heads=heads, attention_type="space_only",
                              dtype=self.dtype, name="backbone_img")
            return net(x[:, None], train=train).astype(jnp.float32)
        if self.base_model.startswith("convnext"):
            from workoutdetector_tpu.models.convnext import (
                CONVNEXT_VARIANTS, ConvNeXt)
            depths, dims = CONVNEXT_VARIANTS[self.base_model]
            # port checkpoints with port_convnext_checkpoint(
            #     sd, n, prefix=("backbone_img",))
            net = ConvNeXt(depths=depths, dims=dims,
                           num_classes=self.num_class, dtype=self.dtype,
                           name="backbone_img")
            return net(x, train=train).astype(jnp.float32)
        net = _make(self.base_model, num_classes=self.num_class,
                    dtype=self.dtype, name="backbone_img")
        return net(x, train=train).astype(jnp.float32)


def example_input(cfg: ModelConfig, batch: int = 1, image_size: int = 224) -> jnp.ndarray:
    """A zero input of the model's expected shape."""
    mt = cfg.model_type.lower()
    if mt == "timesformer":
        # the patch grid is a config constant — ignore the caller's
        # image_size override to keep pos_embed shape consistent
        return jnp.zeros(
            (batch, cfg.num_segments, cfg.image_size, cfg.image_size, 3),
            jnp.float32)
    if mt in ("tsm", "tpn", "repnet"):
        return jnp.zeros((batch, cfg.num_segments, image_size, image_size, 3),
                         jnp.float32)
    if mt == "tdn":
        return jnp.zeros(
            (batch, cfg.num_segments, max(cfg.num_frames, 5), image_size, image_size, 3),
            jnp.float32)
    return jnp.zeros((batch, image_size, image_size, 3), jnp.float32)


def create_model_state(cfg: ModelConfig,
                       rng: jax.Array,
                       batch: int = 1,
                       image_size: int = 224) -> Tuple[nn.Module, Dict[str, Any]]:
    """Build the model and initialize {'params', 'batch_stats'}."""
    model = build_model(cfg)
    x = example_input(cfg, batch, image_size)
    variables = model.init({"params": rng}, x, train=False)
    return model, variables
