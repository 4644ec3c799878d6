"""Reference-semantics ViT in plain torch — parity oracle for the
image-classifier vit branch.

The reference's image path takes any timm model name via config
(workoutdetector/train_img.py:28-45); timm is not in this image, so this
module rebuilds the vanilla ViT classifier with timm's exact state-dict
layout (cls_token, pos_embed, patch_embed.proj,
blocks.{i}.{norm1, attn.qkv, attn.proj, norm2, mlp.fc1, mlp.fc2},
norm, head) and timm's exact math (pre-LN, packed qkv, exact GELU).
Checkpoints it emits flow through models.convert.port_vit_checkpoint
like a real timm checkpoint, giving a logits-parity gate
(tests/test_vit.py).
"""

from __future__ import annotations

import torch
import torch.nn as nn


class Attention(nn.Module):
    def __init__(self, dim: int, num_heads: int):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, 3 * dim)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        b, l, d = x.shape
        h = self.num_heads
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q = q.reshape(b, l, h, d // h).transpose(1, 2)
        k = k.reshape(b, l, h, d // h).transpose(1, 2)
        v = v.reshape(b, l, h, d // h).transpose(1, 2)
        attn = (q @ k.transpose(-2, -1)) * (d // h) ** -0.5
        out = attn.softmax(dim=-1) @ v
        return self.proj(out.transpose(1, 2).reshape(b, l, d))


class Mlp(nn.Module):
    def __init__(self, dim: int, hidden: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim: int, num_heads: int, mlp_ratio: float = 4.0):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = Attention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class PatchEmbed(nn.Module):
    def __init__(self, patch: int, dim: int):
        super().__init__()
        self.proj = nn.Conv2d(3, dim, patch, stride=patch)

    def forward(self, x):
        return self.proj(x).flatten(2).transpose(1, 2)  # (B, P, D)


class TorchViT(nn.Module):
    """timm ``VisionTransformer`` layout/math, minimal (no dropout —
    parity runs eval-mode anyway)."""

    def __init__(self, image_size: int = 224, patch: int = 16,
                 dim: int = 768, depth: int = 12, heads: int = 12,
                 num_classes: int = 1000):
        super().__init__()
        p = (image_size // patch) ** 2
        self.patch_embed = PatchEmbed(patch, dim)
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, p + 1, dim))
        self.blocks = nn.ModuleList(
            [Block(dim, heads) for _ in range(depth)])
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.head = nn.Linear(dim, num_classes)
        nn.init.trunc_normal_(self.cls_token, std=0.02)
        nn.init.trunc_normal_(self.pos_embed, std=0.02)

    def forward(self, x):  # x (B, 3, H, W)
        tokens = self.patch_embed(x)
        cls = self.cls_token.expand(x.shape[0], -1, -1)
        tokens = torch.cat([cls, tokens], dim=1) + self.pos_embed
        for blk in self.blocks:
            tokens = blk(tokens)
        return self.head(self.norm(tokens)[:, 0])
