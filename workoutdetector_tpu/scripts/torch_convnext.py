"""Reference-semantics ConvNeXt in plain torch — parity oracle for the
image-classifier path.

The reference's image models come from timm (``convnext_base``,
workoutdetector/train_img.py:44); timm is not in this image, so this
module rebuilds the architecture with timm's exact state-dict layout
(stem.0/stem.1, stages.{i}.downsample.{0,1},
stages.{i}.blocks.{j}.{conv_dw,norm,mlp.fc1,mlp.fc2,gamma},
head.norm/head.fc). Checkpoints it emits flow through
models.convert.port_convnext_checkpoint like a real timm checkpoint,
giving a logits-parity gate (tests/test_convnext.py).
"""

from __future__ import annotations

from typing import Sequence

import torch
import torch.nn as nn


class LayerNorm2d(nn.LayerNorm):
    """LN over the channel dim of NCHW (timm's downsample norm)."""

    def forward(self, x):
        x = x.permute(0, 2, 3, 1)
        x = super().forward(x)
        return x.permute(0, 3, 1, 2)


class Mlp(nn.Module):
    def __init__(self, dim: int):
        super().__init__()
        self.fc1 = nn.Linear(dim, 4 * dim)
        self.fc2 = nn.Linear(4 * dim, dim)

    def forward(self, x):
        return self.fc2(nn.functional.gelu(self.fc1(x)))


class Block(nn.Module):
    def __init__(self, dim: int, layer_scale: float = 1e-6):
        super().__init__()
        self.conv_dw = nn.Conv2d(dim, dim, 7, padding=3, groups=dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim)
        self.gamma = nn.Parameter(layer_scale * torch.ones(dim))

    def forward(self, x):
        r = x
        x = self.conv_dw(x)
        x = x.permute(0, 2, 3, 1)
        x = self.mlp(self.norm(x)) * self.gamma
        return r + x.permute(0, 3, 1, 2)


class Stage(nn.Module):
    def __init__(self, cin: int, dim: int, depth: int, downsample: bool):
        super().__init__()
        self.downsample = nn.Sequential(
            LayerNorm2d(cin, eps=1e-6),
            nn.Conv2d(cin, dim, 2, 2)) if downsample else nn.Identity()
        self.blocks = nn.Sequential(*[Block(dim) for _ in range(depth)])

    def forward(self, x):
        return self.blocks(self.downsample(x))


class Head(nn.Module):
    def __init__(self, dim: int, num_classes: int):
        super().__init__()
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.fc = nn.Linear(dim, num_classes)

    def forward(self, x):
        return self.fc(self.norm(x.mean(dim=(2, 3))))


class TorchConvNeXt(nn.Module):
    def __init__(self, depths: Sequence[int] = (3, 3, 9, 3),
                 dims: Sequence[int] = (96, 192, 384, 768),
                 num_classes: int = 1000):
        super().__init__()
        self.stem = nn.Sequential(
            nn.Conv2d(3, dims[0], 4, 4),
            LayerNorm2d(dims[0], eps=1e-6))
        stages = []
        cin = dims[0]
        for i, (depth, dim) in enumerate(zip(depths, dims)):
            stages.append(Stage(cin, dim, depth, downsample=i > 0))
            cin = dim
        self.stages = nn.Sequential(*stages)
        self.head = Head(dims[-1], num_classes)

    def forward(self, x):
        return self.head(self.stages(self.stem(x)))
