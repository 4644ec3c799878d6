"""Reference-semantics TSM in plain torch — the numerical parity oracle.

torchvision is not in this image, so this module provides a from-scratch
torch ResNet whose ``state_dict`` uses the exact torchvision key layout
(conv1/bn1/layer{i}.{j}.conv{k}/downsample.{0,1}/fc), wrapped into a TSM
with the reference's semantics (workoutdetector/models/tsm.py:17-50 shift,
:104-139 blockres injection, :409-419 consensus forward, new_fc head).
Checkpoints it produces flow through ``models.convert.port_tsm_checkpoint``
unchanged, giving an end-to-end torch→JAX logits-parity gate without any
external weight file (tests/test_parity_torch.py).

This is an *oracle*, not a training path: eval-mode only usage is expected
(BN running stats), though autograd works if anyone wants it.
"""

from __future__ import annotations

import torch
import torch.nn as nn

STAGES = {
    "resnet18": ([2, 2, 2, 2], False),
    "resnet34": ([3, 4, 6, 3], False),
    "resnet50": ([3, 4, 6, 3], True),
    "resnet101": ([3, 4, 23, 3], True),
}


def shift_clip(x: torch.Tensor, n_segment: int, fold_div: int = 8) -> torch.Tensor:
    """TSM channel shift on a flat (B*T, C, H, W) batch (reference
    tsm.py:34-50): first C//fold_div channels pull from t+1, the next
    fold pull from t-1, the rest pass through; vacated slots are zero."""
    bt, c, h, w = x.shape
    v = x.view(bt // n_segment, n_segment, c, h, w)
    fold = c // fold_div
    out = torch.zeros_like(v)
    out[:, :-1, :fold] = v[:, 1:, :fold]
    out[:, 1:, fold:2 * fold] = v[:, :-1, fold:2 * fold]
    out[:, :, 2 * fold:] = v[:, :, 2 * fold:]
    return out.view(bt, c, h, w)


class TemporalPoolWrap(nn.Module):
    """max-pool time in front of a stage (reference TemporalPool,
    tsm.py:83-101): window 3, stride 2, pad 1 over T. Registers the stage
    as ``net`` (key surgery strips '.net.')."""

    def __init__(self, net: nn.Module, n_segment: int):
        super().__init__()
        self.net = net
        self.n_segment = n_segment

    def forward(self, x):
        nt, c, h, w = x.shape
        v = x.view(nt // self.n_segment, self.n_segment, c, h, w)
        v = v.transpose(1, 2)
        v = torch.nn.functional.max_pool3d(v, (3, 1, 1), (2, 1, 1),
                                           (1, 0, 0))
        v = v.transpose(1, 2).reshape(nt // 2, c, h, w)
        return self.net(v)


class ShiftWrap(nn.Module):
    """Shift-then-conv wrapper; registers the conv as ``net`` so state-dict
    keys gain the '.net.' segment the port tool strips (reference
    tsm.py:134-136)."""

    def __init__(self, net: nn.Module, n_segment: int, fold_div: int = 8):
        super().__init__()
        self.net = net
        self.n_segment = n_segment
        self.fold_div = fold_div

    def forward(self, x):
        return self.net(shift_clip(x, self.n_segment, self.fold_div))


def _bn(c):
    return nn.BatchNorm2d(c, eps=1e-5)


class BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = _bn(planes)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes, 1, stride, bias=False), _bn(planes))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + r)


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = _bn(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = _bn(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = _bn(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=False),
                _bn(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


class TorchResNet(nn.Module):
    """torchvision-layout ResNet (named children conv1, bn1, layer1..4,
    fc) so state-dict keys line up with the port tool's expectations."""

    def __init__(self, arch: str = "resnet50", num_classes: int = 1000):
        super().__init__()
        sizes, bottleneck = STAGES[arch]
        block = Bottleneck if bottleneck else BasicBlock
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = _bn(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        cin = 64
        for i, n_blocks in enumerate(sizes):
            planes = 64 * 2 ** i
            blocks = []
            for j in range(n_blocks):
                blocks.append(block(cin, planes, 2 if i > 0 and j == 0 else 1))
                cin = planes * block.expansion
            setattr(self, f"layer{i + 1}", nn.Sequential(*blocks))
        self.avgpool = nn.AdaptiveAvgPool2d(1)
        self.fc = nn.Linear(cin, num_classes) if num_classes else nn.Identity()
        self.out_features = cin

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            x = getattr(self, f"layer{i + 1}")(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


class TorchTSM(nn.Module):
    """TSM forward with the reference's structure: base_model backbone with
    shifts injected at block conv1s, dropout, new_fc, segment consensus
    (reference tsm.py:189-419)."""

    def __init__(self, num_class: int, num_segments: int = 8,
                 base_model: str = "resnet50", shift_div: int = 8,
                 shift_place: str = "blockres", dropout: float = 0.0,
                 consensus_type: str = "avg", temporal_pool: bool = False):
        super().__init__()
        self.num_segments = num_segments
        self.consensus_type = consensus_type
        self.temporal_pool = temporal_pool
        self.base_model = TorchResNet(base_model, num_classes=0)
        self.dropout = nn.Dropout(dropout)
        self.new_fc = nn.Linear(self.base_model.out_features, num_class)
        nn.init.normal_(self.new_fc.weight, std=0.001)
        nn.init.zeros_(self.new_fc.bias)
        # segments alive per stage: T halves after stage 1 when pooling
        # (reference make_temporal_shift n_segment_list, tsm.py:109-112)
        segs = [num_segments] + [num_segments // 2 if temporal_pool else
                                 num_segments] * 3
        if shift_place == "blockres":
            # shift in front of conv1 of each residual branch; every other
            # block when stage 3 has ≥23 blocks (reference tsm.py:125-137)
            n_round = 2 if STAGES[base_model][0][2] >= 23 else 1
            for i in range(4):
                stage = getattr(self.base_model, f"layer{i + 1}")
                for j, blk in enumerate(stage):
                    if j % n_round == 0:
                        blk.conv1 = ShiftWrap(blk.conv1, segs[i], shift_div)
        elif shift_place == "block":
            for i in range(4):
                stage = getattr(self.base_model, f"layer{i + 1}")
                wrapped = nn.Sequential(*[
                    ShiftWrap(blk, segs[i], shift_div) for blk in stage])
                setattr(self.base_model, f"layer{i + 1}", wrapped)
        else:
            raise ValueError(shift_place)
        if temporal_pool:
            # pool in front of stage 2 (reference make_temporal_pool,
            # tsm.py:142-148)
            self.base_model.layer2 = TemporalPoolWrap(
                self.base_model.layer2, num_segments)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        """x: (B, T, C, H, W) normalized float → (B, num_class)."""
        b, t, c, h, w = x.shape
        assert t == self.num_segments
        feat = self.base_model(x.reshape(b * t, c, h, w))
        logits = self.new_fc(self.dropout(feat))
        t_out = t // 2 if self.temporal_pool else t
        logits = logits.view(b, t_out, -1)
        if self.consensus_type == "avg":
            logits = logits.mean(dim=1)
        return logits
