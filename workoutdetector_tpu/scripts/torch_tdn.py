"""Reference-semantics TDN in plain torch — parity oracle for the second
model family.

Rebuilds the reference TDN stack (workoutdetector/models/tdn.py:
TDN_Net :92-186, mSEModule :196-334, ShiftModule :337-376,
Bottleneck/BottleneckShift :421-520, FBResNet :523-597) with the exact
state-dict layout its checkpoints carry (base_model.conv1_5.0,
layer{i}_bak.{j}, resnext_layer1.{j}, mse.*, shift.conv, new_fc), so
checkpoints flow through models.convert.port_tdn_checkpoint like real
ones and flax TDN logits can be gated against torch
(tests/test_parity_tdn.py).

Oracle-only: eval-mode use expected; adaptive average pooling replaces
the fixed AvgPool2d(7) so small test inputs work (identical at 224²).
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F


class ShiftModule(nn.Module):
    """Grouped Conv1d over time, kernels initialized to [left, right,
    identity] per channel fold (reference tdn.py:337-376)."""

    def __init__(self, channels: int, n_segment: int = 8, n_div: int = 8,
                 mode: str = "shift"):
        super().__init__()
        self.n_segment = n_segment
        fold = channels // n_div
        self.conv = nn.Conv1d(channels, channels, 3, padding=1,
                              groups=channels, bias=False)
        with torch.no_grad():
            self.conv.weight.zero_()
            if mode == "shift":
                self.conv.weight[:fold, 0, 2] = 1      # shift left
                self.conv.weight[fold:2 * fold, 0, 0] = 1  # shift right
                if 2 * fold < channels:
                    self.conv.weight[2 * fold:, 0, 1] = 1  # fixed
            elif mode == "fixed":
                self.conv.weight[:, 0, 1] = 1

    def forward(self, x):
        nt, c, h, w = x.shape
        n = nt // self.n_segment
        v = x.view(n, self.n_segment, c, h, w).permute(0, 3, 4, 2, 1)
        v = v.reshape(n * h * w, c, self.n_segment)
        v = self.conv(v)
        v = v.view(n, h, w, c, self.n_segment).permute(0, 4, 3, 1, 2)
        return v.reshape(nt, c, h, w)


class MSEModule(nn.Module):
    """Motion excitation (reference mSEModule): shared-BN two-scale
    branches over forward/backward temporal feature diffs."""

    def __init__(self, channel: int, n_segment: int = 8,
                 reduction: int = 16):
        super().__init__()
        r = channel // reduction
        self.n_segment = n_segment
        self.conv1 = nn.Conv2d(channel, r, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(r)
        self.conv2 = nn.Conv2d(r, r, 3, padding=1, groups=r, bias=False)
        self.conv3 = nn.Conv2d(r, channel, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(channel)
        self.conv3_smallscale2 = nn.Conv2d(r, r, 3, padding=1, bias=False)
        self.bn3_smallscale2 = nn.BatchNorm2d(r)
        self.conv3_smallscale4 = nn.Conv2d(r, r, 3, padding=1, bias=False)
        self.bn3_smallscale4 = nn.BatchNorm2d(r)

    def _branch(self, diff):
        if diff.shape[2] >= 2 and diff.shape[3] >= 2:
            y2 = F.avg_pool2d(diff, 2, 2)
            y2 = self.bn3_smallscale2(self.conv3_smallscale2(y2))
            y2 = F.interpolate(y2, diff.shape[2:])
        else:
            y2 = self.bn3_smallscale2(self.conv3_smallscale2(diff))
        y4 = self.bn3_smallscale4(self.conv3_smallscale4(diff))
        y = self.bn3(self.conv3(diff / 3.0 + y2 / 3.0 + y4 / 3.0))
        return torch.sigmoid(y) - 0.5

    def forward(self, x):
        nt = x.shape[0]
        t = self.n_segment
        bott = self.bn1(self.conv1(x))
        conv_bott = self.conv2(bott)
        vb = bott.view(nt // t, t, *bott.shape[1:])
        vc = conv_bott.view(nt // t, t, *conv_bott.shape[1:])
        fwd = torch.zeros_like(vb)
        fwd[:, :-1] = vc[:, 1:] - vb[:, :-1]  # conv(t+1) - raw(t), 0 at end
        bwd = torch.zeros_like(vb)
        bwd[:, 1:] = vc[:, :-1] - vb[:, 1:]   # conv(t-1) - raw(t), 0 at start
        y = 0.5 * self._branch(fwd.view_as(bott)) + \
            0.5 * self._branch(bwd.view_as(bott))
        return x + x * y


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, n_segment, cin, planes, stride=1, with_shift=False):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=True)
        self.bn1 = nn.BatchNorm2d(planes)
        if with_shift:
            self.mse = MSEModule(planes, n_segment=n_segment)
            self.shift = ShiftModule(planes, n_segment=n_segment)
        self.with_shift = with_shift
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=True)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=True)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = None
        if stride != 1 or cin != planes * 4:
            self.downsample = nn.Sequential(
                nn.Conv2d(cin, planes * 4, 1, stride, bias=True),
                nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        if self.with_shift:
            y = self.shift(self.mse(y))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


def _stage(n_segment, cin, planes, blocks, stride, with_shift):
    mods = [Bottleneck(n_segment, cin, planes, stride, with_shift)]
    for _ in range(1, blocks):
        mods.append(Bottleneck(n_segment, planes * 4, planes, 1, with_shift))
    return nn.Sequential(*mods)


class TDNNet(nn.Module):
    """TDN_Net attribute/state-dict layout (reference tdn.py:92-186)."""

    STAGES = {"resnet50": [3, 4, 6, 3], "resnet101": [3, 4, 23, 3]}

    def __init__(self, n_segment: int = 8, base_model: str = "resnet50",
                 alpha: float = 0.5, beta: float = 0.5):
        super().__init__()
        sizes = self.STAGES[base_model]
        self.alpha, self.beta = alpha, beta
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=True)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.conv1_5 = nn.Sequential(
            nn.Conv2d(12, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
            nn.ReLU(inplace=True))
        self.maxpool_diff = nn.MaxPool2d(3, 2, 1)
        self.resnext_layer1 = _stage(n_segment, 64, 64, sizes[0], 1, False)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        self.layer1_bak = _stage(n_segment, 64, 64, sizes[0], 1, False)
        self.layer2_bak = _stage(n_segment, 256, 128, sizes[1], 2, True)
        self.layer3_bak = _stage(n_segment, 512, 256, sizes[2], 2, True)
        self.layer4_bak = _stage(n_segment, 1024, 512, sizes[3], 2, True)
        self.avg_diff = nn.AvgPool2d(2, 2)

    def forward(self, x):
        """x: (B*T, 15, H, W) — 5 stacked RGB frames."""
        frames = [x[:, 3 * i:3 * i + 3] for i in range(5)]
        diffs = torch.cat([frames[i + 1] - frames[i] for i in range(4)], 1)
        xd = self.conv1_5(self.avg_diff(diffs))
        xd = self.maxpool_diff(xd)
        temp1 = xd
        xd = self.resnext_layer1(xd)

        y = self.maxpool(self.relu(self.bn1(self.conv1(frames[2]))))
        y = self.alpha * y + self.beta * F.interpolate(temp1, y.shape[2:])
        y = self.layer1_bak(y)
        y = self.alpha * y + self.beta * F.interpolate(xd, y.shape[2:])
        y = self.layer2_bak(y)
        y = self.layer3_bak(y)
        y = self.layer4_bak(y)
        return F.avg_pool2d(y, y.shape[2]).flatten(1)  # (B*T, 2048)


class TorchTDN(nn.Module):
    """TSN-wrapper semantics over TDN_Net: base_model features →
    dropout → new_fc → segment consensus (reference tsn.py:99-351)."""

    def __init__(self, num_class: int, num_segments: int = 8,
                 base_model: str = "resnet50", dropout: float = 0.0):
        super().__init__()
        self.num_segments = num_segments
        alpha, beta = (0.5, 0.5) if num_segments == 8 else (0.75, 0.25)
        self.base_model = TDNNet(num_segments, base_model, alpha, beta)
        self.dropout = nn.Dropout(dropout)
        self.new_fc = nn.Linear(512 * 4, num_class)
        nn.init.normal_(self.new_fc.weight, std=0.001)
        nn.init.zeros_(self.new_fc.bias)

    def forward(self, x):
        """x: (B, T, 5, 3, H, W) normalized float → (B, num_class)."""
        b, t, d, c, h, w = x.shape
        assert t == self.num_segments and d == 5
        feat = self.base_model(x.reshape(b * t, d * c, h, w))
        logits = self.new_fc(self.dropout(feat)).view(b, t, -1)
        return logits.mean(dim=1)
