"""CPU reference baseline for bench.py.

The reference deploys TSM-R50 through onnxruntime (CPU/CUDA providers,
reference utils/inference_count.py:525-527). onnxruntime isn't in this
image, so the closest measurable stand-in is a plain torch-CPU ResNet-50
forward over the same (8, 3, 224, 224) clip — the TSM shift adds no FLOPs.
This script measures clips/sec on CPU; bench.py uses the recorded number
as ``vs_baseline`` denominator.

Run: python -m workoutdetector_tpu.scripts.torch_baseline
"""

import time

import torch
import torch.nn as nn


class Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.down = None
        if stride != 1 or cin != planes * 4:
            self.down = nn.Sequential(nn.Conv2d(cin, planes * 4, 1, stride,
                                                bias=False),
                                      nn.BatchNorm2d(planes * 4))

    def forward(self, x):
        r = x if self.down is None else self.down(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + r)


def resnet50(num_classes=12):
    layers = []
    cin = 64
    for planes, blocks, stride in ((64, 3, 1), (128, 4, 2), (256, 6, 2),
                                   (512, 3, 2)):
        for b in range(blocks):
            layers.append(Bottleneck(cin, planes, stride if b == 0 else 1))
            cin = planes * 4
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False), nn.BatchNorm2d(64),
        nn.ReLU(inplace=True), nn.MaxPool2d(3, 2, 1), *layers,
        nn.AdaptiveAvgPool2d(1), nn.Flatten(), nn.Linear(2048, num_classes))


def measure(clips: int = 4, warmup: int = 1) -> float:
    model = resnet50().eval()
    x = torch.randn(8, 3, 224, 224)
    with torch.no_grad():
        for _ in range(warmup):
            model(x)
        t0 = time.perf_counter()
        for _ in range(clips):
            model(x)
        dt = time.perf_counter() - t0
    return clips / dt


if __name__ == "__main__":
    cps = measure()
    print(f"torch-cpu TSM-R50-equivalent: {cps:.3f} clips/sec")
