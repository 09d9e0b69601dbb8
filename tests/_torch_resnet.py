"""Clean-room torch ResNet-34 with torchvision's exact module layout.

torchvision is not installed in this sandbox, so the full-fidelity
bridge rehearsal (reference Network -> .pth -> our Flax pytree -> same
forward outputs) needs a stand-in whose `state_dict()` keys and shapes
are byte-compatible with `torchvision.models.resnet34`:

    conv1.weight, bn1.{weight,bias,running_mean,running_var},
    layer{1..4}.{i}.conv{1,2}.weight, .bn{1,2}.*,
    layer{2..4}.0.downsample.{0,1}.*, fc.{weight,bias}

The layout is reproduced from the public torchvision architecture
description (the same contract `models/torch_bridge.py` documents); no
torchvision code is copied.
"""

from __future__ import annotations

import torch
import torch.nn as nn


class BasicBlock(nn.Module):
    def __init__(self, in_ch: int, out_ch: int, stride: int = 1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, out_ch, 3, stride=stride, padding=1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(out_ch)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(out_ch, out_ch, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(out_ch)
        self.downsample = None
        if stride != 1 or in_ch != out_ch:
            self.downsample = nn.Sequential(
                nn.Conv2d(in_ch, out_ch, 1, stride=stride, bias=False),
                nn.BatchNorm2d(out_ch),
            )

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchResNet34(nn.Module):
    layers = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)

    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        in_ch = 64
        for i, (n, w) in enumerate(zip(self.layers, self.widths), start=1):
            blocks = []
            for j in range(n):
                stride = 2 if (j == 0 and i > 1) else 1
                blocks.append(BasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{i}", nn.Sequential(*blocks))

        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


def resnet34(*args, weights=None, **kwargs) -> TorchResNet34:
    """torchvision-signature factory (drop-in for the reference's
    `resnet34(weights=...)` import; `weights` is accepted and ignored —
    there is no ImageNet file in this sandbox)."""
    return TorchResNet34()


def randomize_(module: nn.Module, seed: int = 0) -> nn.Module:
    """Fill every parameter AND BatchNorm running stat with seeded
    nontrivial values, so a forward comparison can't pass by symmetry
    (fresh BN stats are mean=0/var=1, which would mask scale bugs)."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in module.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.05)
        for m in module.modules():
            if isinstance(m, nn.BatchNorm2d):
                m.running_mean.copy_(
                    torch.randn(m.running_mean.shape, generator=g) * 0.1
                )
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) * 0.5 + 0.75
                )
    return module
