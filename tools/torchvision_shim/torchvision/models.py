"""`torchvision.models` surface used by the reference: `resnet34` and
`ResNet34_Weights` (`/root/reference/src/sdnet/model/network.py:3,41`).

The module layout matches torchvision's resnet34 byte-for-byte in
`state_dict()` keys/shapes (same contract as
`structuredetector_tpu/models/torch_bridge.py` and
`tests/_torch_resnet.py`), so checkpoints trained through this shim are
loadable by real torchvision-based installs and by our bridge.

`weights=ResNet34_Weights.DEFAULT` loads a local ImageNet file if one
exists in the standard torch-hub cache (there is no egress to download
one); otherwise it falls back to torchvision's documented random init
(kaiming fan-out on convs, unit BN) with a loud warning.
"""

from __future__ import annotations

import sys

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


class ResNet(nn.Module):
    def __init__(self, layers=(3, 4, 6, 3), widths=(64, 128, 256, 512)):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)

        in_ch = 64
        for i, (n, w) in enumerate(zip(layers, widths), start=1):
            blocks = []
            for j in range(n):
                stride = 2 if (j == 0 and i > 1) else 1
                blocks.append(BasicBlock(in_ch, w, stride))
                in_ch = w
            setattr(self, f"layer{i}", nn.Sequential(*blocks))

        self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
        self.fc = nn.Linear(512, 1000)

        # torchvision's documented init: kaiming fan-out for convs,
        # constant 1/0 for BN affine.
        for m in self.modules():
            if isinstance(m, nn.Conv2d):
                nn.init.kaiming_normal_(m.weight, mode="fan_out",
                                        nonlinearity="relu")
            elif isinstance(m, nn.BatchNorm2d):
                nn.init.constant_(m.weight, 1.0)
                nn.init.constant_(m.bias, 0.0)

    def forward(self, x):
        x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
        x = self.layer1(x)
        x = self.layer2(x)
        x = self.layer3(x)
        x = self.layer4(x)
        x = torch.flatten(self.avgpool(x), 1)
        return self.fc(x)


class ResNet34_Weights:
    """Sentinel mirroring torchvision's weight-enum API surface."""

    DEFAULT = "IMAGENET1K_V1"
    IMAGENET1K_V1 = "IMAGENET1K_V1"


def resnet34(*, weights=None, progress: bool = True, **kwargs) -> ResNet:
    model = ResNet()
    if weights is not None:
        try:
            from structuredetector_tpu.models.torch_bridge import (
                find_imagenet_resnet34,
            )

            path = find_imagenet_resnet34("resnet34")
            sd = torch.load(path, map_location="cpu", weights_only=True)
            model.load_state_dict(sd)
        except (ImportError, FileNotFoundError):
            print(
                "[torchvision-shim] WARNING: no local ImageNet resnet34 "
                "checkpoint (no egress to download one); using random "
                "init. Set $SDNET_PRETRAINED to a torchvision "
                "resnet34-*.pth to enable the warm start.",
                file=sys.stderr,
            )
    return model
