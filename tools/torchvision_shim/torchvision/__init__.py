"""Minimal torchvision stand-in for running the REFERENCE implementation
(`/root/reference/src/sdnet`) inside this sandbox, which has torch but
no torchvision and no network egress.

Purpose (VERDICT r4 item 2): the strongest in-sandbox accuracy-parity
evidence is *cross-framework evaluation of trained checkpoints* — train
the reference's own `Trainer` on the synthetic dataset, then evaluate
its `.pth` through this framework's torch bridge, and evaluate this
framework's checkpoint through the reference's own `evaluate` loop.
That requires the reference to import:

    torchvision.models.{resnet34, ResNet34_Weights}   (network.py:3)
    torchvision.transforms.{Compose, Resize, ToTensor,
                            Normalize, ColorJitter}   (transforms.py:2,
                                                       predictor.py:2)
    torchvision.transforms.functional.{resize, hflip, vflip,
                            to_tensor, to_pil_image}  (transforms.py:3,
                                                       trainer.py:6,
                                                       visualization.py:2)

Only that surface is provided, implemented on PIL + torch from the
public API contract (no torchvision code is copied). Not a general
replacement: tensor-input geometry ops raise.

Usage: prepend this directory to sys.path before /root/reference/src:

    sys.path[:0] = ["tools/torchvision_shim", "/root/reference/src"]
"""

from . import models, transforms  # noqa: F401

__version__ = "0.0.0+sdnet-shim"
