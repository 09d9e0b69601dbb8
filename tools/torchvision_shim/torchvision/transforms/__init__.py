"""`torchvision.transforms` classes used by the reference
(`/root/reference/src/sdnet/data/transforms.py:2`, `model/predictor.py:2`):
Compose, Resize, ToTensor, Normalize, ColorJitter.

ColorJitter follows torchvision's published algorithm: each factor is
drawn uniformly from [max(0, 1-v), 1+v] (hue from [-h, h]) and the four
adjustments are applied in a random order. Brightness/contrast/
saturation use PIL ImageEnhance (same pixel math as torchvision's PIL
backend); hue shifts the HSV hue channel.
"""

from __future__ import annotations

import random

import torch
from PIL import Image, ImageEnhance

from . import functional as F

__all__ = ["Compose", "Resize", "ToTensor", "Normalize", "ColorJitter",
           "functional"]


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img):
        for t in self.transforms:
            img = t(img)
        return img


class Resize:
    def __init__(self, size, interpolation=None, **kwargs):
        self.size = size

    def __call__(self, img):
        return F.resize(img, self.size)


class ToTensor:
    def __call__(self, pic):
        return F.to_tensor(pic)


class Normalize:
    def __init__(self, mean, std, inplace: bool = False):
        self.mean = mean
        self.std = std
        self.inplace = inplace

    def __call__(self, tensor: torch.Tensor) -> torch.Tensor:
        return F.normalize(tensor, self.mean, self.std, self.inplace)


def _uniform_range(value, name: str, center: float = 1.0):
    if value is None or value == 0:
        return None
    if isinstance(value, (tuple, list)):
        lo, hi = float(value[0]), float(value[1])
    elif name == "hue":
        lo, hi = -float(value), float(value)
    else:
        lo, hi = max(0.0, center - float(value)), center + float(value)
    return (lo, hi)


class ColorJitter:
    def __init__(self, brightness=0, contrast=0, saturation=0, hue=0):
        self.brightness = _uniform_range(brightness, "brightness")
        self.contrast = _uniform_range(contrast, "contrast")
        self.saturation = _uniform_range(saturation, "saturation")
        self.hue = _uniform_range(hue, "hue")

    @staticmethod
    def _sample(rng_range):
        return random.uniform(*rng_range)

    def __call__(self, img: Image.Image) -> Image.Image:
        ops = []
        if self.brightness:
            f = self._sample(self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast:
            f = self._sample(self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation:
            f = self._sample(self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue:
            f = self._sample(self.hue)
            ops.append(lambda im, f=f: _shift_hue(im, f))
        random.shuffle(ops)
        for op in ops:
            img = op(img)
        return img


def _shift_hue(img: Image.Image, delta: float) -> Image.Image:
    """delta in [-0.5, 0.5] turns of the hue wheel."""
    hsv = img.convert("HSV")
    h, s, v = hsv.split()
    shift = int(round(delta * 255.0))
    h = h.point(lambda x: (x + shift) % 256)
    return Image.merge("HSV", (h, s, v)).convert(img.mode)
