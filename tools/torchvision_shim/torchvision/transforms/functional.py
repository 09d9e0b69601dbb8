"""`torchvision.transforms.functional` surface used by the reference
(`/root/reference/src/sdnet/data/transforms.py:3`, `model/trainer.py:6`,
`utils/visualization.py:2`): resize, hflip, vflip, to_tensor,
to_pil_image. PIL-backed; tensor-input geometry is intentionally
unsupported (the reference only ever passes PIL images to these —
flips and resize run before `Normalize`'s to_tensor in every pipeline,
transforms.py:211-304)."""

from __future__ import annotations

import numpy as np
import torch
from PIL import Image


def _require_pil(img, op: str) -> None:
    if not isinstance(img, Image.Image):
        raise TypeError(
            f"torchvision-shim {op}: only PIL.Image inputs are supported "
            f"(got {type(img).__name__})"
        )


def resize(img, size, interpolation=None, **kwargs):
    """`size` is (h, w) per torchvision convention; PIL wants (w, h).
    torchvision's PIL path uses bilinear by default."""
    _require_pil(img, "resize")
    if isinstance(size, int):
        # torchvision semantics: match the SMALLER edge, keep aspect.
        w, h = img.size
        if w <= h:
            out = (size, int(round(size * h / w)))
        else:
            out = (int(round(size * w / h)), size)
        return img.resize(out, Image.BILINEAR)
    h, w = size
    return img.resize((int(w), int(h)), Image.BILINEAR)


def hflip(img):
    _require_pil(img, "hflip")
    return img.transpose(Image.FLIP_LEFT_RIGHT)


def vflip(img):
    _require_pil(img, "vflip")
    return img.transpose(Image.FLIP_TOP_BOTTOM)


def to_tensor(pic) -> torch.Tensor:
    """PIL (or HWC uint8 numpy) -> float32 CHW in [0, 1]."""
    if isinstance(pic, Image.Image):
        arr = np.asarray(pic, dtype=np.uint8)
    elif isinstance(pic, np.ndarray):
        arr = pic
    else:
        raise TypeError(
            f"torchvision-shim to_tensor: unsupported input {type(pic).__name__}"
        )
    if arr.ndim == 2:
        arr = arr[:, :, None]
    t = torch.from_numpy(np.ascontiguousarray(arr))
    return t.permute(2, 0, 1).contiguous().to(torch.float32).div_(255.0)


def to_pil_image(pic) -> Image.Image:
    """float CHW in [0, 1] (or uint8 CHW) tensor -> PIL image."""
    if isinstance(pic, torch.Tensor):
        t = pic.detach().cpu()
        if t.dtype.is_floating_point:
            t = t.clamp(0.0, 1.0).mul(255.0).round().to(torch.uint8)
        arr = t.numpy()
    elif isinstance(pic, np.ndarray):
        arr = pic
        if arr.dtype != np.uint8:
            arr = (np.clip(arr, 0.0, 1.0) * 255.0).round().astype(np.uint8)
    else:
        raise TypeError(
            f"torchvision-shim to_pil_image: unsupported input {type(pic).__name__}"
        )
    if arr.ndim == 3 and arr.shape[0] in (1, 3, 4):
        arr = np.transpose(arr, (1, 2, 0))
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return Image.fromarray(arr)


def normalize(tensor: torch.Tensor, mean, std, inplace: bool = False):
    if not inplace:
        tensor = tensor.clone()
    mean = torch.as_tensor(mean, dtype=tensor.dtype).view(-1, 1, 1)
    std = torch.as_tensor(std, dtype=tensor.dtype).view(-1, 1, 1)
    return tensor.sub_(mean).div_(std)
