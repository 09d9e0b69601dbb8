"""On-device training augmentation (color jitter + flips + normalize).

The reference augments per-sample on CPU dataloader workers with PIL
(`/root/reference/src/sdnet/data/transforms.py:9-118`); with a single
host core that becomes the training bottleneck. Here the host only
decodes+resizes; everything random runs inside the jitted train step on
the VPU, keyed by the step PRNG:

- brightness/contrast/saturation with torchvision's blend semantics
  (factor ranges [max(0,1-s), 1+s]),
- hue rotation via exact RGB->HSV->RGB math (elementwise, VPU-friendly),
- horizontal/vertical flips applied consistently to the image tensor and
  the flattened keypoint arrays (grid-coordinate mirror),
- ImageNet normalization fused at the end.

Documented divergences from the reference (SURVEY.md §7): the four
jitter ops apply in a fixed order (torchvision randomizes the order),
and flip probability is a true probability (the reference's randn draw
flips ~69% at p=0.5).

Inputs are un-normalized [0, 1] RGB; factors are drawn per image.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

import numpy as np

# numpy (not jnp) so importing this module inside a trace can never
# create leaked tracers
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

# reference RandomColorJitter defaults (transforms.py:38)
BRIGHTNESS, CONTRAST, SATURATION, HUE = 0.25, 0.25, 0.15, 0.05


def _luma(images: jax.Array) -> jax.Array:
    """ITU-R 601 luma used by torchvision's grayscale."""
    return (
        0.299 * images[..., 0] + 0.587 * images[..., 1] + 0.114 * images[..., 2]
    )[..., None]


def _blend(a, b, factor):
    return a * factor + b * (1.0 - factor)


def rgb_to_hsv(rgb: jax.Array) -> jax.Array:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.max(rgb, axis=-1)
    minc = jnp.min(rgb, axis=-1)
    v = maxc
    delta = maxc - minc
    safe = jnp.where(delta == 0, 1.0, delta)
    s = jnp.where(maxc == 0, 0.0, delta / jnp.where(maxc == 0, 1.0, maxc))
    rc = (maxc - r) / safe
    gc = (maxc - g) / safe
    bc = (maxc - b) / safe
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(delta == 0, 0.0, h) / 6.0
    h = jnp.mod(h, 1.0)
    return jnp.stack((h, s, v), axis=-1)


def hsv_to_rgb(hsv: jax.Array) -> jax.Array:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack((r, g, b), axis=-1)


def color_jitter(
    images: jax.Array,
    key: jax.Array,
    brightness: float = BRIGHTNESS,
    contrast: float = CONTRAST,
    saturation: float = SATURATION,
    hue: float = HUE,
) -> jax.Array:
    """Per-image random color jitter on [0, 1] RGB (B, H, W, 3)."""
    b = images.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    # All math runs in the image dtype (bf16 under amp: images come from
    # uint8, whose 8-bit levels bf16 represents losslessly enough) —
    # factors are cast so f32 randoms can't re-promote the big tensors.
    def factors(k, s):
        return jax.random.uniform(
            k, (b, 1, 1, 1), minval=max(0.0, 1.0 - s), maxval=1.0 + s
        ).astype(images.dtype)

    if brightness > 0:
        images = jnp.clip(images * factors(kb, brightness), 0.0, 1.0)
    if contrast > 0:
        # the per-image mean accumulates in f32 (a bf16 sum over H*W
        # pixels drifts), then drops back to the image dtype
        mean = jnp.mean(
            _luma(images).astype(jnp.float32), axis=(1, 2, 3), keepdims=True
        ).astype(images.dtype)
        images = jnp.clip(_blend(images, mean, factors(kc, contrast)), 0.0, 1.0)
    if saturation > 0:
        images = jnp.clip(_blend(images, _luma(images), factors(ks, saturation)), 0.0, 1.0)
    if hue > 0:
        shift = jax.random.uniform(
            kh, (b, 1, 1), minval=-hue, maxval=hue
        ).astype(images.dtype)
        hsv = rgb_to_hsv(images)
        h = jnp.mod(hsv[..., 0] + shift, 1.0)
        images = jnp.clip(hsv_to_rgb(jnp.stack((h, hsv[..., 1], hsv[..., 2]), -1)), 0.0, 1.0)
    return images


def random_flips(
    images: jax.Array,
    kp: Dict[str, jax.Array],
    key: jax.Array,
    *,
    out_w: int,
    out_h: int,
    prob: float = 0.5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Per-image random horizontal+vertical flips of the image tensor
    and the flattened grid-space keypoint arrays.

    The reference mirrors x -> W_in - x - 1 in input space before grid
    scaling (utils.py:384-415); in grid coordinates that is
    x' = out_w - sx - x with sx = out_w / W_in (= 1/down_ratio scaling
    of the one-pixel offset).
    """
    b, h, w, _ = images.shape
    sx = out_w / w
    sy = out_h / h
    kx, ky = jax.random.split(key)
    do_h = jax.random.uniform(kx, (b,)) < prob
    do_v = jax.random.uniform(ky, (b,)) < prob

    images = jnp.where(do_h[:, None, None, None], images[:, :, ::-1, :], images)
    images = jnp.where(do_v[:, None, None, None], images[:, ::-1, :, :], images)

    def flip_x(xy, flags):
        x = jnp.where(flags[:, None], out_w - sx - xy[..., 0], xy[..., 0])
        return jnp.stack((x, xy[..., 1]), axis=-1)

    def flip_y(xy, flags):
        y = jnp.where(flags[:, None], out_h - sy - xy[..., 1], xy[..., 1])
        return jnp.stack((xy[..., 0], y), axis=-1)

    kp = dict(kp)
    for name in ("anchors_xy", "parts_xy", "part_owner_xy"):
        kp[name] = flip_y(flip_x(kp[name], do_h), do_v)
    return images, kp


def normalize_images(images: jax.Array) -> jax.Array:
    mean = jnp.asarray(IMAGENET_MEAN, images.dtype)
    std = jnp.asarray(IMAGENET_STD, images.dtype)
    return (images - mean) / std


def device_augment(
    images: jax.Array,
    kp: Dict[str, jax.Array],
    key: jax.Array,
    *,
    out_w: int,
    out_h: int,
    flip_prob: float = 0.5,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Full train-time augmentation: jitter -> flips -> normalize.

    images: (B, H, W, 3) float32 in [0, 1] (un-normalized);
    kp: flattened keypoint dict in grid coordinates.
    """
    k1, k2 = jax.random.split(key)
    images = color_jitter(images, k1)
    images, kp = random_flips(images, kp, k2, out_w=out_w, out_h=out_h, prob=flip_prob)
    return normalize_images(images), kp
