"""Host-side image + annotation transforms.

Pipeline parity with the reference (`/root/reference/src/sdnet/data/transforms.py`):

- `TrainAugmentation` = Resize -> ColorJitter -> HFlip -> VFlip ->
  Normalize -> Flatten (`transforms.py:216-235`; `Encode` becomes the
  host-side `flatten_annotation` + on-device rendering),
- multi-scale training: `trigger_random_resize()` re-rolls the resize
  target each epoch over ratios {0.75 ... 1.25} snapped to x32
  (`transforms.py:212`, `:237-244`) — each ratio is a static shape
  bucket with its own cached XLA compilation,
- `ValidationAugmentation` = Resize -> Normalize -> Flatten
  (`transforms.py:253-267`),
- `PredictionTransformation` = Resize -> Normalize only
  (`transforms.py:270-286`).

Deliberate divergence (documented per SURVEY.md §7 "behavioral quirks"):
the reference draws its flip trigger from a *normal* distribution
(`torch.randn(1) < prob`, transforms.py:14,28), so prob=0.5 flips ~69% of
the time. Here the draw is uniform, so `prob` means probability. Pass
`legacy_flip=True` to reproduce the reference's behavior exactly.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
from PIL import Image, ImageEnhance

from ..annotations import ImageAnnotation, hflip_annotation, vflip_annotation
from .pipeline import flatten_annotation

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

MULTISCALE_RATIOS = (0.75, 0.8125, 0.875, 0.9375, 1, 1.0625, 1.125, 1.1875, 1.25)


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, *inputs):
        for t in self.transforms:
            inputs = t(*inputs)
        return inputs

    def __repr__(self):
        return f"Compose(transforms: {self.transforms})"


class Resize:
    """Resize image and annotation to (width, height)."""

    def __init__(self, size):
        if isinstance(size, int):
            self.width, self.height = size, size
        else:
            self.width, self.height = size

    def __call__(self, image: Image.Image, target: ImageAnnotation):
        resized = image.resize((self.width, self.height), Image.BILINEAR)
        annotation = target.resized(image.size, (self.width, self.height))
        return resized, annotation

    def __repr__(self):
        return f"Resize(width: {self.width}, height: {self.height})"


class RandomHorizontalFlip:
    def __init__(self, prob=0.5, rng: Optional[np.random.Generator] = None,
                 legacy_flip: bool = False):
        self.prob = prob
        self.rng = rng or np.random.default_rng()
        self.legacy_flip = legacy_flip

    def _trigger(self) -> bool:
        if self.legacy_flip:  # reference transforms.py:14
            # The reference compares a *normal* draw against prob, so
            # the effective flip rate is Phi(prob) (~69% at the default
            # 0.5) — that quirk is what legacy mode reproduces. But
            # prob is still a user-facing probability at the edges:
            # --flip_prob 0 must never flip (randn() < 0 would flip
            # half the time) and 1 must always flip (randn() < 1 is
            # only ~84%).
            if self.prob <= 0.0:
                return False
            if self.prob >= 1.0:
                return True
            return self.rng.standard_normal() < self.prob
        return self.rng.random() < self.prob

    def __call__(self, image: Image.Image, target: ImageAnnotation):
        if self._trigger():
            return (
                image.transpose(Image.FLIP_LEFT_RIGHT),
                hflip_annotation(target, image.size),
            )
        return image, target


class RandomVerticalFlip(RandomHorizontalFlip):
    def __call__(self, image: Image.Image, target: ImageAnnotation):
        if self._trigger():
            return (
                image.transpose(Image.FLIP_TOP_BOTTOM),
                vflip_annotation(target, image.size),
            )
        return image, target


class RandomResize:
    """Per-sample random resize over x32-safe ratios (the reference's
    unused alternate, transforms.py:71-92). NOTE: produces varying
    shapes per sample; prefer the epoch-level `trigger_random_resize`
    bucketing which keeps XLA shapes static within an epoch."""

    def __init__(self, config, ratios=None, rng: Optional[np.random.Generator] = None):
        # NOTE: the reference asserts `(ratio * 32) % 32 == 0`
        # (transforms.py:76-77) which is false for its own default ratios
        # — it's unused dead code upstream. Here sizes snap to x32.
        if ratios is None:
            ratios = [1 + 1 / 16 * r for r in range(-4, 5)]
        self.ratios = list(ratios)
        self.width = config.width
        self.height = config.height
        self.rng = rng or np.random.default_rng()

    def __call__(self, image: Image.Image, target: ImageAnnotation):
        ratio = self.ratios[int(self.rng.integers(len(self.ratios)))]
        width = max(32, int(ratio * self.width / 32) * 32)
        height = max(32, int(ratio * self.height / 32) * 32)
        resized = image.resize((width, height), Image.BILINEAR)
        annotation = target.resize(image.size, (width, height))
        return resized, annotation


class RandomColorJitter:
    """Brightness/contrast/saturation/hue jitter with torchvision-style
    factor ranges and random application order (transforms.py:37-47)."""

    def __init__(self, brightness=0.25, contrast=0.25, saturation=0.15, hue=0.05,
                 rng: Optional[np.random.Generator] = None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng or np.random.default_rng()

    def __call__(self, image: Image.Image, target: ImageAnnotation):
        rng = self.rng
        ops = []
        if self.brightness > 0:
            f = rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im, f=f: ImageEnhance.Brightness(im).enhance(f))
        if self.contrast > 0:
            f = rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im, f=f: ImageEnhance.Contrast(im).enhance(f))
        if self.saturation > 0:
            f = rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im, f=f: ImageEnhance.Color(im).enhance(f))
        if self.hue > 0:
            shift = rng.uniform(-self.hue, self.hue)
            ops.append(lambda im, s=shift: _hue_shift(im, s))
        rng.shuffle(ops)
        for op in ops:
            image = op(image)
        return image, target


def _hue_shift(image: Image.Image, shift: float) -> Image.Image:
    """Rotate hue by `shift` (fraction of the full hue circle)."""
    hsv = np.array(image.convert("HSV"), np.uint8)
    hsv[..., 0] = (hsv[..., 0].astype(np.int16) + int(shift * 255)) % 256
    return Image.fromarray(hsv, "HSV").convert("RGB")


class Normalize:
    """PIL -> float32 HWC in [0,1], ImageNet mean/std normalized
    (transforms.py:109-118). NHWC for TPU."""

    def __init__(self, mean=IMAGENET_MEAN, std=IMAGENET_STD):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, image, target=None):
        arr = np.asarray(image, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        arr = (arr - self.mean) / self.std
        if target is None:
            return arr
        return arr, target


class Raw01:
    """PIL -> float32 HWC in [0, 1], no normalization — feed for
    on-device augmentation (ops.device_augment)."""

    def __call__(self, image, target=None):
        arr = np.asarray(image, np.float32) / 255.0
        if arr.ndim == 2:
            arr = arr[..., None]
        if target is None:
            return arr
        return arr, target


class RawU8:
    """PIL -> uint8 HWC, untouched pixels — the compact feed for
    on-device augmentation: /255 happens inside the jitted step, so the
    host->device transfer is 4x smaller than Raw01's float32 (and
    bit-identical to it after the bf16 compute cast)."""

    def __call__(self, image, target=None):
        arr = np.asarray(image, np.uint8)
        if arr.ndim == 2:
            arr = arr[..., None]
        if target is None:
            return arr
        return arr, target


class Flatten:
    """Terminal transform: annotation -> padded keypoint arrays
    (device-side rendering replaces the reference `Encode`)."""

    def __init__(self, config):
        self.config = config

    def __call__(self, image: np.ndarray, target: ImageAnnotation):
        in_h, in_w = image.shape[:2]
        out_w = int(in_w / self.config.down_ratio)
        out_h = int(in_h / self.config.down_ratio)
        kp = flatten_annotation(
            target,
            labels=self.config.labels,
            parts=self.config.parts,
            max_objects=self.config.max_objects,
            max_parts=self.config.max_parts,
            in_size=(in_w, in_h),
            out_size=(out_w, out_h),
        )
        return {"image": image, "keypoints": kp, "annotation": target}


def _native_load_and_flatten(
    config, paths, targets, size, normalize: bool, n_threads: int,
    exact: bool = True, u8: bool = False,
):
    """Whole-batch native path: one C++ call decodes/resizes/normalizes
    every image on its own thread pool into a contiguous NHWC buffer,
    then annotations are resized and flattened exactly like the PIL
    path. Returns a collated batch dict. u8=True yields the raw uint8
    feed (normalize must be False; /255 runs on device)."""
    from . import native
    from .pipeline import FlatKeypoints

    w, h = size
    images, orig, ok = native.load_batch(
        paths, w, h, n_threads=n_threads, normalize=normalize, exact=exact,
        dtype=np.uint8 if u8 else np.float32,
    )
    if not ok.all():
        bad = [str(p) for p, good in zip(paths, ok) if not good]
        raise IOError(f"native decode failed for: {bad}")

    out_w, out_h = int(w / config.down_ratio), int(h / config.down_ratio)
    kps, annotations = [], []
    for target, (ow, oh) in zip(targets, orig):
        target.img_size = (int(ow), int(oh))
        annotation = target.resized(target.img_size, (w, h))
        kps.append(
            flatten_annotation(
                annotation,
                labels=config.labels,
                parts=config.parts,
                max_objects=config.max_objects,
                max_parts=config.max_parts,
                in_size=(w, h),
                out_size=(out_w, out_h),
            )
        )
        annotations.append(annotation)

    keypoints = FlatKeypoints(
        *(np.stack([getattr(k, f) for k in kps]) for f in FlatKeypoints._fields)
    )
    return {"image": images, "keypoints": keypoints, "annotation": annotations}


class TrainAugmentation:
    ratios = MULTISCALE_RATIOS  # transforms.py:212

    def __init__(self, config, rng: Optional[np.random.Generator] = None,
                 legacy_flip: bool = False):
        self.config = config
        self.rng = rng or np.random.default_rng(config.seed)
        self.device_augment = (
            getattr(config, "device_augment", False) and not config.no_augmentation
        )
        self.uint8_feed = False  # set True only in device-augment mode
        if config.no_augmentation:
            transforms = [
                Resize((config.width, config.height)),
                Normalize(),
                Flatten(config),
            ]
        elif self.device_augment:
            # host only resizes; jitter/flips/normalize run on-device
            # inside the train step (ops.device_augment). The default
            # feed is raw uint8 (/255 on device, 4x less H2D traffic);
            # --float_feed restores the float32 [0,1] feed.
            self.uint8_feed = getattr(config, "uint8_feed", True)
            transforms = [
                Resize((config.width, config.height)),
                RawU8() if self.uint8_feed else Raw01(),
                Flatten(config),
            ]
        else:
            fp = getattr(config, "flip_prob", 0.5)
            transforms = [
                Resize((config.width, config.height)),
                RandomColorJitter(rng=self.rng),
                RandomHorizontalFlip(prob=fp, rng=self.rng, legacy_flip=legacy_flip),
                RandomVerticalFlip(prob=fp, rng=self.rng, legacy_flip=legacy_flip),
                Normalize(),
                Flatten(config),
            ]
        self.transform = Compose(transforms)

    @property
    def current_size(self) -> Tuple[int, int]:
        r = self.transform.transforms[0]
        return (r.width, r.height)

    def native_apply(self, image_path, target: ImageAnnotation):
        """Native fast path for training in device-augment mode: fused
        C++ decode+resize producing raw [0, 1] (jitter/flips/normalize
        run on-device)."""
        if not self.device_augment:
            raise AttributeError("native path only in device-augment mode")
        from . import native

        cfg = self.config
        w, h = self.current_size
        arr, orig_size = native.load_image(
            image_path, w, h, normalize=False,
            exact=not getattr(cfg, "native_io_fast", False),
            dtype=np.uint8 if self.uint8_feed else np.float32,
        )
        target.img_size = orig_size
        annotation = target.resized(orig_size, (w, h))
        return Flatten(cfg)(arr, annotation)

    def supports_native_batch(self) -> bool:
        """The whole-batch native loader covers the modes where the host
        does no per-pixel augmentation: no_augmentation (plain
        resize+normalize) and device_augment (raw [0,1] feed, jitter and
        flips run inside the train step). Host-side PIL augmentation
        keeps the per-sample path."""
        return self.config.no_augmentation or self.device_augment

    def native_batch_apply(self, paths, targets, n_threads: int = 4):
        assert self.supports_native_batch(), (
            "whole-batch native loading requires no_augmentation or "
            "device-augment mode"
        )
        return _native_load_and_flatten(
            self.config, paths, targets, self.current_size,
            normalize=not self.device_augment, n_threads=n_threads,
            exact=not getattr(self.config, "native_io_fast", False),
            u8=self.uint8_feed,
        )

    def trigger_random_resize(self, next_epoch: Optional[int] = None):
        """Re-roll the input resolution for the next epoch
        (transforms.py:237-244); sizes snap to multiples of 32.

        With `next_epoch` the roll is a pure function of
        (config.seed, next_epoch), so a resumed run reproduces the
        unbroken run's resolution schedule exactly (the trainer passes
        it; per-sample jitter/flip draws remain stateful and are not
        replayed). Without it, the legacy stateful draw is used."""
        if self.config.no_augmentation:
            return
        rng = (
            np.random.default_rng((self.config.seed, 0x5C41E, next_epoch))
            if next_epoch is not None
            else self.rng
        )
        ratio = self.ratios[int(rng.integers(len(self.ratios)))]
        width = max(32, int(ratio * self.config.width / 32) * 32)
        height = max(32, int(ratio * self.config.height / 32) * 32)
        self.transform.transforms[0] = Resize((width, height))

    def __call__(self, image, target):
        return self.transform(image, target)


class ValidationAugmentation:
    def __init__(self, config):
        self.config = config
        self.transform = Compose(
            [Resize((config.width, config.height)), Normalize(), Flatten(config)]
        )

    def __call__(self, image, target):
        return self.transform(image, target)

    def native_apply(self, image_path, target: ImageAnnotation):
        """Native fast path: fused C++ decode+resize+normalize, then the
        same annotation resize + flatten as the PIL path."""
        from . import native

        cfg = self.config
        arr, orig_size = native.load_image(image_path, cfg.width, cfg.height)
        target.img_size = orig_size
        annotation = target.resized(orig_size, (cfg.width, cfg.height))
        return Flatten(cfg)(arr, annotation)

    def supports_native_batch(self) -> bool:
        return True

    def native_batch_apply(self, paths, targets, n_threads: int = 4):
        cfg = self.config
        return _native_load_and_flatten(
            cfg, paths, targets, (cfg.width, cfg.height),
            normalize=True, n_threads=n_threads,
        )


class RawImage:
    """PIL -> float32 HWC in [0, 255], no normalization — for exported
    graphs with folded normalization (reference CoreMLTransforms,
    transforms.py:289-304)."""

    def __call__(self, image, target=None):
        arr = np.asarray(image, np.float32)
        if arr.ndim == 2:
            arr = arr[..., None]
        if target is None:
            return arr
        return arr, target


class ExportTransforms:
    """Resize -> raw image -> Flatten, for evaluating exported models
    whose graph performs its own normalization (CoreMLTransforms
    analog, transforms.py:289-304)."""

    def __init__(self, config):
        self.transform = Compose(
            [Resize((config.width, config.height)), RawImage(), Flatten(config)]
        )

    def __call__(self, image, target):
        return self.transform(image, target)


class PredictionTransformation:
    """Image-only path for `detect` (transforms.py:270-286).

    With `device_normalize`, the host only resizes and emits uint8 HWC;
    the /255 + ImageNet normalization then runs inside the jitted
    forward (`make_forward(from_uint8=True)`) — 4x less host->device
    traffic per image.
    """

    def __init__(self, config, device_normalize: bool = False):
        self.resize = Resize((config.width, config.height))
        self.device_normalize = device_normalize
        self.normalize = Normalize()

    def __call__(self, image: Image.Image) -> np.ndarray:
        resized = image.resize((self.resize.width, self.resize.height), Image.BILINEAR)
        if self.device_normalize:
            arr = np.asarray(resized, np.uint8)
            if arr.ndim == 2:
                arr = arr[..., None]
            return arr
        return self.normalize(resized)
