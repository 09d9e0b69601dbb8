"""High-level single-image/batch Predictor.

API-parity component for the reference `Predictor`
(`/root/reference/src/sdnet/model/predictor.py:8-33`) — which is broken
upstream (its forward has no return statement and misuses torchvision
transforms; SURVEY.md #10). This one works: load model -> transform ->
jitted forward -> decode -> `ImageAnnotation` in original image
coordinates.
"""

from __future__ import annotations

import math
from pathlib import Path
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from typing import NamedTuple

from .annotations import ImageAnnotation, Object
from .data.augment import PredictionTransformation
from .data.decoders import Decoder
from .models.network import init_model, resolve_variables
from .train.steps import make_forward


class PreparedImage(NamedTuple):
    """An already-decoded-and-resized network input (e.g. from the
    native in-memory decoder, `data.native.decode_bytes`): skips the
    per-image PIL transform inside `predict_batch`. `array` must be
    (net_h, net_w, 3) in the predictor's feed dtype (uint8 with
    device_normalize, normalized float32 otherwise); `size` is the
    original (w, h) the annotation is rescaled to."""

    array: np.ndarray
    size: Tuple[int, int]


def tile_grid(
    img_w: int, img_h: int, tile_w: int, tile_h: int, overlap: float = 0.25
) -> List[Tuple[int, int]]:
    """Top-left corners of a sliding-window grid covering (img_w, img_h)
    with tiles of (tile_w, tile_h) and at least `overlap` fraction of
    shared border between neighbors. The last tile of each axis snaps
    flush to the image edge, so coverage is exact without padding."""
    if not 0.0 <= overlap < 1.0:
        raise ValueError(f"overlap must be in [0, 1), got {overlap}")

    def axis(size: int, tile: int) -> List[int]:
        if size <= tile:
            return [0]
        stride = max(1, int(tile * (1.0 - overlap)))
        xs = list(range(0, size - tile, stride))
        xs.append(size - tile)
        return xs

    return [(x, y) for y in axis(img_h, tile_h) for x in axis(img_w, tile_w)]


def merge_tiled_objects(objects: Sequence[Object], radius: float) -> List[Object]:
    """Cross-tile deduplication: greedy pass over objects sorted by
    anchor score (desc); an object is dropped if a kept object of the
    same label has its anchor within `radius` pixels, so the
    highest-scored detection of each physical object survives.

    Near-linear: kept anchors index into a `radius`-sized spatial grid,
    so each candidate only checks the 3x3 neighboring cells — an
    orthomosaic with tens of thousands of detections merges in host
    milliseconds instead of O(n^2) pair scans."""
    cell = max(radius, 1e-6)
    grid: dict = {}  # (cx, cy) -> list of kept Objects
    kept: List[Object] = []
    for obj in sorted(objects, key=lambda o: -(o.anchor.score or 0.0)):
        cx, cy = int(obj.anchor.x // cell), int(obj.anchor.y // cell)
        dup = any(
            k.name == obj.name
            and math.hypot(k.anchor.x - obj.anchor.x, k.anchor.y - obj.anchor.y)
            < radius
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for k in grid.get((cx + dx, cy + dy), ())
        )
        if not dup:
            kept.append(obj)
            grid.setdefault((cx, cy), []).append(obj)
    return kept


def _shift_object(obj: Object, dx: float, dy: float) -> Object:
    for kp in [obj.anchor, *obj.parts]:
        kp.x += dx
        kp.y += dy
    if obj.box is not None:
        obj.box.x_min += dx
        obj.box.x_max += dx
        obj.box.y_min += dy
        obj.box.y_max += dy
    return obj


def _make_fused_step(config, from_uint8: bool):
    """One jitted program for the whole serving device phase:
    (optional /255 + ImageNet normalize) -> channel-leading forward
    (`head_layout='cfirst'`: full-lane head writes, zero transposes
    into decode) -> fused Pallas sigmoid/NMS/top-k decode. conf/dist
    thresholds are traced scalars (threshold changes reuse the program)."""
    from .models.network import build_model
    from .ops.decode import decode_feature_maps_cfirst

    model_cf = build_model(config, head_layout="cfirst")
    max_objects, max_parts = config.max_objects, config.max_parts

    @jax.jit
    def fused_step(variables, images, conf_thresh, dist_thresh):
        if from_uint8:
            from .ops.device_augment import normalize_images

            images = normalize_images(images.astype(jnp.float32) / 255.0)
        outputs = model_cf.apply(variables, images, train=False)
        return decode_feature_maps_cfirst(
            outputs,
            max_objects=max_objects,
            max_parts=max_parts,
            conf_thresh=conf_thresh,
            dist_thresh=dist_thresh,
        )

    return fused_step


class Predictor:
    def __init__(
        self,
        config,
        model_path: Optional[Path] = None,
        device_normalize: bool = True,
        fast_path: Optional[bool] = None,
    ):
        """`device_normalize` (default): the host only resizes; uint8
        pixels ship to the device and the /255 + ImageNet normalization
        runs inside the jitted forward — 4x less host->device traffic.
        Set False to normalize on the host in float32 (byte-identical
        feed to the `evaluate` CLI path).

        `fast_path` (default: auto, on iff the backend is a TPU): run
        the channel-leading serving graph — `head_layout='cfirst'` head
        + `decode_feature_maps_cfirst` fused Pallas sigmoid/NMS/top-k —
        instead of the NHWC forward + `Decoder` device phase. Same
        weights, same detections (pinned in tests/test_decode.py and
        tests/test_predictor_fast.py); measured faster on v5e. Off-TPU
        the Pallas kernel falls back to interpreter mode, which is
        correct but slow — hence the auto default."""
        self.config = config
        self.model, variables = init_model(config)
        path = model_path or config.pretrained_model
        if path:
            variables = resolve_variables(path, variables)
        # Commit the weights to the device ONCE: jit does not cache host
        # numpy arguments, so leaving these as the loader's numpy arrays
        # re-uploads all ~200 leaves on every predict_batch call — ~1.4 s
        # per batch over a high-latency device link (measured round 4,
        # DESIGN.md "Serving").
        self.variables = jax.device_put(variables)
        self.transform = PredictionTransformation(
            config, device_normalize=device_normalize
        )
        self.decoder = Decoder(config)
        self._forward = make_forward(self.model, from_uint8=device_normalize)
        if fast_path is None:
            fast_path = jax.default_backend() == "tpu"
        self.fast_path = bool(fast_path)
        self._fused_step = (
            _make_fused_step(config, from_uint8=device_normalize)
            if self.fast_path else None
        )

    def _device_decode(self, batch: jax.Array):
        """Forward + fixed-shape device decode -> (decode dict, out_hw).
        One compiled program on the fast path; forward + jitted decode
        otherwise. Thresholds are traced scalars either way (no
        recompile per threshold)."""
        cfg = self.config
        if self._fused_step is not None:
            dec = self._fused_step(
                self.variables, batch,
                jnp.float32(cfg.conf_threshold),
                jnp.float32(cfg.decoder_dist_thresh),
            )
            r = int(cfg.down_ratio)
            return dec, (batch.shape[1] // r, batch.shape[2] // r)
        outputs = self._forward(self.variables, batch)
        dec = self.decoder.decode_arrays(
            outputs, cfg.conf_threshold, cfg.decoder_dist_thresh
        )
        return dec, outputs["anchor_hm"].shape[1:3]

    @property
    def feed_uint8(self) -> bool:
        """True when the network input signature is raw uint8 RGB
        (normalization runs on-device inside the jitted forward)."""
        return bool(self.transform.device_normalize)

    @property
    def feed_normalize(self) -> bool:
        """True when the host must apply ImageNet normalization before
        feeding (i.e. the graph does NOT own /255 + mean/std)."""
        return not self.feed_uint8

    def predict_image(self, image: Union[Image.Image, str, Path]) -> ImageAnnotation:
        """One image -> annotation in original pixel coordinates."""
        return self.predict_batch([image])[0]

    def predict_batch(
        self, images: Sequence[Union[Image.Image, str, Path]]
    ) -> List[ImageAnnotation]:
        return self.predict_batch_collect(self.predict_batch_submit(images))

    def predict_batch_submit(self, images: Sequence) -> Optional[tuple]:
        """Device half of `predict_batch`: prep + transfer + forward +
        fixed-shape device decode, all dispatched WITHOUT fetching
        results. Returns an opaque handle for `predict_batch_collect`.

        The split exists for pipelined serving (serve.MicroBatcher):
        batch N+1's host prep and transfer overlap batch N's device
        compute and result fetch, so serving throughput is set by
        max(host phase, device phase) instead of their sum."""
        if not images:
            return None
        pils, arrays = [], []
        for im in images:
            if isinstance(im, PreparedImage):
                pils.append(im)
                arrays.append(im.array)
                continue
            if not isinstance(im, Image.Image):
                im = Image.open(im)
            if im.mode != "RGB":
                im = im.convert("RGB")
            pils.append(im)
            arrays.append(self.transform(im))

        batch = jnp.asarray(np.stack(arrays))
        dec, out_hw = self._device_decode(batch)
        return dec, out_hw, pils

    def predict_batch_collect(self, handle) -> List[ImageAnnotation]:
        """Host half of `predict_batch`: fetch the decode arrays of a
        `predict_batch_submit` handle and build the annotations."""
        if handle is None:
            return []
        dec, out_hw, pils = handle
        annotations, _, _ = self.decoder.fetch_and_materialize(
            dec, out_hw, self.config.conf_threshold
        )

        for ann, im in zip(annotations, pils):
            ann.resize((self.config.width, self.config.height), im.size)
            ann.img_size = im.size
            if hasattr(im, "filename") and im.filename:
                ann.image_path = Path(im.filename)
        return annotations

    def predict_tiled(
        self,
        image: Union[Image.Image, str, Path],
        overlap: float = 0.25,
        batch_size: int = 8,
        dedup_radius: Optional[float] = None,
    ) -> ImageAnnotation:
        """Sliding-window detection for images larger than the network
        input (orthomosaic-scale field imagery): crop network-sized
        tiles on a `tile_grid`, run them through the same compiled
        forward+decode as `predict_batch` (tiles need no resize, so
        full detail is preserved), shift detections into global pixel
        coordinates, and greedily merge cross-tile duplicates
        (`merge_tiled_objects` — higher anchor score wins within
        `dedup_radius`). The default radius, `dist_threshold *
        min(tile size)`, is the scale at which one physical object
        shows up twice across overlapping tiles; it deliberately does
        NOT track the evaluator's image-size-relative radius, which
        would merge distinct neighboring objects on orthomosaic-scale
        inputs.

        Tile batches are padded to a fixed `batch_size`, so exactly one
        compiled graph serves any image size."""
        if not isinstance(image, Image.Image):
            image = Image.open(image)
        if image.mode != "RGB":
            image = image.convert("RGB")

        tw, th = self.config.width, self.config.height
        corners = tile_grid(image.width, image.height, tw, th, overlap)
        tiles = [image.crop((x, y, x + tw, y + th)) for x, y in corners]

        objects: List[Object] = []
        for start in range(0, len(tiles), batch_size):
            chunk = tiles[start : start + batch_size]
            n = len(chunk)
            # pad to the static batch shape (one compiled graph)
            chunk = chunk + [chunk[-1]] * (batch_size - n)
            batch = jnp.asarray(np.stack([self.transform(t) for t in chunk]))
            dec, out_hw = self._device_decode(batch)
            anns, _, _ = self.decoder.fetch_and_materialize(
                dec, out_hw, self.config.conf_threshold
            )
            for ann, (x, y) in zip(anns[:n], corners[start : start + n]):
                objects.extend(_shift_object(o, x, y) for o in ann.objects)

        # an image smaller than the tile on an axis gets black crop
        # padding; anchors detected in the padding can't be real objects.
        # Only filter on axes where padding exists (image < tile) — on a
        # full-sized axis a regressed anchor can land fractionally outside
        # a true border (e.g. x = -0.3) and is a real object the non-tiled
        # path would keep; clamp it into bounds instead of dropping it.
        pad_x, pad_y = image.width < tw, image.height < th
        kept_objects: List[Object] = []
        for o in objects:
            if pad_x and not 0 <= o.anchor.x < image.width:
                continue
            if pad_y and not 0 <= o.anchor.y < image.height:
                continue
            o.anchor.x = min(max(o.anchor.x, 0.0), image.width - 1)
            o.anchor.y = min(max(o.anchor.y, 0.0), image.height - 1)
            kept_objects.append(o)
        objects = kept_objects

        radius = (
            dedup_radius
            if dedup_radius is not None
            else self.config.dist_threshold * min(tw, th)
        )
        kept = merge_tiled_objects(objects, radius)
        path = getattr(image, "filename", "") or "tiled"
        return ImageAnnotation(path, objects=kept, img_size=image.size)


class ExportPredictor:
    """`Predictor` surface backed by a serialized `.sdz` artifact
    (`export.load_exported`) — the deployment unit: no model code or
    checkpoint needed, decode parameters come from the embedded
    metadata. Plugs into `serve`'s MicroBatcher like `Predictor`.

    Static-batch artifacts are padded/chunked internally to their baked
    batch size; dynamic-batch artifacts take any batch."""

    def __init__(self, artifact: Union[str, Path], **config_overrides):
        """`config_overrides` adjusts decode parameters the metadata
        doesn't carry (max_objects, conf_threshold, ... — the artifact
        embeds the labels/size/stride, like the reference's CoreML
        metadata, cli/convert_coreml.py:125-133)."""
        from .data.decoders import ExportDecoder
        from .export import config_from_metadata, load_exported

        self._call, meta = load_exported(Path(artifact).expanduser().resolve())
        self.config = config = config_from_metadata(meta, **config_overrides)
        self.meta = meta
        self.decoder = ExportDecoder(config)
        self.batch_size = (
            None if meta.get("dynamic_batch") else int(meta.get("batch_size", 1))
        )
        self._uint8 = meta.get("input_dtype") == "uint8"
        self._normalized = bool(meta.get("normalized"))
        if not self._normalized:
            from .data.augment import Normalize

            self._host_normalize = Normalize()

    @property
    def feed_uint8(self) -> bool:
        """True when the artifact's input signature is raw uint8 RGB."""
        return self._uint8

    @property
    def feed_normalize(self) -> bool:
        """True when the host must ImageNet-normalize the feed — i.e.
        the artifact was exported without --norm/--uint8_input, so the
        graph expects pre-normalized float32."""
        return not self._uint8 and not self._normalized

    def _transform(self, image: Image.Image) -> np.ndarray:
        resized = image.resize(
            (self.config.width, self.config.height), Image.BILINEAR
        )
        if self._uint8:
            return np.asarray(resized, np.uint8)
        if self._normalized:
            # the graph owns /255 + mean/std; feed raw [0, 255] floats
            return np.asarray(resized, np.float32)
        return self._host_normalize(resized)

    def predict_image(self, image: Union[Image.Image, str, Path]) -> ImageAnnotation:
        return self.predict_batch([image])[0]

    def predict_batch(
        self, images: Sequence[Union[Image.Image, str, Path]]
    ) -> List[ImageAnnotation]:
        return self.predict_batch_collect(self.predict_batch_submit(images))

    def predict_batch_submit(self, images: Sequence) -> Optional[tuple]:
        """Device half (see `Predictor.predict_batch_submit`): dispatch
        every static-batch chunk without fetching results."""
        from .ops.decode import split_head_output

        if not images:
            return None
        pils, arrs = [], []
        for im in images:
            if isinstance(im, PreparedImage):
                pils.append(im)
                arrs.append(im.array)
                continue
            if not isinstance(im, Image.Image):
                im = Image.open(im)
            if im.mode != "RGB":
                im = im.convert("RGB")
            pils.append(im)
            arrs.append(self._transform(im))

        cfg = self.config
        step = self.batch_size or len(arrs)
        chunks = []
        for start in range(0, len(arrs), step):
            chunk = arrs[start : start + step]
            n = len(chunk)
            chunk = chunk + [chunk[-1]] * (step - n)  # pad static batches
            raw = self._call(jnp.asarray(np.stack(chunk)))
            outputs = split_head_output(raw, cfg.n_labels, cfg.n_parts)
            dec = self.decoder.decode_arrays(
                outputs, cfg.conf_threshold, cfg.decoder_dist_thresh
            )
            chunks.append((dec, outputs["anchor_hm"].shape[1:3], n))
        return chunks, pils

    def predict_batch_collect(self, handle) -> List[ImageAnnotation]:
        """Host half: fetch each chunk's decode arrays and assemble."""
        if handle is None:
            return []
        chunks, pils = handle
        annotations: List[ImageAnnotation] = []
        for dec, out_hw, n in chunks:
            anns, _, _ = self.decoder.fetch_and_materialize(
                dec, out_hw, self.config.conf_threshold
            )
            annotations.extend(anns[:n])

        for ann, im in zip(annotations, pils):
            ann.resize((self.config.width, self.config.height), im.size)
            ann.img_size = im.size
            if hasattr(im, "filename") and im.filename:
                ann.image_path = Path(im.filename)
        return annotations
