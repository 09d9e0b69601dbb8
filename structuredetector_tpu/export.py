"""Model export: AOT-serialized inference graph (replaces CoreML export).

The reference exports to CoreML with sigmoid+NMS fused into the graph and
decode params embedded as metadata
(`/root/reference/src/sdnet/cli/convert_coreml.py:12-29, :125-133`).
The TPU-native analog (SURVEY.md §3.5): a `jax.export` StableHLO
artifact of the jitted forward + fused sigmoid/plateau-NMS head, with
weights baked in as constants, packaged in a zip with the same metadata
JSON ({anchors, parts, scale_factor, width, height}). The artifact is
loadable without the model code and runs on any JAX backend.

Divergence (deliberate, SURVEY.md §7): `evaluate_export` consumes the
artifact with `ExportDecoder` (no second sigmoid+NMS) — the reference's
`evaluate_coreml` re-applies both by using the plain `Decoder`
(`cli/evaluate_coreml.py:125`), a documented inconsistency upstream.
"""

from __future__ import annotations

import json
import zipfile
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .ops.tensor import clamped_sigmoid, plateau_nms

METADATA_NAME = "params.json"
GRAPH_NAME = "model.stablehlo"


def make_export_fn(model, variables, n_labels: int, n_parts: int,
                   fold_normalization: bool = False):
    """Forward + fused sigmoid/NMS on the heatmap channels; regression
    channels pass through raw (reference RawDecoder,
    convert_coreml.py:12-29). Returns the (B, H/4, W/4, M+N+4) map.

    With `fold_normalization`, the graph consumes raw [0, 255] RGB
    (float32 or uint8) and performs the /255 + ImageNet mean/std
    normalization itself — the analog of the reference folding
    scale/bias into the CoreML input (convert_coreml.py:105-111)."""
    nb_hm = n_labels + n_parts

    def fn(image: jax.Array) -> jax.Array:
        if fold_normalization:
            from .data.augment import IMAGENET_MEAN, IMAGENET_STD

            image = (image.astype(jnp.float32) / 255.0
                     - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
        raw = model.apply(variables, image, train=False, raw_output=True)
        heatmaps = plateau_nms(clamped_sigmoid(raw[..., :nb_hm]))
        return jnp.concatenate((heatmaps, raw[..., nb_hm:]), axis=-1)

    return fn


def config_from_metadata(meta, **overrides):
    """Config reconstructed from an artifact's embedded metadata
    (the single consumer-side builder — `evaluate_export` and
    `ExportPredictor` both use it so they can't drift). `overrides`
    fills parameters the metadata doesn't carry (max_objects,
    thresholds, ...); an `anchor_name` override is a fallback only —
    the metadata's value wins."""
    from .config import Config

    fallback_anchor = overrides.pop("anchor_name", "anchor")
    config = Config(
        width=meta["width"], height=meta["height"],
        down_ratio=float(meta["scale_factor"]),
        anchor_name=meta.get("anchor_name", fallback_anchor),
        **overrides,
    ).set_labels(meta["anchors"], meta["parts"])
    config.validate()
    return config


def export_model(config, variables, path, batch_size: int = 1,
                 fold_normalization: bool = False,
                 dynamic_batch: bool = False,
                 uint8_input: bool = False,
                 platforms=("cpu", "tpu")) -> Path:
    """Serialize the inference graph + metadata into a `.sdz` zip.

    `dynamic_batch` exports with a symbolic batch dimension
    (`jax.export.symbolic_shape`) so one artifact serves any batch size;
    otherwise `batch_size` is baked in as a static shape.

    `uint8_input` (requires `fold_normalization`) bakes a uint8 RGB
    input signature: the artifact takes raw bytes and normalizes
    on-device — a 4x smaller feed than pre-normalized float32."""
    if uint8_input and not fold_normalization:
        raise ValueError("uint8_input requires fold_normalization (the graph "
                         "must own the /255 + mean/std normalization)")
    from jax import export as jexport

    from .models.network import build_model

    model = build_model(config)
    if getattr(config, "int8", False):
        # embed int8 weights (4x smaller artifact, no quantize ops in
        # the graph); Int8Conv detects the dtype and skips requantizing
        from .models.quantize import prequantize_variables

        variables = prequantize_variables(variables)
    fn = make_export_fn(model, variables, config.n_labels, config.n_parts,
                        fold_normalization=fold_normalization)
    if dynamic_batch:
        (b,) = jexport.symbolic_shape("b")
        lead = b
    else:
        lead = batch_size
    x_spec = jax.ShapeDtypeStruct(
        (lead, config.height, config.width, config.in_channels),
        jnp.uint8 if uint8_input else jnp.float32,
    )
    # multi-platform lowering: one artifact serves CPU and TPU (the
    # reference's CoreML export is Apple-only; ours is portable)
    exported = jexport.export(jax.jit(fn), platforms=list(platforms))(x_spec)
    graph = exported.serialize()

    metadata = {
        "anchors": list(config.labels.keys()),
        "parts": list(config.parts.keys()),
        "scale_factor": config.down_ratio,
        "width": config.width,
        "height": config.height,
        "anchor_name": config.anchor_name,
        "batch_size": batch_size,
        "dynamic_batch": dynamic_batch,
        "platforms": list(platforms),
        "normalized": fold_normalization,
        "input_dtype": "uint8" if uint8_input else "float32",
        "int8": bool(getattr(config, "int8", False)),
        "framework": "structuredetector-tpu",
        "version": "1",
    }

    path = Path(path)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_DEFLATED) as zf:
        zf.writestr(METADATA_NAME, json.dumps(metadata, indent=2))
        zf.writestr(GRAPH_NAME, graph)
    return path


def load_exported(path) -> Tuple[Any, Dict[str, Any]]:
    """Load a `.sdz` artifact -> (callable, metadata)."""
    from jax import export as jexport

    with zipfile.ZipFile(Path(path)) as zf:
        metadata = json.loads(zf.read(METADATA_NAME))
        exported = jexport.deserialize(zf.read(GRAPH_NAME))

    dtype = jnp.uint8 if metadata.get("input_dtype") == "uint8" else jnp.float32

    def call(image):
        return exported.call(jnp.asarray(image, dtype))

    return call, metadata
