"""On-device training-target encoding (Gaussian splatting).

The reference renders dense Gaussian targets per sample in Python on CPU
dataloader workers (`/root/reference/src/sdnet/data/transforms.py:121-208`),
which is its #1 input-pipeline cost. Here the encoder is a batched jitted
device op fused directly into the train step: the host only ships tiny
padded keypoint arrays (see `data.pipeline.flatten_annotation`), and the
TPU renders all heatmaps with one broadcasted VPU expression.

Numerics match the reference exactly:
- grid = input size / down_ratio (`transforms.py:138`),
- sigma = sigma_gauss * min(out_w, out_h) / 3 (`transforms.py:142`),
- Gaussian centered at the *truncated* integer coords, unnormalized
  exp(-(dx^2+dy^2)/(2 sigma^2)), max-merged per class channel
  (`transforms.py:160-161`, utils.py:418-419),
- flat index = int(y) * out_w + int(x) (`transforms.py:163`),
- sub-pixel offset = (x - int(x), y - int(y)) (`transforms.py:165-166`),
- embedding target = anchor - part displacement in output-grid units,
  using the float (un-truncated) coordinates (`transforms.py:181-182`).

The reference's global `max_parts` budget truncating objects mid-iteration
(`transforms.py:186-191`) is reproduced on the host side during
flattening, so object/part selection is bit-identical.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .tensor import gaussian_heatmap_max


class EncodedTargets(NamedTuple):
    anchor_hm: jax.Array  # (B, H, W, M)
    part_hm: jax.Array  # (B, H, W, N)
    anchor_inds: jax.Array  # (B, O) int32, flat y*W+x
    part_inds: jax.Array  # (B, P) int32
    anchor_offsets: jax.Array  # (B, O, 2)
    part_offsets: jax.Array  # (B, P, 2)
    embeddings: jax.Array  # (B, P, 2)
    anchor_mask: jax.Array  # (B, O) bool
    part_mask: jax.Array  # (B, P) bool


def encode_targets(
    anchors_xy: jax.Array,  # (B, O, 2) float, grid coords (clipped, scaled)
    anchor_cls: jax.Array,  # (B, O) int32 label index
    anchor_mask: jax.Array,  # (B, O) bool
    parts_xy: jax.Array,  # (B, P, 2) float, grid coords
    part_kind: jax.Array,  # (B, P) int32 part-kind index
    part_owner_xy: jax.Array,  # (B, P, 2) float grid coords of owner anchor
    part_mask: jax.Array,  # (B, P) bool
    *,
    out_h: int,
    out_w: int,
    n_labels: int,
    n_parts: int,
    sigma_gauss: float,
    dtype=jnp.float32,
) -> EncodedTargets:
    """Render dense training targets for a batch. All shapes static."""
    b = anchors_xy.shape[0]
    sigma = sigma_gauss * min(out_w, out_h) / 3.0

    a_ix = jnp.floor(anchors_xy[..., 0])
    a_iy = jnp.floor(anchors_xy[..., 1])
    p_ix = jnp.floor(parts_xy[..., 0])
    p_iy = jnp.floor(parts_xy[..., 1])

    anchor_hm = gaussian_heatmap_max(
        jnp.zeros((b, out_h, out_w, n_labels), dtype),
        a_ix, a_iy, anchor_cls, anchor_mask, sigma, n_labels,
    )
    part_hm = gaussian_heatmap_max(
        jnp.zeros((b, out_h, out_w, n_parts), dtype),
        p_ix, p_iy, part_kind, part_mask, sigma, n_parts,
    )

    def _masked(x, mask):
        return jnp.where(mask[..., None] if x.ndim == 3 else mask, x, 0)

    anchor_inds = _masked((a_iy * out_w + a_ix).astype(jnp.int32), anchor_mask)
    part_inds = _masked((p_iy * out_w + p_ix).astype(jnp.int32), part_mask)

    anchor_offsets = _masked(
        jnp.stack((anchors_xy[..., 0] - a_ix, anchors_xy[..., 1] - a_iy), axis=-1).astype(dtype),
        anchor_mask,
    )
    part_offsets = _masked(
        jnp.stack((parts_xy[..., 0] - p_ix, parts_xy[..., 1] - p_iy), axis=-1).astype(dtype),
        part_mask,
    )
    embeddings = _masked((part_owner_xy - parts_xy).astype(dtype), part_mask)

    return EncodedTargets(
        anchor_hm=anchor_hm,
        part_hm=part_hm,
        anchor_inds=anchor_inds,
        part_inds=part_inds,
        anchor_offsets=anchor_offsets,
        part_offsets=part_offsets,
        embeddings=embeddings,
        anchor_mask=anchor_mask,
        part_mask=part_mask,
    )
