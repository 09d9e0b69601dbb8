"""Device-side decode: heatmaps -> fixed-shape detection arrays.

The spec is the reference `Decoder.__call__` device phase
(`/root/reference/src/sdnet/data/decoders.py:29-100`):

  clamped sigmoid -> 5x5 plateau NMS -> two-stage top-k (K anchors /
  P parts) -> gather sub-pixel offsets and embeddings -> brute-force
  (B, K, P) part-origin <-> anchor distance matrix -> per-part argmin.

The reference then crosses to the host with a Python `.item()` loop; here
the device program returns *fixed-shape* arrays (anchors (B,K,4), parts
(B,P,6), parent index (B,P), validity (B,P)) and a single host transfer
materializes annotations (`data.decoders.Decoder`). Masking constants
(+-1e6 pushes for sub-threshold entries) are preserved bit-for-bit
(`decoders.py:78-100`).

Everything is jittable with static shapes; the sigmoid+NMS front can be
served by the fused Pallas kernel (`ops.pallas.fused_sigmoid_nms`).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from .tensor import (
    clamped_sigmoid,
    gather_features,
    plateau_nms,
    topk_per_class,
)


def split_head_output(raw: jax.Array, n_labels: int, n_parts: int) -> Dict[str, jax.Array]:
    """Split the raw (B, H, W, M+N+4) head output into named maps
    (reference network.py:77-84)."""
    nb_hm = n_labels + n_parts
    return {
        "anchor_hm": raw[..., :n_labels],
        "part_hm": raw[..., n_labels:nb_hm],
        "offsets": raw[..., nb_hm : nb_hm + 2],
        "embeddings": raw[..., nb_hm + 2 : nb_hm + 4],
    }


def decode_feature_maps(
    outputs: Dict[str, jax.Array],
    *,
    max_objects: int,
    max_parts: int,
    conf_thresh: float,
    dist_thresh: float,
    apply_sigmoid_nms: bool = True,
    nms_fn=None,
    with_metadata: bool = True,
) -> Dict[str, jax.Array]:
    """Decode head output maps into fixed-shape detection arrays.

    outputs: dict of NHWC maps ('anchor_hm' (B,H,W,M) logits, 'part_hm'
    (B,H,W,N) logits, 'offsets' (B,H,W,2), 'embeddings' (B,H,W,2)).
    `apply_sigmoid_nms=False` is the exported-model path where
    sigmoid+NMS are already fused in the graph (reference CoreMLDecoder,
    decoders.py:182-226). `nms_fn` overrides the sigmoid+NMS front (e.g.
    the Pallas fused kernel).

    Returns a dict of arrays:
      anchors (B, K, 4): x, y, score, label   (grid coords)
      parts   (B, P, 6): x, y, score, label, origin_x, origin_y
      part_parent (B, P) int32: argmin anchor index per part
      part_valid  (B, P) bool: part linked to its parent
      anchor_hm_sig / part_hm_sig: sigmoided heatmaps (for metadata).
    """
    k, p = max_objects, max_parts
    out_h, out_w = outputs["anchor_hm"].shape[1:3]
    offsets_map = outputs["offsets"].astype(jnp.float32)
    embeddings_map = outputs["embeddings"].astype(jnp.float32)

    if apply_sigmoid_nms:
        front = nms_fn if nms_fn is not None else lambda x: plateau_nms(clamped_sigmoid(x))
        anchor_hm = front(outputs["anchor_hm"].astype(jnp.float32))
        part_hm = front(outputs["part_hm"].astype(jnp.float32))
        if with_metadata:
            anchor_hm_sig = clamped_sigmoid(outputs["anchor_hm"].astype(jnp.float32))
            part_hm_sig = clamped_sigmoid(outputs["part_hm"].astype(jnp.float32))
    else:
        anchor_hm = outputs["anchor_hm"].astype(jnp.float32)
        part_hm = outputs["part_hm"].astype(jnp.float32)
        if with_metadata:
            anchor_hm_sig, part_hm_sig = anchor_hm, part_hm

    # Anchors (decoders.py:44-57) + parts (decoders.py:60-75). Two
    # separate extractions: fusing them into one max(K, P)-round scan
    # over the concatenated channel axis was tried in round 3 and
    # MEASURED SLOWER at every batch size (the parts scan drags the
    # anchor channels through P-K extra masking rounds: batch-1 decode
    # 0.52 -> 0.56 ms, batch-128 50 -> 65 us/img on v5e), so it was
    # reverted. See DESIGN.md "Why the Pallas surface...".
    anchor_scores, anchor_inds, anchor_labels, anchor_ys, anchor_xs = (
        topk_per_class(anchor_hm, k)
    )
    part_scores, part_inds, part_labels, part_ys, part_xs = (
        topk_per_class(part_hm, p)
    )

    anchor_offs = gather_features(offsets_map, anchor_inds)
    anchor_xs = anchor_xs + anchor_offs[..., 0]
    anchor_ys = anchor_ys + anchor_offs[..., 1]
    anchors = jnp.stack((anchor_xs, anchor_ys, anchor_scores, anchor_labels), axis=2)

    part_offs = gather_features(offsets_map, part_inds)
    part_xs = part_xs + part_offs[..., 0]
    part_ys = part_ys + part_offs[..., 1]
    embeddings = gather_features(embeddings_map, part_inds)  # (B, P, 2)
    origin_xs = part_xs + embeddings[..., 0]
    origin_ys = part_ys + embeddings[..., 1]
    parts = jnp.stack(
        (part_xs, part_ys, part_scores, part_labels, origin_xs, origin_ys), axis=2
    )

    # Association with the reference's exact masking trick
    # (decoders.py:78-100): sub-threshold parts' origins are pushed to
    # -1e6 and sub-threshold anchors to +1e6 so they can never link.
    part_on = (part_scores > conf_thresh).astype(jnp.float32)
    ori_xs = -1e6 * (1.0 - part_on) + part_on * origin_xs
    ori_ys = -1e6 * (1.0 - part_on) + part_on * origin_ys

    anchor_on = (anchor_scores > conf_thresh).astype(jnp.float32)
    pos_xs = 1e6 * (1.0 - anchor_on) + anchor_on * anchor_xs
    pos_ys = 1e6 * (1.0 - anchor_on) + anchor_on * anchor_ys

    anchor_pos = jnp.stack((pos_xs, pos_ys), axis=-1)[:, :, None, :]  # (B, K, 1, 2)
    origins = jnp.stack((ori_xs, ori_ys), axis=-1)[:, None, :, :]  # (B, 1, P, 2)
    delta = origins - anchor_pos  # (B, K, P, 2)
    distance = jnp.sqrt(jnp.sum(delta**2, axis=-1))  # (B, K, P)

    min_vals = jnp.min(distance, axis=1)  # (B, P)
    part_parent = jnp.argmin(distance, axis=1).astype(jnp.int32)  # (B, P)
    part_valid = min_vals < (dist_thresh * min(out_w, out_h))

    out = {
        "anchors": anchors,
        "parts": parts,
        "part_parent": part_parent,
        "part_valid": part_valid,
    }
    if with_metadata:
        out.update(
            anchor_hm_sig=anchor_hm_sig,
            part_hm_sig=part_hm_sig,
            embeddings=embeddings,
            anchor_inds=anchor_inds,
            part_inds=part_inds,
        )
    return out
