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
    _topk_stage2,
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


def _detections_tail(
    anchor_xs, anchor_ys, anchor_scores, anchor_labels,
    part_xs, part_ys, part_scores, part_labels, part_embs,
    conf_thresh, dist_thresh, out_w: int, out_h: int,
) -> Dict[str, jax.Array]:
    """Layout-independent decode tail: stack detection rows and run the
    part-origin <-> anchor association with the reference's exact
    masking trick (decoders.py:78-100): sub-threshold parts' origins
    are pushed to -1e6 and sub-threshold anchors to +1e6 so they can
    never link. All inputs are (B, K)/(B, P) stage-2 arrays; offsets
    are already folded into the coordinates."""
    anchors = jnp.stack((anchor_xs, anchor_ys, anchor_scores, anchor_labels), axis=2)
    origin_xs = part_xs + part_embs[..., 0]
    origin_ys = part_ys + part_embs[..., 1]
    parts = jnp.stack(
        (part_xs, part_ys, part_scores, part_labels, origin_xs, origin_ys), axis=2
    )

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

    return {
        "anchors": anchors,
        "parts": parts,
        "part_parent": part_parent,
        "part_valid": part_valid,
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

    part_offs = gather_features(offsets_map, part_inds)
    part_xs = part_xs + part_offs[..., 0]
    part_ys = part_ys + part_offs[..., 1]
    embeddings = gather_features(embeddings_map, part_inds)  # (B, P, 2)

    out = _detections_tail(
        anchor_xs, anchor_ys, anchor_scores, anchor_labels,
        part_xs, part_ys, part_scores, part_labels, embeddings,
        conf_thresh, dist_thresh, out_w, out_h,
    )
    if with_metadata:
        out.update(
            anchor_hm_sig=anchor_hm_sig,
            part_hm_sig=part_hm_sig,
            embeddings=embeddings,
            anchor_inds=anchor_inds,
            part_inds=part_inds,
        )
    return out


def decode_feature_maps_cfirst(
    outputs: Dict[str, jax.Array],
    *,
    max_objects: int,
    max_parts: int,
    conf_thresh: float,
    dist_thresh: float,
    interpret: bool = None,
) -> Dict[str, jax.Array]:
    """Channel-leading serving decode: same detections as
    `decode_feature_maps`, zero layout transposes.

    outputs: dict of channel-leading maps from a
    `head_layout='cfirst'` model ('anchor_hm' (M,B,H,W) logits,
    'part_hm' (N,B,H,W), 'offsets' (2,B,H,W), 'embeddings' (2,B,H,W)).
    The (C*B, H, W) plane view the fused Pallas sigmoid+NMS+top-k
    kernel wants (`ops.pallas.fused_sigmoid_nms_topk`) is a pure
    reshape here, and the per-pixel feature gathers read full-lane
    (B, H*W) planes. Returns the `decode_feature_maps` detection dict
    (metadata-free): anchors (B,K,4), parts (B,P,6), part_parent,
    part_valid — numerically identical to the NHWC path (pinned in
    tests/test_decode.py).
    """
    from .pallas.topk import fused_sigmoid_nms_topk

    k, p = max_objects, max_parts
    m, b, out_h, out_w = outputs["anchor_hm"].shape
    n = outputs["part_hm"].shape[0]
    offsets = outputs["offsets"].astype(jnp.float32).reshape(2, b, out_h * out_w)
    embeddings = outputs["embeddings"].astype(jnp.float32).reshape(2, b, out_h * out_w)

    def extract(hm, kk):
        c = hm.shape[0]
        planes = hm.astype(jnp.float32).reshape(c * b, out_h, out_w)
        vals, inds = fused_sigmoid_nms_topk(planes, kk, interpret=interpret)
        # plane order is class-major -> (C, B, kk); stage 2 wants (B, C, kk)
        vals = vals.reshape(c, b, kk).transpose(1, 0, 2)
        inds = inds.reshape(c, b, kk).transpose(1, 0, 2)
        return _topk_stage2(vals, inds, kk, out_w, jnp.float32)

    anchor_scores, anchor_inds, anchor_labels, anchor_ys, anchor_xs = extract(
        outputs["anchor_hm"], k
    )
    part_scores, part_inds, part_labels, part_ys, part_xs = extract(
        outputs["part_hm"], p
    )

    def gather2(maps, inds):
        # maps: (2, B, H*W); inds: (B, n) -> (B, n, 2)
        gx = jnp.take_along_axis(maps[0], inds.astype(jnp.int32), axis=1)
        gy = jnp.take_along_axis(maps[1], inds.astype(jnp.int32), axis=1)
        return jnp.stack((gx, gy), axis=-1)

    anchor_offs = gather2(offsets, anchor_inds)
    anchor_xs = anchor_xs + anchor_offs[..., 0]
    anchor_ys = anchor_ys + anchor_offs[..., 1]

    part_offs = gather2(offsets, part_inds)
    part_xs = part_xs + part_offs[..., 0]
    part_ys = part_ys + part_offs[..., 1]
    part_embs = gather2(embeddings, part_inds)

    return _detections_tail(
        anchor_xs, anchor_ys, anchor_scores, anchor_labels,
        part_xs, part_ys, part_scores, part_labels, part_embs,
        conf_thresh, dist_thresh, out_w, out_h,
    )
