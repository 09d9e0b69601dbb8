"""Host-side decoders: device arrays -> `ImageAnnotation` objects.

API parity with the reference decoders
(`/root/reference/src/sdnet/data/decoders.py`):

- `Decoder` — full path: device phase (sigmoid -> NMS -> top-k -> gather
  -> association argmin, jitted via `ops.decode.decode_feature_maps`)
  then host materialization with the exact threshold/ordering semantics
  (`decoders.py:102-139`): parts grouped by argmin anchor index in top-k
  order, anchors kept iff score > conf (strict), everything rescaled
  grid -> input pixels.
- `ExportDecoder` — the exported-graph path where sigmoid+NMS are fused
  into the model (reference `CoreMLDecoder`, decoders.py:182-342).
- `KeypointDecoder` — flat keypoint decode, no grouping
  (decoders.py:345-423).

`return_metadata=True` also returns sigmoided heatmaps, raw top-k tuples
and conf-filtered `raw_parts` (used by the Evaluator's part metric,
decoders.py:141-177).
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..annotations import ImageAnnotation, Keypoint, Object
from ..ops.decode import decode_feature_maps


@functools.partial(jax.jit, static_argnames=("max_objects", "max_parts",
                                             "apply_sigmoid_nms", "use_pallas"))
def _decode_jit(outputs, conf_thresh, dist_thresh, *, max_objects, max_parts,
                apply_sigmoid_nms, use_pallas):
    # conf/dist thresholds are TRACED scalars: they only feed masking
    # comparisons, so threshold changes (--conf_sweep, serving knobs)
    # reuse one compiled decode program instead of recompiling per value.
    nms_fn = None
    if use_pallas:
        from ..ops.pallas import fused_sigmoid_nms

        nms_fn = fused_sigmoid_nms
    return decode_feature_maps(
        outputs,
        max_objects=max_objects,
        max_parts=max_parts,
        conf_thresh=conf_thresh,
        dist_thresh=dist_thresh,
        apply_sigmoid_nms=apply_sigmoid_nms,
        nms_fn=nms_fn,
    )


class Decoder:
    apply_sigmoid_nms = True

    def __init__(self, config, use_pallas: Optional[bool] = None):
        self.config = config
        self.label_map = config.r_labels
        self.part_map = config.r_parts
        self.anchor_name = config.anchor_name
        self.down_ratio = config.down_ratio
        self.max_objects = config.max_objects  # K
        self.max_parts = config.max_parts  # P
        if use_pallas is None:
            use_pallas = jax.default_backend() == "tpu"
        self.use_pallas = use_pallas

    def decode_arrays(self, outputs: Dict[str, jax.Array], conf_thresh: float,
                      dist_thresh: float) -> Dict[str, jax.Array]:
        """Device phase only: fixed-shape detection arrays."""
        return _decode_jit(
            outputs,
            jnp.float32(conf_thresh),
            jnp.float32(dist_thresh),
            max_objects=self.max_objects,
            max_parts=self.max_parts,
            apply_sigmoid_nms=self.apply_sigmoid_nms,
            use_pallas=self.use_pallas,
        )

    def __call__(self, outputs, conf_thresh=None, dist_thresh=None,
                 return_metadata: bool = False):
        conf_thresh = (
            conf_thresh if conf_thresh is not None else self.config.conf_threshold
        )
        dist_thresh = (
            dist_thresh if dist_thresh is not None else self.config.decoder_dist_thresh
        )
        out_h, out_w = outputs["anchor_hm"].shape[1:3]
        in_h, in_w = int(self.down_ratio * out_h), int(self.down_ratio * out_w)

        dec = self.decode_arrays(outputs, conf_thresh, dist_thresh)
        annotations, anchors, parts = self.fetch_and_materialize(
            dec, (out_h, out_w), conf_thresh
        )

        if not return_metadata:
            return annotations

        # conf-filtered raw (pre-grouping) parts, rescaled to input pixels
        # (decoders.py:143-159); keeps score >= conf (strict < skip).
        b = anchors.shape[0]
        raw_parts = []
        for b_i in range(b):
            raw_b = []
            for i in range(self.max_parts):
                p = parts[b_i, i]
                score = float(p[2])
                if score < conf_thresh:
                    continue
                kp = Keypoint(self.part_map[int(p[3])], float(p[0]), float(p[1]), score)
                raw_b.append(kp.resize((out_w, out_h), (in_w, in_h)))
            raw_parts.append(raw_b)

        return {
            "annotation": annotations,
            "anchor_hm_sig": dec["anchor_hm_sig"],
            "part_hm_sig": dec["part_hm_sig"],
            "embeddings": dec["embeddings"],
            "anchors": anchors,
            "parts": parts,
            "raw_parts": raw_parts,
            "raw_embeddings": outputs["embeddings"],
            "raw_offsets": outputs["offsets"],
        }

    def fetch_and_materialize(self, dec, out_hw, conf_thresh):
        """One host transfer of the four decode arrays + `materialize`.

        Returns (annotations, anchors, parts); the numpy arrays come
        along because the metadata path (`__call__`) reuses them for
        raw_parts. The single shared site for the fetch keeps the key
        set and threshold handling in one place across Predictor,
        ExportPredictor, and Decoder itself."""
        anchors, parts, part_parent, part_valid = jax.device_get(
            (dec["anchors"], dec["parts"], dec["part_parent"],
             dec["part_valid"])
        )
        annotations = self.materialize(
            anchors, parts, part_parent, part_valid, out_hw, conf_thresh
        )
        return annotations, anchors, parts

    def materialize(self, anchors, parts, part_parent, part_valid,
                    out_hw, conf_thresh):
        """Host phase: fetched numpy detection arrays -> annotations.

        Split out from `__call__` so a pipelined caller (serve's
        depth-2 pipeline, `Predictor.predict_batch_submit/collect`)
        can run the device phase of batch N+1 before this host phase
        of batch N."""
        out_h, out_w = out_hw
        in_h, in_w = int(self.down_ratio * out_h), int(self.down_ratio * out_w)

        annotations = []
        b = anchors.shape[0]
        for b_i in range(b):
            part_list = defaultdict(list)
            image_annotation = ImageAnnotation(f"batch_{b_i}")

            # parts grouped by argmin anchor, in top-k order (decoders.py:108-112)
            for i in range(self.max_parts):
                if not part_valid[b_i, i]:
                    continue
                part_list[int(part_parent[b_i, i])].append(parts[b_i, i])

            # anchors kept iff score strictly above conf (decoders.py:114-137)
            for anchor_i in range(self.max_objects):
                a = anchors[b_i, anchor_i]
                score = float(a[2])
                if score <= conf_thresh:
                    continue
                kp_rows = part_list[anchor_i]
                kps = [
                    Keypoint(
                        kind=self.part_map[int(p[3])],
                        x=float(p[0]), y=float(p[1]), score=float(p[2]),
                    )
                    for p in kp_rows
                ]
                anchor = Keypoint(
                    kind=self.anchor_name, x=float(a[0]), y=float(a[1]), score=score
                )
                obj = Object(name=self.label_map[int(a[3])], anchor=anchor, parts=kps)
                image_annotation.objects.append(obj)

            annotations.append(
                image_annotation.resize((out_w, out_h), (in_w, in_h))
            )

        return annotations


class ExportDecoder(Decoder):
    """For exported graphs with sigmoid+NMS fused in (reference
    CoreMLDecoder, decoders.py:182-184)."""

    apply_sigmoid_nms = False


class KeypointDecoder:
    """Flat keypoint decode without part->anchor grouping
    (reference decoders.py:345-423)."""

    def __init__(self, config, use_pallas: Optional[bool] = None):
        self._decoder = Decoder(config, use_pallas=use_pallas)
        self.config = config

    def __call__(self, outputs):
        cfg = self.config
        out_h, out_w = outputs["anchor_hm"].shape[1:3]
        in_h, in_w = int(cfg.down_ratio * out_h), int(cfg.down_ratio * out_w)
        r_h, r_w = in_h / out_h, in_w / out_w

        dec = self._decoder.decode_arrays(
            outputs, cfg.conf_threshold, cfg.decoder_dist_thresh
        )
        anchors, parts = jax.device_get((dec["anchors"], dec["parts"]))

        annotations = []
        for b_i in range(anchors.shape[0]):
            kps = []
            for a in anchors[b_i]:
                if float(a[2]) < cfg.conf_threshold:
                    continue
                kps.append(
                    Keypoint(cfg.r_labels[int(a[3])], float(a[0]) * r_w,
                             float(a[1]) * r_h, float(a[2]))
                )
            for p in parts[b_i]:
                if float(p[2]) < cfg.conf_threshold:
                    continue
                kps.append(
                    Keypoint(cfg.r_parts[int(p[3])], float(p[0]) * r_w,
                             float(p[1]) * r_h, float(p[2]))
                )
            annotations.append(kps)
        return annotations
