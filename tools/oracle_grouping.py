"""Oracle ablations for the structural-grouping (CSI) failure.

Round-3 flagship gates show keypoint F1 ~0.99 yet CSI F1 ~0.018 on the
v6 set. This tool isolates which stage breaks by substituting ground
truth at successive points in the chain:

  A. pred = GT (scored) -> Evaluator           — tests the evaluator
  B. GT -> flatten -> encode -> dense maps -> Decoder -> Evaluator
                                               — tests encode+decode
  C. model forward, then per-head GT substitution:
       C1: predicted heatmaps+offsets, GT embedding map
       C2: GT heatmaps+offsets, predicted embedding map
                                               — isolates the failing head
  D. plain model eval (control, should match the gate numbers)

Plus a direct part->parent assignment accuracy readout (grouping rate):
fraction of decoded parts whose assigned parent anchor is the nearest
decoded anchor to the part's TRUE owner anchor.

Usage:
  python tools/oracle_grouping.py --valid_dir _runs/synth512v6/valid \
      --load_model trainings/<ts>/model_best_kp_reg.msgpack [--arms ABCD]
"""

from __future__ import annotations

import argparse
import copy
import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from structuredetector_tpu.config import config_from_args  # noqa: E402
from structuredetector_tpu.data import (  # noqa: E402
    CropDataset,
    Decoder,
    Loader,
    ValidationAugmentation,
)
from structuredetector_tpu.data.pipeline import flatten_annotation  # noqa: E402
from structuredetector_tpu.evaluation import Evaluator  # noqa: E402
from structuredetector_tpu.ops.encode import encode_targets  # noqa: E402


def _summ(ev: Evaluator) -> dict:
    s = ev.scalar_summary()
    keys = ("anchor/f1_total", "part/f1_total", "kps/f1_total",
            "csi/f1_total", "classif/f1_total")
    return {k: round(s.get(k, 0.0), 4) for k in keys}


def _with_scores(annotation):
    """Deep-copied GT with score=1.0 everywhere (the evaluator sorts
    predictions by score)."""
    ann = copy.deepcopy(annotation)
    for obj in ann.objects:
        obj.anchor.score = 1.0
        for p in obj.parts:
            p.score = 1.0
    return ann


def dense_maps_from_gt(config, annotation):
    """Render 'perfect' head-output maps from one GT annotation: Gaussian
    heatmaps converted back to logits, offsets/embedding maps scattered
    at the keypoint pixels (zero elsewhere)."""
    in_w, in_h = config.width, config.height
    out_w, out_h = int(in_w / config.down_ratio), int(in_h / config.down_ratio)
    kp = flatten_annotation(
        copy.deepcopy(annotation),
        labels=config.labels, parts=config.parts,
        max_objects=config.max_objects, max_parts=config.max_parts,
        in_size=(in_w, in_h), out_size=(out_w, out_h),
    )
    enc = encode_targets(
        jnp.asarray(kp.anchors_xy)[None], jnp.asarray(kp.anchor_cls)[None],
        jnp.asarray(kp.anchor_mask)[None], jnp.asarray(kp.parts_xy)[None],
        jnp.asarray(kp.part_kind)[None], jnp.asarray(kp.part_owner_xy)[None],
        jnp.asarray(kp.part_mask)[None],
        out_h=out_h, out_w=out_w,
        n_labels=len(config.labels), n_parts=len(config.parts),
        sigma_gauss=config.sigma_gauss,
    )
    anchor_hm = np.asarray(enc.anchor_hm[0])
    part_hm = np.asarray(enc.part_hm[0])

    offsets = np.zeros((out_h, out_w, 2), np.float32)
    embeddings = np.zeros((out_h, out_w, 2), np.float32)
    for i in range(config.max_objects):
        if not kp.anchor_mask[i]:
            continue
        x, y = kp.anchors_xy[i]
        ix, iy = int(np.floor(x)), int(np.floor(y))
        offsets[iy, ix] = (x - ix, y - iy)
    for i in range(config.max_parts):
        if not kp.part_mask[i]:
            continue
        x, y = kp.parts_xy[i]
        ix, iy = int(np.floor(x)), int(np.floor(y))
        offsets[iy, ix] = (x - ix, y - iy)
        embeddings[iy, ix] = kp.part_owner_xy[i] - kp.parts_xy[i]

    def to_logit(p):
        p = np.clip(p, 1e-6, 1.0 - 1e-6)
        return np.log(p / (1.0 - p)).astype(np.float32)

    return {
        "anchor_hm": jnp.asarray(to_logit(anchor_hm))[None],
        "part_hm": jnp.asarray(to_logit(part_hm))[None],
        "offsets": jnp.asarray(offsets)[None],
        "embeddings": jnp.asarray(embeddings)[None],
    }, kp


def grouping_rate(config, decoder, outputs, annotation):
    """Direct part->parent accuracy: for each decoded part matched to a
    GT part (within the eval distance), did its assigned parent anchor
    land within the threshold of that GT part's OWNER anchor?"""
    dec = decoder.decode_arrays(
        outputs, config.conf_threshold, config.decoder_dist_thresh
    )
    anchors, parts, parent, valid = jax.device_get(
        (dec["anchors"], dec["parts"], dec["part_parent"], dec["part_valid"])
    )
    out_h = outputs["anchor_hm"].shape[1]
    out_w = outputs["anchor_hm"].shape[2]
    sx, sy = config.width / out_w, config.height / out_h

    gt_parts, gt_owner, gt_kind = [], [], []
    for obj in annotation.objects:
        for p in obj.parts:
            gt_parts.append((p.x, p.y))
            gt_owner.append((obj.x, obj.y))
            gt_kind.append(config.parts.get(p.kind, -1))
    if not gt_parts:
        return 0, 0, 0
    gt_parts = np.array(gt_parts)
    gt_owner = np.array(gt_owner)
    gt_kind = np.array(gt_kind)
    thresh = min(config.width, config.height) * config.dist_threshold

    total = correct = unassigned = 0
    for i in range(parts.shape[1]):
        if parts[0, i, 2] <= config.conf_threshold:
            continue
        px, py = parts[0, i, 0] * sx, parts[0, i, 1] * sy
        d = np.hypot(gt_parts[:, 0] - px, gt_parts[:, 1] - py)
        # match per kind, like Evaluator.eval_grouping: a decoded leaf
        # must not claim a neighboring object's flower as its GT match
        d = np.where(gt_kind == int(parts[0, i, 3]), d, np.inf)
        j = int(d.argmin())
        if d[j] >= thresh:
            continue
        total += 1
        if not valid[0, i]:
            unassigned += 1
            continue
        a = anchors[0, int(parent[0, i])]
        ax, ay = a[0] * sx, a[1] * sy
        if np.hypot(ax - gt_owner[j, 0], ay - gt_owner[j, 1]) < thresh:
            correct += 1
    return correct, unassigned, total


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="ABD", help="subset of ABCD to run")
    ap.add_argument("--limit", type=int, default=0, help="max images (0=all)")
    ap.add_argument("--out", default=None, help="write JSON summary here")
    args, rest = ap.parse_known_args(argv)
    config = config_from_args(rest)
    assert config.valid_dir, "--valid_dir required"

    augmentation = ValidationAugmentation(config)
    dataset = CropDataset(config, config.valid_dir, augmentation)
    decoder = Decoder(config)
    results: dict = {}

    n = len(dataset) if not args.limit else min(args.limit, len(dataset))

    if "A" in args.arms:
        ev = Evaluator(config)
        for i in range(n):
            ann = dataset[i]["annotation"]
            pred = _with_scores(ann)
            raw = [copy.deepcopy(p) for o in pred.objects for p in o.parts]
            ev.accumulate(pred, ann, raw, eval_csi=True, eval_classif=True)
        results["A_gt_through_evaluator"] = _summ(ev)
        print("A (GT->Evaluator):", results["A_gt_through_evaluator"])

    if "B" in args.arms:
        ev = Evaluator(config)
        g_corr = g_un = g_tot = 0
        for i in range(n):
            ann = dataset[i]["annotation"]
            outputs, _ = dense_maps_from_gt(config, ann)
            data = decoder(outputs, return_metadata=True)
            ev.accumulate(data["annotation"][0], ann, data["raw_parts"][0],
                          eval_csi=True, eval_classif=True)
            c, u, t = grouping_rate(config, decoder, outputs, ann)
            g_corr += c; g_un += u; g_tot += t
        results["B_gt_encode_decode"] = _summ(ev)
        results["B_grouping_rate"] = {
            "correct_parent": g_corr, "unassigned": g_un, "total": g_tot,
            "rate": round(g_corr / g_tot, 4) if g_tot else None,
        }
        print("B (GT->encode->decode->Evaluator):", results["B_gt_encode_decode"])
        print("B grouping rate:", results["B_grouping_rate"])

    if ("C" in args.arms or "D" in args.arms):
        assert config.pretrained_model, "arms C/D need --load_model"
        from structuredetector_tpu.models.network import init_model, resolve_variables
        from structuredetector_tpu.train.steps import make_forward

        model, init_vars = init_model(config)
        variables = resolve_variables(config.pretrained_model, init_vars)
        forward = make_forward(model)

        evals = {k: Evaluator(config) for k in ("C1", "C2", "D")}
        g_corr = g_un = g_tot = 0
        for i in range(n):
            sample = dataset[i]
            ann = sample["annotation"]
            outputs = forward(variables, jnp.asarray(sample["image"])[None])
            gt_maps, _ = dense_maps_from_gt(config, ann)

            if "D" in args.arms:
                data = decoder(outputs, return_metadata=True)
                evals["D"].accumulate(data["annotation"][0], ann,
                                      data["raw_parts"][0],
                                      eval_csi=True, eval_classif=True)
                c, u, t = grouping_rate(config, decoder, outputs, ann)
                g_corr += c; g_un += u; g_tot += t
            if "C" in args.arms:
                c1 = dict(outputs, embeddings=gt_maps["embeddings"])
                data = decoder(c1, return_metadata=True)
                evals["C1"].accumulate(data["annotation"][0], ann,
                                       data["raw_parts"][0],
                                       eval_csi=True, eval_classif=True)
                c2 = dict(gt_maps, embeddings=outputs["embeddings"])
                data = decoder(c2, return_metadata=True)
                evals["C2"].accumulate(data["annotation"][0], ann,
                                       data["raw_parts"][0],
                                       eval_csi=True, eval_classif=True)

        if "D" in args.arms:
            results["D_model_control"] = _summ(evals["D"])
            results["D_grouping_rate"] = {
                "correct_parent": g_corr, "unassigned": g_un, "total": g_tot,
                "rate": round(g_corr / g_tot, 4) if g_tot else None,
            }
            print("D (model control):", results["D_model_control"])
            print("D grouping rate:", results["D_grouping_rate"])
        if "C" in args.arms:
            results["C1_pred_hm_gt_emb"] = _summ(evals["C1"])
            results["C2_gt_hm_pred_emb"] = _summ(evals["C2"])
            print("C1 (pred heatmaps + GT embeddings):", results["C1_pred_hm_gt_emb"])
            print("C2 (GT heatmaps + pred embeddings):", results["C2_gt_hm_pred_emb"])

    if args.out:
        Path(args.out).write_text(json.dumps(results, indent=2))
    return results


if __name__ == "__main__":
    main()
