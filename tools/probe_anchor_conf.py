"""Probe anchor-channel confidence at GT stem locations.

The round-3 flagship runs show a persistent signature: anchor precision
is high (peaks land on real stems) while recall@0.4 stays low — the
stem-base confidence sits below the default threshold. This tool turns
that from a guess into a measured distribution: for every GT object in
a dataset it records, in a 3x3 grid window around the GT stem location,

- the sigmoid confidence of the object's OWN species channel,
- the best OTHER species channel (confidence splitting, the v3 flaw),
- the channel SUM (what a species-agnostic detector would see),

and prints per-species quantiles plus the fraction clearing 0.2 / 0.3 /
0.4 — the evidence base for choosing `--conf_threshold` on a given
dataset (the reference exposes the same knob, args.py `--conf_threshold`).

Usage:
    python tools/probe_anchor_conf.py CKPT --valid_dir D \
        [--labels labels.json] [--anchor_name stem] [-W 512 -H 512]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
import json
from pathlib import Path

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path)
    p.add_argument("--valid_dir", type=Path, required=True)
    p.add_argument("--labels", type=Path, default=Path("labels.json"))
    p.add_argument("--anchor_name", type=str, default="stem")
    p.add_argument("--width", "-W", type=int, default=512)
    p.add_argument("--height", "-H", type=int, default=512)
    p.add_argument("--fpn_depth", type=int, default=128)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--out", type=Path, default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from structuredetector_tpu.config import Config
    from structuredetector_tpu.data.augment import ValidationAugmentation
    from structuredetector_tpu.data.dataset import CropDataset
    from structuredetector_tpu.data.pipeline import Loader
    from structuredetector_tpu.models import init_model
    from structuredetector_tpu.models.network import resolve_variables

    cfg = Config(width=args.width, height=args.height,
                 fpn_depth=args.fpn_depth, valid_dir=args.valid_dir,
                 anchor_name=args.anchor_name, use_amp=True,
                 labels_path=args.labels)
    cfg.load_labels()
    cfg.validate()

    model, variables = init_model(cfg)
    variables = resolve_variables(args.checkpoint, variables)

    dataset = CropDataset(cfg, args.valid_dir, ValidationAugmentation(cfg))
    dataset.localize_image_names()
    loader = Loader(dataset, batch_size=args.batch_size)

    out_w, out_h = cfg.grid_size()
    sx, sy = out_w / cfg.width, out_h / cfg.height

    @jax.jit
    def anchor_conf(variables, images):
        outputs = model.apply(variables, images, train=False)
        return jax.nn.sigmoid(outputs["anchor_hm"].astype(jnp.float32))

    # per species: list of (own, best_other, total) window-max confidences
    recs = {name: [] for name in cfg.labels}
    for batch in loader:
        hm = np.asarray(anchor_conf(variables, jnp.asarray(batch["image"])))
        for i, annotation in enumerate(batch["annotation"]):
            for obj in annotation.objects:
                gx = int(round(obj.x * sx))
                gy = int(round(obj.y * sy))
                y0, y1 = max(0, gy - 1), min(out_h, gy + 2)
                x0, x1 = max(0, gx - 1), min(out_w, gx + 2)
                win = hm[i, y0:y1, x0:x1, :]  # (wy, wx, n_labels)
                per_ch = win.reshape(-1, win.shape[-1]).max(axis=0)
                ci = cfg.labels[obj.name]
                own = float(per_ch[ci])
                other = float(np.delete(per_ch, ci).max()) if len(per_ch) > 1 else 0.0
                recs[obj.name].append((own, other, float(per_ch.sum())))

    report = {}
    for name, rows in recs.items():
        if not rows:
            continue
        arr = np.asarray(rows)  # (n, 3)
        own, other, total = arr[:, 0], arr[:, 1], arr[:, 2]
        report[name] = {
            "n": len(rows),
            "own_q25_50_75": [round(float(q), 3) for q in
                              np.percentile(own, [25, 50, 75])],
            "best_other_median": round(float(np.median(other)), 3),
            "sum_median": round(float(np.median(total)), 3),
            **{f"own_ge_{t}": round(float((own >= t).mean()), 3)
               for t in (0.2, 0.3, 0.4)},
            **{f"sum_ge_{t}": round(float((total >= t).mean()), 3)
               for t in (0.2, 0.3, 0.4)},
        }
    print(json.dumps(report, indent=2))
    if args.out:
        args.out.write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
