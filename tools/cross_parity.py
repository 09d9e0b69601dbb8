#!/usr/bin/env python
"""Cross-framework trained-model parity (VERDICT r4 item 2).

The strongest in-sandbox stand-in for the reference README's
"reproduce the paper" command (`/root/reference/README.md:22-31`,
egress-blocked dataset/weights): run the REFERENCE implementation
itself through the torchvision shim (tools/torchvision_shim) and
cross-evaluate trained checkpoints in BOTH directions:

  direction A (theirs -> ours):
    1. train the reference's own `Trainer` on the synthetic dataset
       (CPU, small config) -> `model_best_*.pth`
    2. score that .pth with the REFERENCE's own evaluate loop
       (`/root/reference/src/sdnet/cli/evaluate.py:34-45`)
    3. score the SAME .pth with OUR `evaluate` CLI (torch bridge)
  direction B (ours -> theirs):
    4. export OUR flagship checkpoint to a reference-layout .pth
       (models/torch_export.py) and score it with the reference's
       evaluate loop; compare against OUR evaluate of the same
       checkpoint at the same resolution.

Agreement within ~1 F1 point per metric family on identical inputs is
the "bit-for-behavior" claim with *trained* models, not matched
tensors. Writes `_runs/eval/cross_parity.json`.

Both evaluators run the SAME images at the SAME resolution and paper
thresholds (conf 0.4, decoder_dist 0.1, dist 0.05 — README.md:27).
The reference is CPU-only here (torch, 1 host core) so direction A
trains small (128x128); absolute F1s are modest and irrelevant — the
*delta between evaluators on the same checkpoint* is the evidence.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
SHIM = str(REPO / "tools" / "torchvision_shim")
REF_SRC = "/root/reference/src"


def _install_reference_path():
    for p in (SHIM, REF_SRC):
        if p not in sys.path:
            sys.path.insert(0, p)


def make_subset(src: Path, dst: Path, n: int, seed: int = 0) -> Path:
    """Copy n (json, jpg) pairs into a scratch dir. The reference's
    `localize_image_names` REWRITES annotation JSONs on disk
    (`/root/reference/src/sdnet/data/dataset.py:51-55`), so the
    original dataset must never be handed to it directly."""
    import random

    dst.mkdir(parents=True, exist_ok=True)
    jsons = sorted(src.glob("*.json"))
    random.Random(seed).shuffle(jsons)
    for j in jsons[:n]:
        d = json.loads(j.read_text())
        img = Path(d["image_path"])
        if not img.is_absolute():
            img = j.parent / img.name
        shutil.copy(img, dst / img.name)
        d["image_path"] = img.name
        (dst / j.name).write_text(json.dumps(d))
    return dst


def ref_args(width: int, height: int, **overrides):
    """Build a reference `Arguments` namespace via its own parser
    (keeps its post-parse label maps/validation/seed, args.py:178-267)."""
    _install_reference_path()
    from sdnet.utils import Arguments

    argv = [
        "--labels", str(REPO / "labels.json"), "--anchor_name", "stem",
        "--width", str(width), "--height", str(height),
        "--conf_threshold", "0.4", "--decoder_dist_thresh", "0.1",
        "--dist_threshold", "0.05",
    ]
    for k, v in overrides.items():
        if v is True:
            argv.append(f"--{k}")
        elif v is not None:
            argv += [f"--{k}", str(v)]
    old_argv = sys.argv
    sys.argv = ["cross_parity"] + argv
    try:
        return Arguments().parse()
    finally:
        sys.argv = old_argv


def _evaluations_summary(evaluator) -> dict:
    """Pull micro-averaged P/R/F1 per family out of the reference
    Evaluator (evaluator.py:217-220, reduce() :187-188)."""
    out = {}
    fams = {
        "anchor": evaluator.anchor_eval,
        "part": evaluator.part_eval,
        "csi": evaluator.csi_eval,
        "classif": evaluator.classification_eval,
    }
    for name, evals in fams.items():
        total = evals.reduce()
        out[f"{name}/f1_total"] = float(total.f1_score or 0.0)
        out[f"{name}/precision_total"] = float(total.precision or 0.0)
        out[f"{name}/recall_total"] = float(total.recall or 0.0)
    # kps = anchor+part union, the reference reports it via `|`
    kps = (evaluator.anchor_eval | evaluator.part_eval).reduce()
    out["kps/f1_total"] = float(kps.f1_score or 0.0)
    return out


def reference_evaluate(pth: Path, valid_dir: Path, width: int, height: int) -> dict:
    """The reference's own evaluate loop (cli/evaluate.py:18-45),
    driven in-process so metrics come back as numbers, not tables."""
    import torch

    _install_reference_path()
    from sdnet.data import CropDataset, Decoder, ValidationAugmentation
    from sdnet.model import Evaluator, Network

    args = ref_args(width, height, valid_dir=str(valid_dir))
    evaluator = Evaluator(args)
    dataset = CropDataset(args, args.valid_dir, ValidationAugmentation(args))
    loader = torch.utils.data.DataLoader(
        dataset, batch_size=1, collate_fn=CropDataset.collate_fn,
        num_workers=0,
    )
    decoder = Decoder(args)
    net = Network(args, pretrained=False)
    net.load_state_dict(torch.load(str(pth), map_location="cpu",
                                   weights_only=True))
    net = net.eval()
    t0 = time.time()
    with torch.no_grad():
        for batch in loader:
            output = net(batch["image"])
            data = decoder(output, return_metadata=True)
            evaluator.accumulate(
                data["annotation"][0], batch["annotation"][0],
                data["raw_parts"][0], True, True,
            )
    summary = _evaluations_summary(evaluator)
    summary["_eval_seconds"] = round(time.time() - t0, 1)
    summary["_n_images"] = len(dataset)
    return summary


def our_evaluate(model_path: Path, valid_dir: Path, width: int, height: int,
                 out_json: Path) -> dict:
    """OUR evaluate CLI at the same thresholds/resolution."""
    from structuredetector_tpu.cli import evaluate

    evaluate.main([
        "--valid_dir", str(valid_dir),
        "--load_model", str(model_path),
        "--labels", str(REPO / "labels.json"), "--anchor_name", "stem",
        "--width", str(width), "--height", str(height),
        "--conf_threshold", "0.4", "--decoder_dist_thresh", "0.1",
        "--dist_threshold", "0.05",
        "--eval_batch_size", "4",
        "--save_summary", str(out_json),
    ])
    return json.loads(out_json.read_text())


def reference_train(train_dir: Path, valid_dir: Path, width: int,
                    height: int, epochs: int, workdir: Path) -> Path:
    """Run the reference's own Trainer (trainer.py:23-309) on CPU via
    the shim; returns the best-CSI checkpoint path."""
    _install_reference_path()
    from sdnet.model import Trainer

    args = ref_args(
        width, height,
        train_dir=str(train_dir), valid_dir=str(valid_dir),
        epochs=epochs, batch_size=8, hm_loss_fn="focal",
        embedding_weight=1.0,
        # StepLR(step_size=epochs//lr_step) divides by zero when
        # epochs < lr_step (args.py:213-215); short parity runs keep
        # one flat-LR phase.
        lr_step=1,
    )
    cwd = os.getcwd()
    workdir.mkdir(parents=True, exist_ok=True)
    os.chdir(workdir)
    try:
        trainer = Trainer(args)
        trainer.train()
        save_dir = Path(trainer.save_dir)
    finally:
        os.chdir(cwd)
    for name in ("model_best_csi.pth", "model_best_classif.pth",
                 "model_best_loss.pth"):
        p = save_dir / name
        if not p.is_absolute():
            p = workdir / p
        if p.exists():
            return p
    raise FileNotFoundError(f"no best checkpoint under {save_dir}")


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", default=str(REPO / "_runs/synth512v6"))
    ap.add_argument("--flagship", required=True,
                    help="our model_best_*.msgpack to export+cross-eval")
    ap.add_argument("--scratch", default=str(REPO / "_runs/cross_parity"))
    ap.add_argument("--train_n", type=int, default=240)
    ap.add_argument("--valid_n", type=int, default=40)
    ap.add_argument("--ref_epochs", type=int, default=10)
    ap.add_argument("--ref_size", type=int, default=128,
                    help="reference CPU train/eval resolution (x32)")
    ap.add_argument("--flagship_size", type=int, default=512)
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse the newest reference run under scratch")
    ap.add_argument("--out", default=str(REPO / "_runs/eval/cross_parity.json"))
    args = ap.parse_args(argv)

    scratch = Path(args.scratch)
    data = Path(args.data)
    results: dict = {"config": vars(args)}

    train_sub = scratch / "train"
    valid_sub = scratch / "valid"
    if not (valid_sub / ".done").exists():
        shutil.rmtree(scratch, ignore_errors=True)
        make_subset(data / "train", train_sub, args.train_n, seed=1)
        make_subset(data / "valid", valid_sub, args.valid_n, seed=2)
        (valid_sub / ".done").touch()

    # ---- direction A: reference-trained .pth ----
    ref_run = scratch / "ref_run"
    if args.skip_train:
        pths = sorted(ref_run.glob("trainings/*/model_best_*.pth"))
        assert pths, "--skip_train but no reference checkpoint found"
        ref_pth = pths[-1]
    else:
        print(f"[cross] training reference on CPU "
              f"({args.train_n} imgs, {args.ref_epochs} epochs, "
              f"{args.ref_size}px) ...", flush=True)
        ref_pth = reference_train(train_sub, valid_sub, args.ref_size,
                                  args.ref_size, args.ref_epochs, ref_run)
    print(f"[cross] reference checkpoint: {ref_pth}", flush=True)

    print("[cross] A1: reference evaluates its own .pth", flush=True)
    results["A1_ref_eval_ref_pth"] = reference_evaluate(
        ref_pth, valid_sub, args.ref_size, args.ref_size)
    print(json.dumps(results["A1_ref_eval_ref_pth"], indent=None), flush=True)

    print("[cross] A2: OUR evaluate on the same .pth (torch bridge)",
          flush=True)
    results["A2_our_eval_ref_pth"] = our_evaluate(
        ref_pth, valid_sub, args.ref_size, args.ref_size,
        scratch / "a2_summary.json")

    # ---- direction B: our flagship checkpoint ----
    print("[cross] B1: OUR evaluate on our checkpoint", flush=True)
    results["B1_our_eval_our_ckpt"] = our_evaluate(
        Path(args.flagship), valid_sub, args.flagship_size,
        args.flagship_size, scratch / "b1_summary.json")

    print("[cross] B2: reference evaluates our exported .pth", flush=True)
    from structuredetector_tpu.models.network import load_params
    from structuredetector_tpu.models.torch_export import save_reference_pth

    exported = scratch / "flagship_exported.pth"
    save_reference_pth(load_params(args.flagship), exported)
    results["B2_ref_eval_our_pth"] = reference_evaluate(
        exported, valid_sub, args.flagship_size, args.flagship_size)

    # ---- deltas ----
    fams = ("anchor/f1_total", "part/f1_total", "kps/f1_total",
            "csi/f1_total", "classif/f1_total")
    results["delta_A"] = {
        k: round(results["A2_our_eval_ref_pth"].get(k, 0.0)
                 - results["A1_ref_eval_ref_pth"].get(k, 0.0), 4)
        for k in fams
    }
    results["delta_B"] = {
        k: round(results["B1_our_eval_our_ckpt"].get(k, 0.0)
                 - results["B2_ref_eval_our_pth"].get(k, 0.0), 4)
        for k in fams
    }
    worst = max(max(abs(v) for v in results["delta_A"].values()),
                max(abs(v) for v in results["delta_B"].values()))
    results["worst_abs_delta"] = round(worst, 4)
    results["pass_1pt"] = bool(worst <= 0.01 + 1e-9)

    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(results, indent=2))
    print(f"[cross] worst |delta| = {worst:.4f} "
          f"({'PASS' if results['pass_1pt'] else 'FAIL'} at 1 point); "
          f"wrote {out}", flush=True)
    return results


if __name__ == "__main__":
    main()
