"""`convert_export` console script — serialize a trained model to a
portable inference artifact (replaces `convert_coreml`,
reference cli/convert_coreml.py:95-140)."""

from __future__ import annotations

import argparse
import json
from pathlib import Path

from ..config import Config
from ..export import export_model
from ..models.network import load_params  # full checkpoints only


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("model", type=str, help="Path to the trained model to convert "
                                           "(msgpack, or torch .pth to bridge).")
    p.add_argument("--output", "-o", type=str, default="model.sdz",
                   help="Output file name of the exported model.")
    p.add_argument("--width", "-W", default=512, type=int)
    p.add_argument("--height", "-H", default=512, type=int)
    p.add_argument("--params", "-p", type=str, default="labels.json",
                   help="Json file of anchor and part names.")
    p.add_argument("--scale-factor", "-s", type=int, default=4)
    p.add_argument("--fpn-depth", type=int, default=128)
    p.add_argument("--head_conv", type=int, default=0,
                   help="Hidden head width the checkpoint was trained "
                        "with (must match; 0 = single-1x1 head).")
    p.add_argument("--anchor_name", type=str, default="anchor")
    p.add_argument("--batch_size", "-b", type=int, default=1,
                   help="Static batch size baked into the artifact.")
    p.add_argument("--dynamic_batch", action="store_true",
                   help="Export with a symbolic batch dimension (one artifact "
                        "serves any batch size).")
    p.add_argument("--norm", action="store_true",
                   help="Fold ImageNet normalization into the graph: the "
                        "exported model consumes raw [0,255] RGB "
                        "(reference convert_coreml.py:105-111).")
    p.add_argument("--uint8_input", action="store_true",
                   help="Bake a uint8 RGB input signature (implies --norm): "
                        "the artifact consumes raw bytes and normalizes "
                        "on-device — 4x smaller feed than float32.")
    p.add_argument("--int8", action="store_true",
                   help="Bake int8 inference convs into the graph (dynamic "
                        "activation + per-channel weight quantization).")
    p.add_argument("--calibrate_dir", type=str, default=None,
                   help="With --int8: directory of representative images; "
                        "bakes static activation scales (no per-call amax "
                        "pass — recovers batch-1 latency).")
    p.add_argument("--calibrate_images", type=int, default=16,
                   help="Max images sampled from --calibrate_dir.")
    return p.parse_args(argv)


def _calibrated_variables(config, variables, cal_dir: Path, max_images: int):
    """Static int8 activation scales from representative images: load +
    resize + normalize exactly as the serving graph's conv stack sees
    them, then record per-conv amax (models/quantize.py)."""
    import numpy as np

    from ..data.augment import PredictionTransformation
    from ..data.dataset import PredictionDataset
    from ..models.network import build_model
    from ..models.quantize import calibrate_activation_scales

    dataset = PredictionDataset(
        cal_dir, PredictionTransformation(config, device_normalize=False)
    )
    n = min(len(dataset), max_images)
    if n <= 0:
        raise SystemExit(
            f"--calibrate_dir {cal_dir}: no calibration images "
            f"({len(dataset)} .jpg/.jpeg/.png found, "
            f"--calibrate_images {max_images})"
        )
    batch = np.stack([dataset[i]["img"] for i in range(n)])

    return calibrate_activation_scales(build_model(config), variables, [batch])


def main(argv=None):
    args = parse_args(argv)

    names = json.loads(Path(args.params).expanduser().resolve().read_text())
    if not isinstance(names["labels"], list) or not isinstance(names["parts"], list):
        raise ValueError("labels/parts in the params file should be lists")

    config = Config(
        width=args.width, height=args.height, fpn_depth=args.fpn_depth,
        down_ratio=float(args.scale_factor), anchor_name=args.anchor_name,
        int8=args.int8, head_conv=max(0, args.head_conv),
    ).set_labels(names["labels"], names["parts"])
    config.validate()

    variables = load_params(Path(args.model).expanduser().resolve())
    if args.calibrate_dir:
        if not args.int8:
            raise SystemExit("--calibrate_dir requires --int8")
        variables = _calibrated_variables(
            config, variables,
            Path(args.calibrate_dir).expanduser().resolve(),
            args.calibrate_images,
        )
    out = export_model(config, variables, args.output, batch_size=args.batch_size,
                       fold_normalization=args.norm or args.uint8_input,
                       dynamic_batch=args.dynamic_batch,
                       uint8_input=args.uint8_input)
    print(f"Exported to {out}")


if __name__ == "__main__":
    main()
