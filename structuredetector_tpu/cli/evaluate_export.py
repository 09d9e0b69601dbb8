"""`evaluate_export` console script — evaluate a serialized inference
artifact (replaces `evaluate_coreml`, reference cli/evaluate_coreml.py:85-130).

Decode params are read back from the artifact's embedded metadata
(`evaluate_coreml.py:88-97`). Uses `ExportDecoder` (sigmoid+NMS already
fused into the graph) — fixing the reference's double-NMS inconsistency
(`evaluate_coreml.py:125` uses the plain Decoder; SURVEY.md §7).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import jax.numpy as jnp
from tqdm import tqdm

from ..data import (CropDataset, ExportDecoder, ExportTransforms, Loader,
                    ValidationAugmentation)
from ..evaluation import Evaluator
from ..export import config_from_metadata, load_exported
from ..ops.decode import split_head_output


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("model", type=str, help="Path to the exported .sdz model.")
    p.add_argument("--valid_dir", type=str, required=True)
    p.add_argument("--anchor_name", "-s", type=str, default="anchor")
    p.add_argument("--max_objects", "-n", type=int, default=20)
    p.add_argument("--max_parts", "-k", type=int, default=40)
    p.add_argument("--sigma_gauss", type=float, default=0.1)
    p.add_argument("--conf_threshold", "-t", type=float, default=0.5)
    p.add_argument("--dist_threshold", "-d", type=float, default=0.05)
    p.add_argument("--decoder_dist_thresh", type=float, default=0.1)
    p.add_argument("--csi_threshold", type=float, default=0.75)
    p.add_argument("--num_workers", type=int, default=0)
    p.add_argument("--save_summary", type=str, default=None,
                   help="Write the flat metric summary (scalar_summary) as JSON.")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    call, meta = load_exported(Path(args.model).expanduser().resolve())

    config = config_from_metadata(
        meta, anchor_name=args.anchor_name,
        max_objects=args.max_objects, max_parts=args.max_parts,
        sigma_gauss=args.sigma_gauss, conf_threshold=args.conf_threshold,
        dist_threshold=args.dist_threshold,
        decoder_dist_thresh=args.decoder_dist_thresh,
        csi_threshold=args.csi_threshold, num_workers=args.num_workers,
        valid_dir=Path(args.valid_dir).expanduser().resolve(),
    )

    evaluator = Evaluator(config)
    decoder = ExportDecoder(config)
    transform = (
        ExportTransforms(config) if meta.get("normalized") else
        ValidationAugmentation(config)
    )
    dataset = CropDataset(config, config.valid_dir, transform)
    loader = Loader(dataset, batch_size=meta.get("batch_size", 1),
                    num_workers=config.num_workers)

    static_batch = None if meta.get("dynamic_batch") else meta.get("batch_size", 1)
    for batch in tqdm(loader, desc="Evaluation", unit="image"):
        images = jnp.asarray(batch["image"])
        if static_batch is not None and images.shape[0] < static_batch:
            # ragged final batch vs a static-shape artifact: pad with
            # zero images, evaluate only the real rows below
            pad = jnp.zeros(
                (static_batch - images.shape[0],) + images.shape[1:],
                images.dtype,
            )
            images = jnp.concatenate([images, pad])
        raw = call(images)
        outputs = split_head_output(raw, config.n_labels, config.n_parts)
        data = decoder(outputs, return_metadata=True)
        for i, annotation in enumerate(batch["annotation"]):
            evaluator.accumulate(
                data["annotation"][i], annotation, data["raw_parts"][i],
                eval_csi=True, eval_classif=True,
            )

    evaluator.pretty_print()
    if args.save_summary:
        import json

        Path(args.save_summary).write_text(
            json.dumps(evaluator.scalar_summary(), indent=2)
        )


if __name__ == "__main__":
    main()
