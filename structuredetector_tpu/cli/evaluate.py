"""`evaluate` console script (reference cli/evaluate.py:9-51).

Loads a trained model (msgpack or bridged torch .pth), runs the
validation set through forward -> decode -> Evaluator, prints the rich
metric tables, optionally exports the keypoint CSV.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from tqdm import tqdm

from ..config import config_from_args
from ..data import CropDataset, Decoder, Loader, ValidationAugmentation
from ..evaluation import Evaluator
from ..models.network import init_model, resolve_variables
from ..train.steps import make_forward


def main(argv=None):
    config = config_from_args(argv)
    assert config.valid_dir, "evaluate requires --valid_dir (annotated validation samples)"
    assert config.pretrained_model, (
        "evaluate requires a trained model — pass --load_model <model_path>"
    )

    from ..data.pipeline import choose_batch_fetch

    augmentation = ValidationAugmentation(config)
    dataset = CropDataset(config, config.valid_dir, augmentation)
    loader = Loader(dataset, batch_size=config.eval_batch_size,
                    num_workers=config.num_workers,
                    batch_fetch=choose_batch_fetch(config, dataset, augmentation))

    model, init_vars = init_model(config)
    # device-resident weights: numpy args re-upload per jit call (DESIGN.md)
    variables = jax.device_put(resolve_variables(config.pretrained_model, init_vars))
    decoder = Decoder(config)
    forward = make_forward(model)

    # --conf_sweep: the forward pass (which dominates eval cost) runs
    # once; the fixed-shape device decode + host metric accumulation
    # repeat per threshold. One metric table per threshold replaces N
    # full eval runs when picking a deployment operating point.
    thresholds = config.conf_sweep or (config.conf_threshold,)
    evaluators = {t: Evaluator(config) for t in thresholds}

    for batch in tqdm(loader, desc="Evaluation", unit="batch"):
        outputs = forward(variables, jnp.asarray(batch["image"]))
        for t, evaluator in evaluators.items():
            data = decoder(outputs, conf_thresh=t, return_metadata=True)
            for i, annotation in enumerate(batch["annotation"]):
                evaluator.accumulate(
                    data["annotation"][i],
                    annotation,
                    data["raw_parts"][i],
                    eval_csi=True,
                    eval_classif=True,
                )

    evaluator = evaluators[thresholds[0]]
    if config.conf_sweep:
        summaries = {t: ev.scalar_summary() for t, ev in evaluators.items()}
        for t, s in summaries.items():
            print(
                f"conf={t:g}: "
                f"anchor F1 {s.get('anchor/f1_total', 0.0):.4f}  "
                f"part F1 {s.get('part/f1_total', 0.0):.4f}  "
                f"kps F1 {s.get('kps/f1_total', 0.0):.4f}  "
                f"csi F1 {s.get('csi/f1_total', 0.0):.4f}  "
                f"classif F1 {s.get('classif/f1_total', 0.0):.4f}"
            )
        # Operating-point readout: the sweep exists to pick a deployment
        # threshold (the reference's own --conf_threshold knob; its
        # published eval uses 0.4 vs the 0.5 arg default). Flag the
        # argmax per headline family so the pick doesn't require reading
        # the table; ties resolve to the earliest threshold listed.
        for fam in ("kps", "anchor"):
            best = max(thresholds,
                       key=lambda t: summaries[t].get(f"{fam}/f1_total", 0.0))
            print(f"best {fam} F1: "
                  f"{summaries[best].get(f'{fam}/f1_total', 0.0):.4f} "
                  f"at conf={best:g}")
    else:
        evaluator.pretty_print()
    if config.csv_path is not None:
        evaluator.save_kps_csv(config.csv_path)
    if config.summary_path is not None:
        import json

        from pathlib import Path

        summary = (
            {f"{t:g}": ev.scalar_summary() for t, ev in evaluators.items()}
            if config.conf_sweep
            else evaluator.scalar_summary()
        )
        Path(config.summary_path).write_text(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
