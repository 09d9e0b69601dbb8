"""`detect` console script (reference cli/detect.py:13-57; registered
here unlike upstream, SURVEY.md #31).

Runs the model over a directory of unlabeled images, writes prediction
JSONs and rendered overlays to `predictions/`.
"""

from __future__ import annotations

from pathlib import Path

from tqdm import tqdm

from ..config import config_from_args
from ..data import PredictionDataset
from ..visualization import draw


def main(argv=None):
    config = config_from_args(argv)
    assert config.valid_dir, "Specify the image directory with --valid_dir."
    assert config.pretrained_model, (
        "No pretrained model specified. Use the option '--load_model <model_path>'."
    )

    if config.tiled:
        return _main_tiled(config)

    from ..predictor import Predictor

    # Predictor owns the whole device path: uint8 feed + on-device
    # normalization, device-resident weights, and the cfirst fused
    # decode fast path on TPU. --eval_batch_size images go through one
    # compiled graph per batch (the tail pads by repetition, so exactly
    # one shape compiles).
    predictor = Predictor(config)
    dataset = PredictionDataset(config.valid_dir)

    out_dir = Path("predictions")
    out_dir.mkdir(exist_ok=True)

    bs = max(1, int(config.eval_batch_size or 1))
    for start in tqdm(range(0, len(dataset), bs), desc="Prediction",
                      unit="batch"):
        samples = [dataset[i] for i in range(start, min(start + bs, len(dataset)))]
        images = [s["img"] for s in samples]
        n = len(images)
        annotations = predictor.predict_batch(images + [images[-1]] * (bs - n))

        for sample, annotation in zip(samples, annotations[:n]):
            image_path = sample["path"]
            annotation.image_path = Path(image_path)
            overlay = draw(sample["img"], annotation, config)
            annotation.save_json(out_dir)
            overlay.save(out_dir / Path(image_path).name)


def _main_tiled(config):
    """--tiled: native-resolution sliding-window detection. Images keep
    full detail (no downscale); cross-tile duplicates merge by anchor
    score (Predictor.predict_tiled)."""
    from ..predictor import Predictor

    predictor = Predictor(config)
    out_dir = Path("predictions")
    out_dir.mkdir(exist_ok=True)

    # transform=None: PredictionDataset hands back the opened RGB PIL
    # image, decoded once — it feeds both tiling and the overlay
    # (orthomosaic-scale inputs are expensive to decode twice)
    dataset = PredictionDataset(config.valid_dir)
    for i in tqdm(range(len(dataset)), desc="Prediction", unit="image"):
        sample = dataset[i]
        image, image_path = sample["img"], sample["path"]
        annotation = predictor.predict_tiled(image, overlap=config.tile_overlap)
        annotation.image_path = Path(image_path)
        overlay = draw(image, annotation, config)

        annotation.save_json(out_dir)
        overlay.save(out_dir / Path(image_path).name)


if __name__ == "__main__":
    main()
