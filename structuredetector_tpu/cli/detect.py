"""`detect` console script (reference cli/detect.py:13-57; registered
here unlike upstream, SURVEY.md #31).

Runs the model over a directory of unlabeled images, writes prediction
JSONs and rendered overlays to `predictions/`.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image
from tqdm import tqdm

from ..config import config_from_args
from ..data import Decoder, PredictionDataset, PredictionTransformation
from ..models.network import init_model, resolve_variables
from ..train.steps import make_forward
from ..visualization import draw


def main(argv=None):
    config = config_from_args(argv)
    assert config.valid_dir, "Specify the image directory with --valid_dir."
    assert config.pretrained_model, (
        "No pretrained model specified. Use the option '--load_model <model_path>'."
    )

    if config.tiled:
        return _main_tiled(config)

    # uint8 feed + on-device normalization: 4x less host->device traffic
    dataset = PredictionDataset(
        config.valid_dir, PredictionTransformation(config, device_normalize=True)
    )
    model, init_vars = init_model(config)
    # device-resident weights: numpy args re-upload per jit call (DESIGN.md)
    variables = jax.device_put(resolve_variables(config.pretrained_model, init_vars))
    decoder = Decoder(config)
    forward = make_forward(model, from_uint8=True)

    out_dir = Path("predictions")
    out_dir.mkdir(exist_ok=True)

    for i in tqdm(range(len(dataset)), desc="Prediction", unit="image"):
        sample = dataset[i]
        image_path = sample["path"]
        img_size = sample["img_size"]
        batch = jnp.asarray(np.asarray(sample["img"])[None])

        outputs = forward(variables, batch)
        annotation = decoder(outputs)[0]
        annotation.resize((config.width, config.height), img_size)
        annotation.img_size = img_size
        annotation.image_path = Path(image_path)

        image = Image.open(image_path)
        if image.mode != "RGB":
            image = image.convert("RGB")
        overlay = draw(image, annotation, config)

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
