"""High-level single-image/batch Predictor.

API-parity component for the reference `Predictor`
(`/root/reference/src/sdnet/model/predictor.py:8-33`) — which is broken
upstream (its forward has no return statement and misuses torchvision
transforms; SURVEY.md #10). This one works: load model -> transform ->
jitted forward -> decode -> `ImageAnnotation` in original image
coordinates.
"""

from __future__ import annotations

from pathlib import Path
from typing import List, Optional, Sequence, Union

import jax.numpy as jnp
import numpy as np
from PIL import Image

from .annotations import ImageAnnotation
from .data.augment import PredictionTransformation
from .data.decoders import Decoder
from .models.network import init_model, resolve_variables
from .train.steps import make_forward


class Predictor:
    def __init__(
        self,
        config,
        model_path: Optional[Path] = None,
        device_normalize: bool = True,
    ):
        """`device_normalize` (default): the host only resizes; uint8
        pixels ship to the device and the /255 + ImageNet normalization
        runs inside the jitted forward — 4x less host->device traffic.
        Set False to normalize on the host in float32 (byte-identical
        feed to the `evaluate` CLI path)."""
        self.config = config
        self.model, variables = init_model(config)
        path = model_path or config.pretrained_model
        if path:
            variables = resolve_variables(path, variables)
        self.variables = variables
        self.transform = PredictionTransformation(
            config, device_normalize=device_normalize
        )
        self.decoder = Decoder(config)
        self._forward = make_forward(self.model, from_uint8=device_normalize)

    def predict_image(self, image: Union[Image.Image, str, Path]) -> ImageAnnotation:
        """One image -> annotation in original pixel coordinates."""
        return self.predict_batch([image])[0]

    def predict_batch(
        self, images: Sequence[Union[Image.Image, str, Path]]
    ) -> List[ImageAnnotation]:
        pils = []
        for im in images:
            if not isinstance(im, Image.Image):
                im = Image.open(im)
            if im.mode != "RGB":
                im = im.convert("RGB")
            pils.append(im)

        batch = jnp.asarray(np.stack([self.transform(im) for im in pils]))
        outputs = self._forward(self.variables, batch)
        annotations = self.decoder(outputs)

        for ann, im in zip(annotations, pils):
            ann.resize((self.config.width, self.config.height), im.size)
            ann.img_size = im.size
            if hasattr(im, "filename") and im.filename:
                ann.image_path = Path(im.filename)
        return annotations
