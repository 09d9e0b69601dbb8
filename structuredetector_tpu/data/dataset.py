"""Datasets over directories of JSON-annotated images.

Mirrors `/root/reference/src/sdnet/data/dataset.py`:
- `CropDataset` over one or more directories of `.json` annotation files
  (sorted), images opened with PIL, true `img_size` stamped
  (`dataset.py:13-49`),
- `localize_image_names()` rewrites annotation JSONs on disk so
  `image_path` points next to the JSON (`dataset.py:51-55`) — the
  trainer calls this like the reference does (trainer.py:61,77),
- `PredictionDataset` over unlabeled `.jpg` files (`dataset.py:168-184`),
- `LabelStats`/`DatasetStats` summaries (`dataset.py:187-237`).
"""

from __future__ import annotations

from collections import defaultdict
from pathlib import Path
from typing import List

from PIL import Image

from ..annotations import ImageAnnotation, files_with_extension
from .augment import Compose


class CropDataset:
    def __init__(self, config, directories, transform=None):
        self.config = config
        if isinstance(transform, list):
            self.transform = Compose(transform)
        else:
            self.transform = transform

        if isinstance(directories, (str, Path)):
            self.files = files_with_extension(directories, ".json")
        elif isinstance(directories, list):
            self.files = [
                f for d in directories for f in files_with_extension(d, ".json")
            ]
        else:
            raise ValueError(
                f"expected a directory path or a list of them, got "
                f"{type(directories).__name__}"
            )
        self.files = sorted(self.files)

    def __len__(self):
        return len(self.files)

    def raw_item(self, index):
        """(image_path, annotation) without decoding the image — the
        feed for the whole-batch native loader, which decodes and stamps
        original sizes itself."""
        annotation = ImageAnnotation.from_json(self.files[index], self.config.anchor_name)
        return annotation.image_path, annotation

    def __getitem__(self, index):
        annotation = ImageAnnotation.from_json(self.files[index], self.config.anchor_name)

        if (
            getattr(self.config, "native_io", False)
            and self.transform is not None
            and hasattr(self.transform, "native_apply")
            # per-item native decode requires the device-augment feed:
            # host-augment / --no_augmentation items fall through to PIL
            # (hasattr alone is always true for TrainAugmentation and
            # used to crash here under --native_io --no_augmentation)
            and getattr(self.transform, "device_augment", False)
        ):
            from . import native

            if native.available():
                return self.transform.native_apply(annotation.image_path, annotation)

        image = Image.open(annotation.image_path)
        if image.mode != "RGB":
            image = image.convert("RGB")
        annotation.img_size = image.size
        if self.transform is not None:
            return self.transform(image, annotation)
        return image, annotation

    def localize_image_names(self):
        """Rewrite each annotation's image_path to sit next to its JSON
        (reference dataset.py:51-55; note: writes to the dataset dir)."""
        for file in self.files:
            annotation = ImageAnnotation.from_json(file, self.config.anchor_name)
            annotation.image_path = file.parent / annotation.image_name
            annotation.save_json(file.parent)

    def part_count_histogram(self):
        """Per-label part-count histogram as {label: {n_parts: count}}
        (the data behind the reference's altair `histogram()`,
        dataset.py:133-165, without the plotting dependency)."""
        hist: dict = defaultdict(lambda: defaultdict(int))
        for file in self.files:
            annotation = ImageAnnotation.from_json(file, self.config.anchor_name)
            for obj in annotation.objects:
                hist[obj.name][obj.nb_parts] += 1
        return {k: dict(v) for k, v in hist.items()}

    def histogram(self):
        """Render the part-count histogram with altair (optional dep,
        like the reference's inline import, dataset.py:134-135)."""
        import altair as alt
        import pandas as pd

        data = [
            {"label": label, "parts": n, "count": c}
            for label, counts in self.part_count_histogram().items()
            for n, c in counts.items()
        ]
        df = pd.DataFrame(data)
        charts = [
            alt.Chart(df[df.label == label], width=600, height=400)
            .mark_rect()
            .encode(alt.X("parts:O"), alt.Y("count:Q"))
            for label in df.label.unique()
        ]
        combined = charts[0]
        for c in charts[1:]:
            combined = combined | c
        combined.show()

    def stats(self) -> "DatasetStats":
        s = DatasetStats()
        for file in self.files:
            annotation = ImageAnnotation.from_json(file, self.config.anchor_name)
            s.update(annotation.objects)
        return s

    def __repr__(self):
        return f"Images: {len(self)}\n{self.stats()}"


class PredictionDataset:
    def __init__(self, directory, transform=None,
                 extensions=(".jpg", ".jpeg", ".png")):
        self.images: List[Path] = sorted(
            f
            for ext in extensions
            for f in files_with_extension(directory, ext)
        )
        self.transform = transform

    def __len__(self):
        return len(self.images)

    def __getitem__(self, index):
        path = self.images[index]
        img = Image.open(path)
        if img.mode != "RGB":
            img = img.convert("RGB")
        w, h = img.size
        out = self.transform(img) if self.transform is not None else img
        return {"img": out, "img_size": (w, h), "path": path}


class LabelStats:
    def __init__(self):
        self.count = 0
        self.parts = defaultdict(int)

    def __len__(self):
        return len(self.parts)

    def update(self, obj):
        self.count += 1
        for kp in obj.parts:
            self.parts[kp.kind] += 1

    def __repr__(self):
        parts = ", ".join(f"'{n}': {c}" for n, c in self.parts.items())
        return f"  count: {self.count}\n  part count: {{{parts}}}\n"


class DatasetStats:
    def __init__(self):
        self.stats = defaultdict(LabelStats)

    def __getitem__(self, label):
        return self.stats[label]

    def __len__(self):
        return len(self.stats)

    def items(self):
        return self.stats.items()

    def update(self, objects):
        if isinstance(objects, list):
            for obj in objects:
                self.stats[obj.name].update(obj)
        else:
            self.stats[objects.name].update(objects)

    def __repr__(self):
        return "".join(f"label: {label}\n{stats}" for label, stats in self.items())
