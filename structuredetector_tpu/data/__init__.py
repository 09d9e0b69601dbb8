from .dataset import CropDataset, PredictionDataset, DatasetStats, LabelStats  # noqa: F401
from .augment import (  # noqa: F401
    Compose,
    Normalize,
    RandomColorJitter,
    RandomHorizontalFlip,
    RandomResize,
    RandomVerticalFlip,
    Resize,
    ExportTransforms,
    PredictionTransformation,
    TrainAugmentation,
    ValidationAugmentation,
)
from .pipeline import FlatKeypoints, flatten_annotation, collate, Loader  # noqa: F401
from .decoders import Decoder, ExportDecoder, KeypointDecoder  # noqa: F401
