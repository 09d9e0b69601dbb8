"""Augmentations + dataset (data.augment, data.dataset)."""

import json

import numpy as np
import pytest
from PIL import Image

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.config import Config
from structuredetector_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    MULTISCALE_RATIOS,
    Normalize,
    PredictionTransformation,
    RandomColorJitter,
    RandomHorizontalFlip,
    RandomVerticalFlip,
    Resize,
    TrainAugmentation,
    ValidationAugmentation,
)
from structuredetector_tpu.data.dataset import CropDataset, PredictionDataset


def make_pair(w=100, h=80):
    img = Image.new("RGB", (w, h), (128, 64, 32))
    ann = ImageAnnotation(
        "x.jpg",
        [Object("bean", Keypoint("stem", 10, 20), [Keypoint("leaf", 30, 40)])],
        (w, h),
    )
    return img, ann


def test_resize_image_and_annotation():
    img, ann = make_pair()
    out_img, out_ann = Resize((50, 40))(img, ann)
    assert out_img.size == (50, 40)
    assert out_ann.objects[0].x == 5.0 and out_ann.objects[0].y == 10.0
    # original untouched (resized() copies)
    assert ann.objects[0].x == 10


def test_hflip_forced():
    img, ann = make_pair()
    rng = np.random.default_rng(0)
    flip = RandomHorizontalFlip(prob=1.1, rng=rng)  # always flips
    out_img, out_ann = flip(img, ann)
    assert out_ann.objects[0].x == 100 - 10 - 1
    noflip = RandomHorizontalFlip(prob=-1.0, rng=rng)  # never
    _, ann2 = noflip(*make_pair())
    assert ann2.objects[0].x == 10


def test_vflip_forced():
    img, ann = make_pair()
    flip = RandomVerticalFlip(prob=1.1, rng=np.random.default_rng(0))
    _, out_ann = flip(img, ann)
    assert out_ann.objects[0].y == 80 - 20 - 1


def test_legacy_flip_rate():
    """legacy_flip reproduces the reference's randn-draw quirk
    (transforms.py:14): p=0.5 flips ~69% of the time."""
    rng = np.random.default_rng(0)
    flip = RandomHorizontalFlip(prob=0.5, rng=rng, legacy_flip=True)
    rate = np.mean([flip._trigger() for _ in range(4000)])
    assert 0.66 < rate < 0.72
    uniform = RandomHorizontalFlip(prob=0.5, rng=rng)
    rate_u = np.mean([uniform._trigger() for _ in range(4000)])
    assert 0.47 < rate_u < 0.53


def test_legacy_flip_honors_probability_edges():
    """--flip_prob 0/1 must be exact off/on switches even in legacy
    mode: the raw randn comparison would flip ~50% at prob=0 and only
    ~84% at prob=1."""
    rng = np.random.default_rng(1)
    off = RandomHorizontalFlip(prob=0.0, rng=rng, legacy_flip=True)
    assert not any(off._trigger() for _ in range(200))
    on = RandomHorizontalFlip(prob=1.0, rng=rng, legacy_flip=True)
    assert all(on._trigger() for _ in range(200))


def test_color_jitter_keeps_annotation_and_shape():
    img, ann = make_pair()
    out_img, out_ann = RandomColorJitter(rng=np.random.default_rng(3))(img, ann)
    assert out_img.size == img.size
    assert out_ann is ann


def test_normalize_values():
    img = Image.new("RGB", (4, 4), (255, 0, 128))
    arr = Normalize()(img)
    assert arr.shape == (4, 4, 3)
    want = (np.array([1.0, 0.0, 128 / 255]) - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(arr[0, 0], want, rtol=1e-5)


def make_config(**kw):
    kw = {"width": 64, "height": 64, "max_objects": 4, "max_parts": 8,
          "use_amp": False, **kw}
    cfg = Config(**kw)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    return cfg


def test_train_augmentation_pipeline_output():
    cfg = make_config()
    aug = TrainAugmentation(cfg, rng=np.random.default_rng(0))
    img, ann = make_pair()
    sample = aug(img, ann)
    assert sample["image"].shape == (64, 64, 3)
    assert sample["keypoints"].anchors_xy.shape == (4, 2)
    assert sample["annotation"].objects[0].anchor.kind == "stem"


def test_multiscale_reroll_snaps_to_32():
    cfg = make_config(width=512, height=512)
    aug = TrainAugmentation(cfg, rng=np.random.default_rng(0))
    sizes = set()
    for _ in range(30):
        aug.trigger_random_resize()
        w, h = aug.current_size
        assert w % 32 == 0 and h % 32 == 0
        assert 0.75 * 512 <= w <= 1.25 * 512
        sizes.add((w, h))
    assert len(sizes) > 3  # actually re-rolls
    want = {(int(r * 512 / 32) * 32,) * 2 for r in MULTISCALE_RATIOS}
    assert sizes <= want


def test_no_augmentation_pipeline_is_deterministic():
    cfg = make_config(no_augmentation=True)
    aug = TrainAugmentation(cfg)
    img, ann = make_pair()
    s1 = aug(img, ann)
    s2 = aug(*make_pair())
    np.testing.assert_array_equal(s1["image"], s2["image"])
    aug.trigger_random_resize()  # no-op without augmentation
    assert aug.current_size == (64, 64)


def test_validation_augmentation_no_randomness():
    cfg = make_config()
    aug = ValidationAugmentation(cfg)
    s1 = aug(*make_pair())
    s2 = aug(*make_pair())
    np.testing.assert_array_equal(s1["image"], s2["image"])
    np.testing.assert_array_equal(s1["keypoints"].anchors_xy, s2["keypoints"].anchors_xy)


def test_prediction_transformation_image_only():
    cfg = make_config()
    out = PredictionTransformation(cfg)(make_pair()[0])
    assert out.shape == (64, 64, 3)
    assert out.dtype == np.float32


def write_dataset(tmp_path, n=3):
    for i in range(n):
        img = Image.new("RGB", (60, 50), (10, 20, 30))
        img.save(tmp_path / f"im_{i}.jpg")
        ann = {
            "image_path": str(tmp_path / f"im_{i}.jpg"),
            "img_size": [60, 50],
            "objects": [
                {"label": "bean", "box": None, "parts": [
                    {"kind": "stem", "location": {"x": 15, "y": 25}, "score": None},
                    {"kind": "leaf", "location": {"x": 30, "y": 10}, "score": None},
                ]}
            ],
        }
        (tmp_path / f"im_{i}.json").write_text(json.dumps(ann))


def test_crop_dataset_loads_and_transforms(tmp_path):
    write_dataset(tmp_path)
    cfg = make_config()
    ds = CropDataset(cfg, tmp_path, ValidationAugmentation(cfg))
    assert len(ds) == 3
    sample = ds[0]
    assert sample["image"].shape == (64, 64, 3)
    assert sample["annotation"].img_size == (60, 50)
    stats = ds.stats()
    assert stats["bean"].count == 3
    assert stats["bean"].parts["leaf"] == 3


def test_crop_dataset_multiple_dirs(tmp_path):
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    write_dataset(tmp_path / "a", 2)
    write_dataset(tmp_path / "b", 1)
    cfg = make_config()
    ds = CropDataset(cfg, [tmp_path / "a", tmp_path / "b"])
    assert len(ds) == 3


def test_localize_image_names_rewrites_json(tmp_path):
    write_dataset(tmp_path, 1)
    # break the stored path
    data = json.loads((tmp_path / "im_0.json").read_text())
    data["image_path"] = "/nowhere/im_0.jpg"
    (tmp_path / "im_0.json").write_text(json.dumps(data))
    cfg = make_config()
    ds = CropDataset(cfg, tmp_path)
    ds.localize_image_names()
    fixed = json.loads((tmp_path / "im_0.json").read_text())
    assert fixed["image_path"] == str(tmp_path / "im_0.jpg")


def test_prediction_dataset(tmp_path):
    Image.new("RGB", (30, 20)).save(tmp_path / "a.jpg")
    Image.new("L", (30, 20)).save(tmp_path / "b.png")
    cfg = make_config()
    ds = PredictionDataset(tmp_path, PredictionTransformation(cfg))
    assert len(ds) == 2
    s = ds[0]
    assert s["img"].shape == (64, 64, 3)
    assert s["img_size"] == (30, 20)


def test_random_resize_alternate():
    from structuredetector_tpu.data.augment import RandomResize

    cfg = make_config(width=256, height=256)
    rr = RandomResize(cfg, rng=np.random.default_rng(0))
    img, ann = make_pair()
    sizes = set()
    for _ in range(20):
        out_img, _ = rr(*make_pair())
        assert out_img.size[0] % 32 == 0
        sizes.add(out_img.size)
    assert len(sizes) > 2
