"""Parity extras: alternate losses, Predictor, strict classif eval,
export normalization folding, native dataset path, misc utils."""

import json

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.config import Config
from structuredetector_tpu.evaluation import Evaluator
from structuredetector_tpu.ops.losses import masked_l2_loss, masked_smooth_l1_loss
from structuredetector_tpu.utils import AverageMeter, set_seed


def test_masked_smooth_l1():
    feat = jnp.zeros((1, 2, 2, 2))
    target = jnp.array([[[0.5, 0.5], [3.0, 3.0]]])
    inds = jnp.array([[0, 1]])
    mask = jnp.array([[True, True]])
    # residuals 0.5 (quadratic: 0.125 each) and 3.0 (linear: 2.5 each)
    want = (2 * 0.125 + 2 * 2.5) / 4
    got = float(masked_smooth_l1_loss(feat, target, inds, mask))
    assert got == pytest.approx(want, rel=1e-5)


def test_masked_l2():
    feat = jnp.zeros((1, 2, 2, 2))
    target = jnp.array([[[2.0, 2.0], [1.0, 1.0]]])
    inds = jnp.array([[0, 1]])
    mask = jnp.array([[True, False]])
    # only first entry counts in the numerator, but the mask-sum denom
    # counts mask elements broadcast over coords: 2
    got = float(masked_l2_loss(feat, target, inds, mask))
    assert got == pytest.approx((4.0 + 4.0) / 2, rel=1e-5)


def obj(name, x, y, parts=(), score=0.9):
    return Object(name, Keypoint("stem", x, y, score),
                  [Keypoint("leaf", px, py, ps) for px, py, ps in parts])


def test_eval_classif_strict(tiny_config):
    ev = Evaluator(tiny_config)
    s = 8
    gt = ImageAnnotation("x.jpg", [
        obj("bean", 100 / s, 100 / s,
            parts=[(110 / s, 110 / s, None), (90 / s, 90 / s, None)])
    ], (512, 512))
    # right label, wrong count -> not TP, recorded as count error
    pred = ImageAnnotation("x.jpg", [
        obj("bean", 100 / s, 100 / s, parts=[(110 / s, 110 / s, 0.9)])
    ], (512, 512))
    res = ev.eval_classif_strict(pred, gt)
    assert res["bean_1"].tp == 0
    assert res["bean_1"].count_errors == [("bean", 1, 2)]
    # right label, right count -> TP
    pred2 = ImageAnnotation("x.jpg", [
        obj("bean", 100 / s, 100 / s,
            parts=[(110 / s, 110 / s, 0.9), (90 / s, 90 / s, 0.8)])
    ], (512, 512))
    res2 = ev.eval_classif_strict(pred2, gt)
    assert res2["bean_2"].tp == 1
    assert res2["bean_2"].count_errors == [("bean", 2, 2)]


def test_conf_matrix_save(tmp_path, tiny_config):
    from structuredetector_tpu.evaluation import Evaluation

    e = Evaluation()
    e.count_errors = [("bean", 1, 2), ("bean", 1, 2), ("bean", 3, 3)]
    e.tp = e.npos = e.ndet = 0
    e.save_conf_matrix(tmp_path)
    mat = np.load(tmp_path / "conf_mat_bean.npy")
    assert mat[2, 1] == 2 and mat[3, 3] == 1


def _write_ds(tmp_path, n=2):
    for i in range(n):
        Image.new("RGB", (60, 50), (10, 20, 30)).save(tmp_path / f"im_{i}.jpg")
        (tmp_path / f"im_{i}.json").write_text(json.dumps({
            "image_path": str(tmp_path / f"im_{i}.jpg"), "img_size": [60, 50],
            "objects": [{"label": "bean", "box": None, "parts": [
                {"kind": "stem", "location": {"x": 15, "y": 25}, "score": None},
                {"kind": "leaf", "location": {"x": 30, "y": 10}, "score": None},
            ]}],
        }))


def test_part_count_histogram(tmp_path, tiny_config):
    from structuredetector_tpu.data.dataset import CropDataset

    _write_ds(tmp_path, 3)
    cfg = Config(width=64, height=64, use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    ds = CropDataset(cfg, tmp_path)
    hist = ds.part_count_histogram()
    assert hist == {"bean": {1: 3}}


def test_native_dataset_path(tmp_path):
    from structuredetector_tpu.data import native
    from structuredetector_tpu.data.augment import ValidationAugmentation
    from structuredetector_tpu.data.dataset import CropDataset

    if not native.available():
        pytest.skip("native lib not built")

    _write_ds(tmp_path)
    cfg = Config(width=64, height=64, max_objects=4, max_parts=8, use_amp=False,
                 native_io=True)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    ds = CropDataset(cfg, tmp_path, ValidationAugmentation(cfg))
    sample = ds[0]
    assert sample["image"].shape == (64, 64, 3)
    assert sample["annotation"].img_size == (60, 50)
    # annotation resized to network space: x 15 -> 16
    assert sample["annotation"].objects[0].x == pytest.approx(15 * 64 / 60)

    # PIL path gives nearly the same pixels
    cfg2 = Config(width=64, height=64, max_objects=4, max_parts=8, use_amp=False)
    cfg2.set_labels(["bean", "maize"], ["leaf"])
    cfg2.anchor_name = "stem"
    ds2 = CropDataset(cfg2, tmp_path, ValidationAugmentation(cfg2))
    s2 = ds2[0]
    assert np.abs(sample["image"] - s2["image"]).mean() < 0.05
    np.testing.assert_allclose(
        sample["keypoints"].anchors_xy, s2["keypoints"].anchors_xy, atol=1e-5
    )


@pytest.mark.slow  # compiles the full model
def test_predictor(tmp_path):
    from structuredetector_tpu.predictor import Predictor

    cfg = Config(width=64, height=64, max_objects=4, max_parts=8, fpn_depth=32,
                 use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    pred = Predictor(cfg)
    img = Image.new("RGB", (100, 80), (50, 100, 50))
    ann = pred.predict_image(img)
    assert isinstance(ann, ImageAnnotation)
    assert ann.img_size == (100, 80)
    for o in ann.objects:
        assert 0 <= o.x <= 100 and 0 <= o.y <= 80


@pytest.mark.slow  # compiles the full model twice
def test_predictor_uint8_feed_matches_host_normalize():
    """The default uint8 device-normalized feed decodes to the same
    detections as host float32 normalization (the evaluate-path feed)."""
    from structuredetector_tpu.predictor import Predictor

    cfg = Config(width=64, height=64, max_objects=4, max_parts=8, fpn_depth=32,
                 use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"

    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 256, (80, 100, 3), np.uint8))

    dev = Predictor(cfg, device_normalize=True)
    host = Predictor(cfg, device_normalize=False)
    # same random init for both
    host.variables = dev.variables

    a = dev.predict_image(img)
    b = host.predict_image(img)
    assert len(a.objects) == len(b.objects)
    for oa, ob in zip(a.objects, b.objects):
        assert oa.name == ob.name
        assert oa.x == pytest.approx(ob.x, abs=1e-2)
        assert oa.y == pytest.approx(ob.y, abs=1e-2)


def test_uint8_forward_matches_host_normalize():
    """make_forward(from_uint8=True) on raw bytes == host Normalize +
    plain forward, within fp32 tolerance."""
    from structuredetector_tpu.data.augment import Normalize
    from structuredetector_tpu.models import init_model
    from structuredetector_tpu.train.steps import make_forward

    cfg = Config(width=32, height=32, fpn_depth=16, max_objects=2, max_parts=4,
                 use_amp=False)
    cfg.set_labels(["bean"], ["leaf"])
    model, variables = init_model(cfg)

    rng = np.random.default_rng(3)
    u8 = rng.integers(0, 256, (2, 32, 32, 3), np.uint8)
    host_in = np.stack([Normalize()(Image.fromarray(im)) for im in u8])

    got = make_forward(model, from_uint8=True)(variables, jnp.asarray(u8))
    want = make_forward(model)(variables, jnp.asarray(host_in))
    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), atol=2e-4
        )


@pytest.mark.slow  # compiles + exports the full model
def test_export_normalization_folding(tmp_path):
    from structuredetector_tpu.export import export_model, load_exported
    from structuredetector_tpu.models import init_model

    cfg = Config(width=32, height=32, fpn_depth=16, use_amp=False)
    cfg.set_labels(["bean"], ["leaf"])
    model, variables = init_model(cfg)

    p_norm = export_model(cfg, variables, tmp_path / "n.sdz", fold_normalization=True)
    p_raw = export_model(cfg, variables, tmp_path / "r.sdz")
    call_n, meta_n = load_exported(p_norm)
    call_r, meta_r = load_exported(p_raw)
    assert meta_n["normalized"] and not meta_r["normalized"]

    from structuredetector_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

    rng = np.random.default_rng(0)
    raw255 = rng.uniform(0, 255, (1, 32, 32, 3)).astype(np.float32)
    normalized = (raw255 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(
        np.asarray(call_n(raw255)), np.asarray(call_r(normalized)), atol=2e-4
    )


def test_average_meter_and_seed():
    m = AverageMeter()
    m.update(1.0)
    m.update(3.0)
    assert m.avg == 2.0 and m.count == 2
    key = set_seed(123)
    assert key is not None


def test_host_rss_mb():
    """Per-epoch host telemetry: positive on Linux, never raises."""
    from structuredetector_tpu.train.trainer import host_rss_mb

    rss = host_rss_mb()
    assert rss >= 0.0
    # this test process certainly holds more than 10 MB resident
    assert rss > 10.0
