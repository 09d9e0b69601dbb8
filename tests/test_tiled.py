"""Tiled sliding-window inference (predictor.tile_grid /
merge_tiled_objects / Predictor.predict_tiled) — grid coverage, dedup
semantics, and the end-to-end path on an oversized image."""

import numpy as np
import pytest
from PIL import Image

from structuredetector_tpu.annotations import ImageAnnotation, Keypoint, Object
from structuredetector_tpu.config import Config
from structuredetector_tpu.predictor import merge_tiled_objects, tile_grid


def test_tile_grid_covers_image():
    for img_w, img_h in [(512, 512), (1300, 700), (513, 1025), (100, 3000)]:
        corners = tile_grid(img_w, img_h, 512, 512, overlap=0.25)
        covered_x = set()
        covered_y = set()
        for x, y in corners:
            assert 0 <= x and 0 <= y
            assert x + 512 >= min(img_w, 512) and y + 512 >= min(img_h, 512)
            covered_x.update(range(x, x + 512))
            covered_y.update(range(y, y + 512))
        assert set(range(img_w)) <= covered_x or img_w <= 512
        assert set(range(img_h)) <= covered_y or img_h <= 512


def test_tile_grid_small_image_single_tile():
    assert tile_grid(100, 80, 512, 512) == [(0, 0)]


def test_tile_grid_flush_last_tile():
    corners = tile_grid(1000, 512, 512, 512, overlap=0.25)
    xs = sorted({x for x, _ in corners})
    assert xs[0] == 0 and xs[-1] == 1000 - 512
    # neighbor stride never exceeds (1 - overlap) * tile
    assert all(b - a <= 384 for a, b in zip(xs, xs[1:]))


def test_tile_grid_rejects_bad_overlap():
    with pytest.raises(ValueError):
        tile_grid(512, 512, 512, 512, overlap=1.0)


def _obj(name, x, y, score):
    return Object(name, Keypoint("stem", x, y, score=score))


def test_merge_tiled_objects_dedup():
    objs = [
        _obj("bean", 100.0, 100.0, 0.9),
        _obj("bean", 104.0, 103.0, 0.7),   # duplicate of the first
        _obj("maize", 101.0, 101.0, 0.8),  # other label: kept
        _obj("bean", 200.0, 100.0, 0.6),   # far away: kept
    ]
    kept = merge_tiled_objects(objs, radius=10.0)
    assert len(kept) == 3
    scores = sorted(o.anchor.score for o in kept)
    assert scores == [0.6, 0.8, 0.9]  # the 0.7 duplicate lost to 0.9


def test_merge_tiled_objects_chain_suppression():
    # B is within radius of A (kept, higher score); C is within radius
    # of B but not A — greedy keeps C because B was dropped
    objs = [
        _obj("bean", 0.0, 0.0, 0.9),
        _obj("bean", 8.0, 0.0, 0.8),
        _obj("bean", 16.0, 0.0, 0.7),
    ]
    kept = merge_tiled_objects(objs, radius=10.0)
    assert [o.anchor.score for o in kept] == [0.9, 0.7]


@pytest.mark.slow  # compiles the full model
def test_predict_tiled_end_to_end():
    from structuredetector_tpu.predictor import Predictor

    cfg = Config(width=64, height=64, max_objects=4, max_parts=8, fpn_depth=32,
                 use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    pred = Predictor(cfg)

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (150, 200, 3), np.uint8))
    ann = pred.predict_tiled(img, overlap=0.25, batch_size=4)
    assert isinstance(ann, ImageAnnotation)
    assert ann.img_size == (200, 150)
    # anchors landing outside the image (crop padding, or pushed out by
    # a random-init model's unbounded offset regression) are dropped
    for o in ann.objects:
        assert 0 <= o.x < 200 and 0 <= o.y < 150
    # dedup radius must leave no same-label pair closer than the radius
    r = cfg.dist_threshold * 64
    pts = [(o.name, o.x, o.y) for o in ann.objects]
    for i, (n1, x1, y1) in enumerate(pts):
        for n2, x2, y2 in pts[i + 1:]:
            if n1 == n2:
                assert np.hypot(x1 - x2, y1 - y2) >= r


def test_merge_grid_matches_bruteforce_fuzz():
    """The spatial-grid dedup must be decision-identical to the O(n^2)
    greedy reference on random inputs (incl. negative coords, radius
    edge cases)."""
    import math

    def brute(objects, radius):
        kept = []
        for obj in sorted(objects, key=lambda o: -(o.anchor.score or 0.0)):
            if not any(
                k.name == obj.name
                and math.hypot(k.anchor.x - obj.anchor.x,
                               k.anchor.y - obj.anchor.y) < radius
                for k in kept
            ):
                kept.append(obj)
        return kept

    rng = np.random.default_rng(42)
    for trial in range(50):
        n = int(rng.integers(0, 60))
        objs = [
            _obj(rng.choice(["bean", "maize"]),
                 float(rng.uniform(-50, 500)), float(rng.uniform(-50, 500)),
                 float(rng.uniform(0, 1)))
            for _ in range(n)
        ]
        radius = float(rng.choice([0.0, 1e-3, 7.5, 40.0, 300.0]))
        got = merge_tiled_objects(objs, radius)
        want = brute(objs, radius)
        assert [id(o) for o in got] == [id(o) for o in want], (trial, radius)
