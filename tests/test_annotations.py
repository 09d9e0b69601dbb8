"""Annotation data model: JSON round-trip, geometry, flips/clip."""

import json
import math

import pytest

from structuredetector_tpu.annotations import (
    Box,
    ImageAnnotation,
    Keypoint,
    Object,
    clip_annotation,
    dict_grouping,
    get_unique_color_map,
    hflip_annotation,
    vflip_annotation,
)


def make_annotation():
    anchor = Keypoint("stem", 10.0, 20.0, 0.9)
    parts = [Keypoint("leaf", 5.0, 8.0, 0.7), Keypoint("leaf", 30.0, 40.0, 0.6)]
    obj = Object("bean", anchor, parts, Box(1.0, 2.0, 50.0, 60.0))
    return ImageAnnotation("img_000.jpg", [obj], (100, 80))


def test_json_roundtrip(tmp_path):
    ann = make_annotation()
    path = ann.save_json(tmp_path)
    loaded = ImageAnnotation.from_json(path, anchor_name="stem")
    assert len(loaded) == 1
    obj = loaded.objects[0]
    assert obj.name == "bean"
    assert obj.anchor.kind == "stem"
    assert obj.anchor.x == 10.0 and obj.anchor.y == 20.0
    assert obj.nb_parts == 2
    assert obj.box.x_min == 1.0 and obj.box.y_max == 60.0
    assert loaded.img_size == (100, 80) or loaded.img_size == [100, 80]


def test_json_schema_shape(tmp_path):
    """Anchor is serialized as the first entry of 'parts' (utils.py:204-208)."""
    ann = make_annotation()
    path = ann.save_json(tmp_path)
    raw = json.loads(path.read_text())
    assert raw["objects"][0]["parts"][0]["kind"] == "stem"
    assert raw["objects"][0]["parts"][0]["location"] == {"x": 10.0, "y": 20.0}


def test_from_json_requires_unique_anchor(tmp_path):
    data = {
        "image_path": "x.jpg",
        "img_size": [10, 10],
        "objects": [
            {
                "label": "bean",
                "box": None,
                "parts": [
                    {"kind": "stem", "location": {"x": 1, "y": 1}, "score": None},
                    {"kind": "stem", "location": {"x": 2, "y": 2}, "score": None},
                ],
            }
        ],
    }
    f = tmp_path / "bad.json"
    f.write_text(json.dumps(data))
    with pytest.raises(ValueError):
        ImageAnnotation.from_json(f, anchor_name="stem")

    data["objects"][0]["parts"] = [
        {"kind": "leaf", "location": {"x": 1, "y": 1}, "score": None}
    ]
    f.write_text(json.dumps(data))
    with pytest.raises(ValueError):
        ImageAnnotation.from_json(f, anchor_name="stem")


def test_resize_scales_everything():
    ann = make_annotation().resized((100, 80), (50, 160))
    obj = ann.objects[0]
    assert obj.x == 5.0 and obj.y == 40.0
    assert obj.parts[0].x == 2.5 and obj.parts[0].y == 16.0
    assert obj.box.x_min == 0.5 and obj.box.y_min == 4.0


def test_keypoint_distance():
    a, b = Keypoint("k", 0, 0), Keypoint("k", 3, 4)
    assert a.distance(b) == pytest.approx(5.0)


def test_hflip_mirrors_x():
    ann = make_annotation()
    hflip_annotation(ann, (100, 80))
    obj = ann.objects[0]
    assert obj.x == 100 - 10 - 1
    assert obj.parts[0].x == 100 - 5 - 1
    # box min/max swap (utils.py:393-396)
    assert obj.box.x_min == 100 - 50 - 1
    assert obj.box.x_max == 100 - 1 - 1
    assert obj.box.x_min < obj.box.x_max


def test_vflip_mirrors_y():
    ann = make_annotation()
    vflip_annotation(ann, (100, 80))
    obj = ann.objects[0]
    assert obj.y == 80 - 20 - 1
    assert obj.box.y_min == 80 - 60 - 1


def test_clip_annotation_clamps():
    ann = make_annotation()
    ann.objects[0].x = -5.0
    ann.objects[0].parts[0].y = 500.0
    clip_annotation(ann, (100, 80))
    assert ann.objects[0].x == 0
    assert ann.objects[0].parts[0].y == 79


def test_box_helpers():
    b = Box(4, 2, 0, 8).standardized()
    assert (b.x_min, b.x_max) == (0, 4)
    assert b.x_mid == 2 and b.width == 4 and b.height == 6
    assert Box.from_json(None) is None
    # resized works (the reference's was broken, utils.py:97)
    r = Box(0, 0, 10, 10).resized((10, 10), (20, 20))
    assert r.x_max == 20


def test_nb_parts_and_props():
    ann = make_annotation()
    assert ann.nb_parts == 2
    assert not ann.is_empty
    assert ann.image_stem == "img_000"


def test_dict_grouping_and_colors():
    groups = dict_grouping([1, 2, 3, 4], key=lambda v: v % 2)
    assert groups[0] == [2, 4] and groups[1] == [1, 3]
    cmap = get_unique_color_map(["bean", "maize"])
    assert set(cmap) == {"bean", "maize"}
    assert all(len(v) == 3 for v in cmap.values())
    assert cmap == get_unique_color_map(["bean", "maize"])  # deterministic
