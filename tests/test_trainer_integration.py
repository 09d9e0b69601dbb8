"""Trainer end-to-end on a tiny on-disk dataset (CPU, ~1 min)."""

import json
import os

import numpy as np
import pytest
from PIL import Image, ImageDraw

from structuredetector_tpu.config import Config


def write_dataset(root, n, seed=0):
    rng = np.random.default_rng(seed)
    root.mkdir(parents=True, exist_ok=True)
    for i in range(n):
        W, H = 80, 64
        img = Image.new("RGB", (W, H), (40, 120, 40))
        d = ImageDraw.Draw(img)
        objs = []
        for _ in range(int(rng.integers(1, 3))):
            ax, ay = int(rng.integers(10, W - 10)), int(rng.integers(10, H - 10))
            d.ellipse([ax - 4, ay - 4, ax + 4, ay + 4], fill=(200, 60, 60))
            parts = [{"kind": "stem", "location": {"x": ax, "y": ay}, "score": None}]
            px, py = ax + 8, ay + 6
            d.ellipse([px - 2, py - 2, px + 2, py + 2], fill=(220, 220, 60))
            parts.append({"kind": "leaf", "location": {"x": px, "y": py}, "score": None})
            objs.append({"label": "bean", "box": None, "parts": parts})
        img.save(root / f"im_{i}.jpg")
        (root / f"im_{i}.json").write_text(json.dumps({
            "image_path": str(root / f"im_{i}.jpg"),
            "img_size": [W, H], "objects": objs}))


@pytest.fixture
def dataset_dirs(tmp_path):
    write_dataset(tmp_path / "train", 6, seed=1)
    write_dataset(tmp_path / "valid", 2, seed=2)
    return tmp_path


def make_config(dataset_dirs, **kw):
    kw = {
        "train_dir": dataset_dirs / "train", "valid_dir": dataset_dirs / "valid",
        "width": 32, "height": 32, "fpn_depth": 16, "max_objects": 4,
        "max_parts": 8, "batch_size": 2, "epochs": 2, "use_amp": False,
        "no_augmentation": True, "conf_threshold": 0.3, **kw,
    }
    cfg = Config(**kw)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    return cfg


def test_trainer_full_loop(dataset_dirs, monkeypatch, tmp_path):
    from structuredetector_tpu.train import Trainer

    monkeypatch.chdir(tmp_path)  # trainings/ written here
    cfg = make_config(dataset_dirs)
    trainer = Trainer(cfg, log=False)
    trainer.train()

    # orbax state + at least the best-loss snapshot exist
    assert (trainer.save_dir / "model_best_loss.msgpack").exists()
    assert trainer.checkpoints.latest_step() is not None
    assert int(trainer.state.step) == 2 * len(trainer.train_loader)

    # resume restores the saved step (full-Trainer resume path; the
    # checkpoint round-trip itself is covered in test_train.py)
    restored = trainer.checkpoints.restore_state(
        __import__("jax").device_get(trainer.state)
    )
    assert int(restored.step) == int(trainer.state.step)

    # valid() produces a metric summary dict
    summary = trainer.valid()
    assert "kps/f1_total" in summary

    # one compiled step per distinct resolution bucket, all x32 shapes
    # (with no_augmentation there is exactly the base bucket; multiscale
    # re-rolling itself is covered in tests/test_augment.py)
    assert len(trainer._train_steps) >= 1
    for (h, w) in trainer._train_steps:
        assert h % 32 == 0 and w % 32 == 0
