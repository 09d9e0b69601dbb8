"""Config: validation, label forms, CLI parsing (reference args.py parity)."""

import json

import pytest

from structuredetector_tpu.config import Config, config_from_args


def test_defaults_match_reference():
    """Reference defaults (args.py:17-175)."""
    d = Config()
    assert (d.width, d.height) == (512, 512)
    assert d.fpn_depth == 128
    assert d.batch_size == 8 and d.epochs == 100
    assert d.learning_rate == 1e-3 and d.lr_step == 3
    assert d.down_ratio == 4.0
    assert d.hm_loss_fn == "mse"
    assert (d.max_objects, d.max_parts) == (20, 40)
    assert (d.hm_weight, d.offset_weight, d.embedding_weight) == (1.0, 1e-3, 1e-3)
    assert d.sigma_gauss == 0.1
    assert d.conf_threshold == 0.5
    assert d.dist_threshold == 0.05
    assert d.decoder_dist_thresh == 0.1
    assert d.csi_threshold == 0.75
    assert d.anchor_name == "anchor"
    assert d.seed == 926354916  # args.py:257


def test_validation_rejects_bad_values():
    for kw in ({"width": 100}, {"height": 0}, {"conf_threshold": 1.5},
               {"sigma_gauss": 0.0}, {"max_objects": 0}):
        with pytest.raises(AssertionError):
            Config(**kw).validate()
    with pytest.raises(ValueError):
        Config(hm_loss_fn="huber").validate()


def test_label_forms():
    """list / dict / scalar label forms (args.py:227-239)."""
    c = Config().set_labels(["a", "b"], ["x"])
    assert c.labels == {"a": 0, "b": 1} and c.parts == {"x": 0}
    c = Config().set_labels({"a": 3}, "solo")
    assert c.labels == {"a": 3} and c.parts == {"solo": 0}
    assert c.r_labels == {3: "a"}
    assert c.out_channels == 1 + 1 + 4


def test_lr_step_epochs():
    assert Config(epochs=100, lr_step=3).lr_step_epochs() == 33
    assert Config(epochs=100, lr_step=0).lr_step_epochs() == 100  # never


def test_grid_size():
    c = Config(width=512, height=256)
    assert c.grid_size() == (128, 64)
    assert c.grid_size((64, 96)) == (16, 24)


def test_cli_parse_roundtrip(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["bean", "maize"], "parts": ["leaf"]}))
    cfg = config_from_args([
        "--train_dir", str(tmp_path), "--labels", str(labels),
        "--anchor_name", "stem", "--width", "256", "--height", "256",
        "--batch_size", "4", "--epochs", "7", "--hm_loss_fn", "focal",
        "--conf_threshold", "0.4", "--no_amp", "--eval_batch_size", "8",
        "--model_parallel", "2", "--malloc_trim",
    ])
    assert cfg.anchor_name == "stem"
    assert cfg.width == 256 and cfg.batch_size == 4 and cfg.epochs == 7
    assert cfg.hm_loss_fn == "focal" and cfg.conf_threshold == 0.4
    assert not cfg.use_amp
    assert cfg.eval_batch_size == 8 and cfg.model_parallel == 2
    assert cfg.malloc_trim
    assert cfg.labels == {"bean": 0, "maize": 1}
    assert cfg.n_parts == 1


def test_cli_short_flags(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["a"], "parts": ["p"]}))
    cfg = config_from_args(["-m", str(labels), "-s", "root", "-W", "64",
                            "-H", "64", "-b", "2", "-e", "5", "-t", "0.3"])
    assert cfg.anchor_name == "root" and cfg.conf_threshold == 0.3
    assert cfg.width == 64 and cfg.epochs == 5


def test_amp_flags_conflict(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["a"], "parts": ["p"]}))
    with pytest.raises(SystemExit):
        config_from_args(["-m", str(labels), "--amp", "--no_amp"])
    # each flag alone is fine and effective
    assert config_from_args(["-m", str(labels), "--amp"]).use_amp
    assert not config_from_args(["-m", str(labels), "--no_amp"]).use_amp


def test_pretrained_flag_parses(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["a"], "parts": ["p"]}))
    assert config_from_args(["-m", str(labels), "--pretrained"]).pretrained_backbone
    assert not config_from_args(["-m", str(labels)]).pretrained_backbone


def test_backbone_and_stem_flags(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["a"], "parts": ["p"]}))
    cfg = config_from_args(["-m", str(labels), "--backbone", "resnet50", "--s2d_stem"])
    assert cfg.backbone == "resnet50" and cfg.s2d_stem
    default = config_from_args(["-m", str(labels)])
    assert default.backbone == "resnet34" and not default.s2d_stem
    with pytest.raises(SystemExit):  # argparse choices
        config_from_args(["-m", str(labels), "--backbone", "resnet101"])


def test_native_io_flags(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["a"], "parts": ["p"]}))
    default = config_from_args(["-m", str(labels)])
    assert default.native_io and not default.native_io_fast
    off = config_from_args(["-m", str(labels), "--no_native_io"])
    assert not off.native_io
    fast = config_from_args(["-m", str(labels), "--native_io_fast"])
    assert fast.native_io and fast.native_io_fast
    # fast implies native even after an explicit --no_native_io
    both = config_from_args(["-m", str(labels), "--no_native_io", "--native_io_fast"])
    assert both.native_io and both.native_io_fast


def test_repo_ships_example_labels_json():
    """The default labels_path must resolve against a real example file
    (the reference ships labels.json:1-4)."""
    import pathlib

    repo_labels = pathlib.Path(__file__).parent.parent / "labels.json"
    data = json.loads(repo_labels.read_text())
    assert data["labels"] == ["bean", "maize"]
    assert data["parts"] == ["leaf"]


def test_find_imagenet_resnet34_search(tmp_path, monkeypatch):
    from structuredetector_tpu.models.torch_bridge import find_imagenet_resnet34

    monkeypatch.delenv("SDNET_PRETRAINED", raising=False)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))
    with pytest.raises(FileNotFoundError, match="resnet34"):
        find_imagenet_resnet34()

    ckpt = tmp_path / "hub" / "checkpoints" / "resnet34-b627a593.pth"
    ckpt.parent.mkdir(parents=True)
    ckpt.touch()
    assert find_imagenet_resnet34() == ckpt

    explicit = tmp_path / "custom.pth"
    explicit.touch()
    monkeypatch.setenv("SDNET_PRETRAINED", str(explicit))
    assert find_imagenet_resnet34() == explicit

    monkeypatch.setenv("SDNET_PRETRAINED", str(tmp_path / "missing.pth"))
    with pytest.raises(FileNotFoundError, match="SDNET_PRETRAINED"):
        find_imagenet_resnet34()


def test_conf_sweep_parses_and_validates(tmp_path):
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["bean", "maize"], "parts": ["leaf"]}))
    base = ["--train_dir", str(tmp_path), "--labels", str(labels),
            "--anchor_name", "stem"]
    cfg = config_from_args(base + ["--conf_sweep", "0.2,0.3,0.45"])
    assert cfg.conf_sweep == (0.2, 0.3, 0.45)
    assert config_from_args(base).conf_sweep is None
    with pytest.raises(AssertionError, match="conf_sweep"):
        config_from_args(base + ["--conf_sweep", "0.2,1.5"])
