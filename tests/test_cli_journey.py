"""Console-script glue journeys for the CLIs no other suite drives
end-to-end: `detect`, `convert_export`, `evaluate_export`, and the
`serve` argument contract. The underlying library paths each have their
own suites (predictor, export, serve, evaluator); what THIS file pins
is the arg-parsing + wiring layer — exactly where round-4's
`--native_io --no_augmentation` crash lived.

Reference counterparts: cli/detect.py, cli/convert_coreml.py,
cli/evaluate_coreml.py (the reference never tests them at all).
"""

import json

import pytest

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.models.network import save_params

from tests.test_trainer_integration import write_dataset

pytestmark = pytest.mark.slow  # full-model compiles


@pytest.fixture
def workspace(tmp_path):
    """Dataset + labels file + a saved (random-weight) checkpoint."""
    write_dataset(tmp_path / "valid", 3, seed=5)
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["bean", "maize"],
                                  "parts": ["leaf"]}))
    cfg = Config(width=32, height=32, fpn_depth=16, max_objects=4,
                 max_parts=8, use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    _, variables = init_model(cfg)
    ckpt = tmp_path / "model.msgpack"
    save_params(variables, ckpt)
    return tmp_path, labels, ckpt


COMMON = ["--anchor_name", "stem", "--width", "32", "--height", "32",
          "--fpn_depth", "16", "--max_objects", "4", "--max_parts", "8"]


def test_detect_cli_writes_predictions(workspace, monkeypatch):
    from structuredetector_tpu.cli import detect

    tmp_path, labels, ckpt = workspace
    monkeypatch.chdir(tmp_path)
    detect.main([
        "--valid_dir", str(tmp_path / "valid"),
        "--load_model", str(ckpt), "--labels", str(labels),
        "--conf_threshold", "0.0",  # random weights: keep detections
        *COMMON,
    ])

    out = tmp_path / "predictions"
    jsons = sorted(out.glob("*.json"))
    overlays = [p for p in out.iterdir() if p.suffix in (".jpg", ".png")]
    assert len(jsons) == 3 and len(overlays) == 3
    ann = json.loads(jsons[0].read_text())
    # reference annotation schema, original (pre-resize) coordinates
    assert ann["img_size"] == [80, 64]
    for obj in ann["objects"]:
        assert obj["label"] in ("bean", "maize")
        assert {p["kind"] for p in obj["parts"]} <= {"stem", "leaf"}


def test_convert_then_evaluate_export_cli(workspace, tmp_path):
    from structuredetector_tpu.cli import convert_export, evaluate_export

    root, labels, ckpt = workspace
    sdz = tmp_path / "model.sdz"
    convert_export.main([
        str(ckpt), "-o", str(sdz), "--params", str(labels),
        "--width", "32", "--height", "32", "--fpn-depth", "16",
        "--anchor_name", "stem", "--batch_size", "2",
    ])
    assert sdz.exists() and sdz.stat().st_size > 0

    summary = tmp_path / "summary.json"
    evaluate_export.main([
        str(sdz), "--valid_dir", str(root / "valid"),
        "--anchor_name", "stem", "--max_objects", "4", "--max_parts", "8",
        "--save_summary", str(summary),
    ])
    metrics = json.loads(summary.read_text())
    assert "kps/f1_total" in metrics


def test_serve_cli_argument_contract(tmp_path):
    """--artifact rejects stray model flags (decode params come from the
    artifact metadata); checkpoint mode without --load_model refuses to
    start instead of serving random weights."""
    from structuredetector_tpu.cli import serve as serve_cli

    with pytest.raises(SystemExit, match="artifact"):
        serve_cli.main(["--artifact", str(tmp_path / "x.sdz"),
                        "--width", "64"])

    with pytest.raises(AssertionError, match="No model to serve"):
        serve_cli.main([])
