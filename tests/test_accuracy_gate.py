"""The accuracy-gate tooling: `--save_summary` on both eval CLIs and the
checkpoint-vs-export comparison driver (`tools/accuracy_gate.py`),
which mirrors the reference's export-validation loop
(/root/reference/src/sdnet/cli/evaluate_coreml.py:125-130)."""

import json
import sys
from pathlib import Path

import pytest

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.models.network import save_params

sys.path.insert(0, str(Path(__file__).parent))
from test_trainer_integration import write_dataset  # noqa: E402

pytestmark = pytest.mark.slow  # compile-heavy: CLI round trips


@pytest.fixture(scope="module")
def gate_env(tmp_path_factory):
    root = tmp_path_factory.mktemp("gate")
    write_dataset(root / "train", 4, seed=1)
    # 3 valid images with batch_size 2: the ragged final batch must be
    # padded against static-shape .sdz artifacts (regression: the gate
    # crashed on any valid set not divisible by the artifact batch)
    write_dataset(root / "valid", 3, seed=2)
    (root / "labels.json").write_text(
        json.dumps({"labels": ["bean", "maize"], "parts": ["leaf"]})
    )
    cfg = Config(width=32, height=32, fpn_depth=16, max_objects=4,
                 max_parts=8, use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.anchor_name = "stem"
    _, variables = init_model(cfg)
    ckpt = root / "model.msgpack"
    save_params(variables, ckpt)
    return root, ckpt


def test_evaluate_cli_save_summary(gate_env, tmp_path):
    from structuredetector_tpu.cli import evaluate

    root, ckpt = gate_env
    out = tmp_path / "summary.json"
    evaluate.main([
        "--valid_dir", str(root / "valid"), "--load_model", str(ckpt),
        "--labels", str(root / "labels.json"), "--anchor_name", "stem",
        "--width", "32", "--height", "32", "--fpn_depth", "16",
        "--max_objects", "4", "--max_parts", "8", "--no_amp",
        "--save_summary", str(out),
    ])
    s = json.loads(out.read_text())
    for fam in ("anchor", "part", "kps", "csi", "classif"):
        assert f"{fam}/f1_total" in s
        assert f"{fam}/csi_total" in s


def test_evaluate_cli_conf_sweep(gate_env, tmp_path, capsys):
    """--conf_sweep: one forward pass, per-threshold summaries; at the
    same threshold the sweep path must reproduce the single-run path
    exactly (same decode + accumulation, just looped)."""
    from structuredetector_tpu.cli import evaluate

    root, ckpt = gate_env
    base_args = [
        "--valid_dir", str(root / "valid"), "--load_model", str(ckpt),
        "--labels", str(root / "labels.json"), "--anchor_name", "stem",
        "--width", "32", "--height", "32", "--fpn_depth", "16",
        "--max_objects", "4", "--max_parts", "8", "--no_amp",
    ]
    single = tmp_path / "single.json"
    evaluate.main(base_args + ["--conf_threshold", "0.5",
                               "--save_summary", str(single)])
    swept = tmp_path / "swept.json"
    evaluate.main(base_args + ["--conf_sweep", "0.5,0.3",
                               "--save_summary", str(swept)])
    s_single = json.loads(single.read_text())
    s_swept = json.loads(swept.read_text())
    assert set(s_swept) == {"0.5", "0.3"}
    assert s_swept["0.5"] == s_single

    # operating-point readout: the printed argmax must agree with the
    # saved summaries (ties resolve to the earliest threshold listed)
    out = capsys.readouterr().out
    for fam in ("kps", "anchor"):
        best = max(("0.5", "0.3"),
                   key=lambda t: s_swept[t].get(f"{fam}/f1_total", 0.0))
        expect = (f"best {fam} F1: "
                  f"{s_swept[best].get(f'{fam}/f1_total', 0.0):.4f} "
                  f"at conf={float(best):g}")
        assert expect in out, f"missing/incorrect line: {expect!r}\n{out}"


def test_accuracy_gate_driver(gate_env, tmp_path, monkeypatch):
    """Full driver: 4 modes through the real CLIs, one table out — and
    the structural floors (round 4) MUST fail a random-weight
    checkpoint: a structure detector's gate is self-deceiving if it
    passes when no structure is detected. The JSON payload is written
    before the non-zero exit so supervisors can read the verdict."""
    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    import accuracy_gate

    root, ckpt = gate_env
    out = tmp_path / "gate.json"
    monkeypatch.chdir(tmp_path)

    with pytest.raises(SystemExit) as exc:
        accuracy_gate.main([
            str(ckpt), "--valid_dir", str(root / "valid"),
            "--train_dir", str(root / "train"),
            "--labels", str(root / "labels.json"), "--anchor_name", "stem",
            "-W", "32", "-H", "32", "--fpn_depth", "16",
            "--max_objects", "4", "--max_parts", "8",
            "--batch_size", "2", "--calibrate_images", "2",
            "--out", str(out),
        ])
    assert exc.value.code == 1

    payload = json.loads(out.read_text())
    assert payload["gate"].startswith("FAIL")
    assert "csi/f1_total" in payload["gate"]  # structural floor enforced
    assert set(payload["summaries"]) == {
        "checkpoint_bf16", "sdz_float", "int8_dynamic", "int8_static"}
    for s in payload["summaries"].values():
        assert "kps/f1_total" in s
    assert "| int8_static |" in payload["table"]


def test_check_floors_skips_inapplicable_metrics():
    """An absent metric (e.g. grouping/accuracy on a parts-free
    dataset) must be skipped, not treated as 0.0 and failed."""
    from tools.accuracy_gate import check_floors

    floors = {"kps/f1_total": 0.7, "grouping/accuracy": 0.8}
    skipped, failures = check_floors({"kps/f1_total": 0.9}, floors)
    assert skipped == ["grouping/accuracy"]
    assert failures == []
    skipped, failures = check_floors(
        {"kps/f1_total": 0.5, "grouping/accuracy": 0.9}, floors)
    assert skipped == [] and len(failures) == 1
    assert "kps/f1_total" in failures[0]
