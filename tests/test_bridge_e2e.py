"""Full-fidelity torch-bridge rehearsal.

Round-3 verdict: the bridge was pinned only against synthetic
state_dicts — no real torch graph had ever flowed through. Here the
reference's actual `Network` (torch, NCHW — /root/reference/src/sdnet/
model/network.py:32-87) is instantiated on a torchvision-layout
ResNet-34 (tests/_torch_resnet.py), its `state_dict()` is saved as a
real `.pth`, and:

1. our bridged Flax model must produce the SAME forward outputs on the
   same input (the strongest bridge property — key mapping, NCHW->NHWC
   layout, BN stats, and FPN arithmetic all have to be right at once);
2. the user-facing CLI journey (`evaluate --load_model ref.pth`,
   `train --load_model ref.pth`) must run end-to-end.

This shrinks the egress-blocked ImageNet-warm-start risk to "torchvision
renames its published keys".
"""

import json

import numpy as np
import pytest

from tests._reference import REFERENCE_SRC, _install_torchvision_stub
from tests._torch_resnet import randomize_, resnet34


def load_reference_network():
    """Import the reference `Network` with a FUNCTIONAL resnet34 stub."""
    import sys

    _install_torchvision_stub()
    sys.modules["torchvision.models"].resnet34 = resnet34
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)
    from sdnet.model import network as ref_network

    # The reference binds `from torchvision.models import resnet34` at
    # module scope; if another test already imported sdnet.model with the
    # inert stub (lambda -> None), that local name is frozen — rebind it
    # so this test is order-independent.
    ref_network.resnet34 = resnet34
    return ref_network


def make_ref_pth(cfg, tmp_path, seed=0):
    import torch

    from types import SimpleNamespace

    ref_network = load_reference_network()
    args = SimpleNamespace(
        labels=list(cfg.labels.keys()), parts=list(cfg.parts.keys()),
        fpn_depth=cfg.fpn_depth,
    )
    net = ref_network.Network(args, pretrained=False)
    randomize_(net, seed=seed)
    net.eval()
    path = tmp_path / "reference_model.pth"
    torch.save(net.state_dict(), str(path))
    return net, path


@pytest.fixture
def cfg():
    from structuredetector_tpu.config import Config

    c = Config(width=64, height=64, fpn_depth=128, use_amp=False,
               max_objects=4, max_parts=8, batch_size=2)
    c.set_labels(["bean", "maize"], ["leaf"])
    c.anchor_name = "stem"
    return c


def test_bridge_forward_parity_with_reference_graph(cfg, tmp_path):
    """reference torch forward == bridged Flax forward, same .pth."""
    import torch

    import jax.numpy as jnp
    from structuredetector_tpu.models.network import init_model, resolve_variables
    from structuredetector_tpu.train.steps import make_forward

    net, pth = make_ref_pth(cfg, tmp_path, seed=3)

    model, variables = init_model(cfg)
    variables = resolve_variables(pth, variables)
    forward = make_forward(model)

    rng = np.random.default_rng(5)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = forward(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    for key in ("anchor_hm", "part_hm", "offsets", "embeddings"):
        theirs = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        mine = np.asarray(ours[key], np.float32)
        assert mine.shape == theirs.shape, key
        np.testing.assert_allclose(
            mine, theirs, rtol=1e-3, atol=1e-4,
            err_msg=f"bridged forward diverges on {key}",
        )


@pytest.mark.slow
def test_cli_journey_with_reference_pth(cfg, tmp_path, monkeypatch):
    """evaluate + train warm-start through the console entry points with
    a real reference-graph .pth (the user migration path)."""
    from tests.test_trainer_integration import write_dataset

    from structuredetector_tpu.cli import evaluate, train

    _, pth = make_ref_pth(cfg, tmp_path, seed=4)
    write_dataset(tmp_path / "train", 4, seed=1)
    write_dataset(tmp_path / "valid", 2, seed=2)
    labels = tmp_path / "labels.json"
    labels.write_text(json.dumps({"labels": ["bean", "maize"],
                                  "parts": ["leaf"]}))
    monkeypatch.chdir(tmp_path)

    common = [
        "--labels", str(labels), "--anchor_name", "stem",
        "--width", "64", "--height", "64", "--fpn_depth", "128",
        "--max_objects", "4", "--max_parts", "8",
    ]
    summary = tmp_path / "summary.json"
    evaluate.main([
        "--valid_dir", str(tmp_path / "valid"),
        "--load_model", str(pth),
        "--save_summary", str(summary), *common,
    ])
    assert "kps/f1_total" in json.loads(summary.read_text())

    train.main([
        "--train_dir", str(tmp_path / "train"),
        "--valid_dir", str(tmp_path / "valid"),
        "--load_model", str(pth),
        "--epochs", "1", "--batch_size", "2", "--no_augmentation",
        *common,
    ])
    import glob

    runs = sorted(glob.glob(str(tmp_path / "trainings" / "*")))
    assert runs, "train produced no run directory"
