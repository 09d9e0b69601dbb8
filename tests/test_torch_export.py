"""Reverse-bridge pin: our pytree -> reference-layout `.pth`.

The export must load into the reference's actual torch `Network`
(strict state_dict — `/root/reference/src/sdnet/cli/evaluate.py:31`)
and produce the SAME forward outputs, which is the property the
cross-framework parity evidence (tools/cross_parity.py) rests on.
"""

import numpy as np
import pytest

from tests.test_bridge_e2e import cfg, load_reference_network  # noqa: F401


def _nontrivial_variables(cfg, seed=7):
    """Init our model and perturb BN stats so a layout/stat-mapping bug
    can't hide behind fresh mean=0/var=1."""
    import jax

    from structuredetector_tpu.models.network import init_model

    model, variables = init_model(cfg)
    rng = np.random.default_rng(seed)
    variables = jax.tree.map(lambda x: x, variables)  # unfreeze copy

    def perturb(tree):
        for k, v in tree.items():
            if isinstance(v, dict):
                perturb(v)
            elif k == "mean":
                tree[k] = np.asarray(rng.normal(0, 0.1, v.shape), v.dtype)
            elif k == "var":
                tree[k] = np.asarray(rng.uniform(0.75, 1.25, v.shape), v.dtype)

    perturb(variables["batch_stats"])
    return model, variables


def test_export_key_set_matches_reference_exactly(cfg, tmp_path):
    import torch

    from types import SimpleNamespace

    from structuredetector_tpu.models.torch_export import save_reference_pth

    ref_network = load_reference_network()
    args = SimpleNamespace(labels=list(cfg.labels.keys()),
                           parts=list(cfg.parts.keys()),
                           fpn_depth=cfg.fpn_depth)
    ref_net = ref_network.Network(args, pretrained=False)

    _, variables = _nontrivial_variables(cfg)
    pth = tmp_path / "ours.pth"
    save_reference_pth(variables, str(pth))
    sd = torch.load(str(pth), map_location="cpu", weights_only=True)

    assert set(sd.keys()) == set(ref_net.state_dict().keys())
    for k, v in ref_net.state_dict().items():
        assert tuple(sd[k].shape) == tuple(v.shape), k
    # strict load must succeed
    ref_net.load_state_dict(sd)


def test_export_forward_parity_into_reference_graph(cfg, tmp_path):
    """our forward == reference torch forward after export."""
    import torch

    import jax.numpy as jnp
    from structuredetector_tpu.models.torch_export import save_reference_pth
    from structuredetector_tpu.train.steps import make_forward

    from types import SimpleNamespace

    model, variables = _nontrivial_variables(cfg, seed=11)
    pth = tmp_path / "ours.pth"
    save_reference_pth(variables, str(pth))

    ref_network = load_reference_network()
    args = SimpleNamespace(labels=list(cfg.labels.keys()),
                           parts=list(cfg.parts.keys()),
                           fpn_depth=cfg.fpn_depth)
    ref_net = ref_network.Network(args, pretrained=False)
    ref_net.load_state_dict(
        torch.load(str(pth), map_location="cpu", weights_only=True))
    ref_net.eval()

    forward = make_forward(model)
    rng = np.random.default_rng(13)
    x = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)

    ours = forward(variables, jnp.asarray(x))
    with torch.no_grad():
        ref = ref_net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2))))

    for key in ("anchor_hm", "part_hm", "offsets", "embeddings"):
        theirs = np.transpose(ref[key].numpy(), (0, 2, 3, 1))
        mine = np.asarray(ours[key], np.float32)
        assert mine.shape == theirs.shape, key
        np.testing.assert_allclose(
            mine, theirs, rtol=1e-3, atol=1e-4,
            err_msg=f"exported forward diverges on {key}",
        )


def test_export_rejects_deep_head(cfg):
    from structuredetector_tpu.models.torch_export import (
        export_sdnet_state_dict,
    )

    cfg.head_conv = 64
    try:
        from structuredetector_tpu.models.network import init_model

        _, variables = init_model(cfg)
    finally:
        cfg.head_conv = 0
    assert "head_hidden" in variables["params"], "deep head not materialized"
    with pytest.raises(ValueError, match="head"):
        export_sdnet_state_dict(variables)
