"""Backbone families (resnet18/resnet50): shapes, param parity with the
torchvision trunks, and the torchvision weight bridge."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.models.network import init_model
from structuredetector_tpu.models.resnet import ARCHS


pytestmark = pytest.mark.slow  # compile-heavy: full encoder inits/forwards


def _cfg(tiny_config, backbone):
    return dataclasses.replace(tiny_config, backbone=backbone)


@pytest.mark.parametrize("backbone", ["resnet18", "resnet50"])
def test_backbone_output_shapes(tiny_config, backbone):
    model, variables = init_model(_cfg(tiny_config, backbone))
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["anchor_hm"].shape == (1, 16, 16, 2)  # stride 4
    assert out["offsets"].shape == (1, 16, 16, 2)


@pytest.mark.parametrize(
    "backbone,want",
    [
        # torchvision totals minus the fc head (in_feat*1000 + 1000):
        # resnet18: 11,689,512 - 513,000; resnet50: 25,557,032 - 2,049,000
        ("resnet18", 11_176_512),
        ("resnet50", 23_508_032),
    ],
)
def test_backbone_param_counts(tiny_config, backbone, want):
    _, variables = init_model(_cfg(tiny_config, backbone))
    enc = variables["params"]["encoder"]
    n = sum(x.size for x in jax.tree.leaves(enc))
    assert n == want


def _fake_torchvision_sd(variables):
    """Reverse our encoder params into a torchvision-style state_dict
    (numpy) — the bridge accepts plain numpy dicts."""
    sd = {}

    def put_conv(key, kernel):
        sd[key] = np.transpose(np.asarray(kernel), (3, 2, 0, 1))

    def put_bn(prefix, bn_params, bn_stats):
        sd[f"{prefix}.weight"] = np.asarray(bn_params["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bn_params["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(bn_stats["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(bn_stats["var"])

    p, s = variables["params"]["encoder"], variables["batch_stats"]["encoder"]
    put_conv("conv1.weight", p["conv1"]["kernel"])
    put_bn("bn1", p["bn1"], s["bn1"])
    for name in p:
        if not name.startswith("layer"):
            continue
        stage_block = name[len("layer"):]
        tname = f"layer{stage_block.replace('_', '.')}"
        for sub in p[name]:
            if sub.startswith("conv"):
                put_conv(f"{tname}.{sub}.weight", p[name][sub]["kernel"])
            elif sub.startswith("bn"):
                put_bn(f"{tname}.{sub}", p[name][sub], s[name][sub])
            elif sub == "downsample_conv":
                put_conv(f"{tname}.downsample.0.weight", p[name][sub]["kernel"])
            elif sub == "downsample_bn":
                put_bn(f"{tname}.downsample.1", p[name][sub], s[name][sub])
    return sd


@pytest.mark.parametrize("backbone", ["resnet18", "resnet34", "resnet50"])
def test_torchvision_bridge_all_families(tiny_config, backbone):
    """convert_encoder auto-detects the family and reproduces the exact
    variable structure; a warm-started model computes identically."""
    from structuredetector_tpu.models.torch_bridge import convert_encoder, warm_start_encoder

    model, variables = init_model(_cfg(tiny_config, backbone))
    sd = _fake_torchvision_sd(variables)
    bridged = convert_encoder(sd, style="torchvision")

    want = {"params": variables["params"]["encoder"],
            "batch_stats": variables["batch_stats"]["encoder"]}
    assert (jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, bridged))
            == jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, want)))

    grafted = warm_start_encoder(variables, bridged)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    a = model.apply(variables, x, train=False)
    b = model.apply(grafted, x, train=False)
    np.testing.assert_allclose(
        np.asarray(a["anchor_hm"]), np.asarray(b["anchor_hm"]), atol=1e-6
    )


def test_unknown_backbone_rejected(tiny_config):
    cfg = dataclasses.replace(tiny_config, backbone="resnet101")
    with pytest.raises(ValueError, match="backbone"):
        cfg.validate()
    assert set(ARCHS) == {"resnet18", "resnet34", "resnet50"}


@pytest.mark.parametrize("backbone", ["resnet50"])
def test_backbone_train_step_runs(tiny_config, backbone):
    """Bottleneck blocks train: one grad step moves the loss."""
    import optax

    from structuredetector_tpu.train.state import TrainState
    from structuredetector_tpu.train.steps import make_train_step

    cfg = _cfg(tiny_config, backbone)
    model, variables = init_model(cfg)
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.int32(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, cfg, tx, out_h=16, out_w=16, donate=False)
    images = jax.random.uniform(jax.random.PRNGKey(0), (2, 64, 64, 3))
    kp = {
        "anchors_xy": jnp.ones((2, cfg.max_objects, 2)) * 4,
        "anchor_cls": jnp.zeros((2, cfg.max_objects), jnp.int32),
        "anchor_mask": jnp.zeros((2, cfg.max_objects), bool).at[:, 0].set(True),
        "parts_xy": jnp.ones((2, cfg.max_parts, 2)) * 6,
        "part_kind": jnp.zeros((2, cfg.max_parts), jnp.int32),
        "part_owner_xy": jnp.ones((2, cfg.max_parts, 2)) * 4,
        "part_mask": jnp.zeros((2, cfg.max_parts), bool).at[:, 0].set(True),
    }
    st1, stats1 = step(state, images, kp)
    st2, stats2 = step(st1, images, kp)
    assert np.isfinite(float(stats1["total_loss"]))
    assert float(stats2["total_loss"]) < float(stats1["total_loss"])
