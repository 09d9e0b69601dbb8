"""Model: shapes, parameter structure, bridge compatibility."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.models.network import SDNet, init_model, upsample2x_nearest



pytestmark = pytest.mark.slow  # compile-heavy: full ResNet34-FPN inits/forwards


def test_upsample2x_nearest():
    x = jnp.arange(4.0).reshape(1, 2, 2, 1)
    y = np.asarray(upsample2x_nearest(x))[0, :, :, 0]
    want = np.array([[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]], float)
    np.testing.assert_array_equal(y, want)


def test_model_output_shapes(tiny_config):
    model, variables = init_model(tiny_config)
    x = jnp.zeros((2, 64, 64, 3))
    out = model.apply(variables, x, train=False)
    # stride 4: 64 -> 16 (network.py:72-84)
    assert out["anchor_hm"].shape == (2, 16, 16, 2)
    assert out["part_hm"].shape == (2, 16, 16, 1)
    assert out["offsets"].shape == (2, 16, 16, 2)
    assert out["embeddings"].shape == (2, 16, 16, 2)


def test_model_raw_output(tiny_config):
    model, variables = init_model(tiny_config)
    x = jnp.zeros((1, 64, 64, 3))
    raw = model.apply(variables, x, train=False, raw_output=True)
    assert raw.shape == (1, 16, 16, 2 + 1 + 4)


def test_model_train_mode_updates_batch_stats(tiny_config):
    model, variables = init_model(tiny_config)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 64, 3))
    out, mutated = model.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = variables["batch_stats"]["encoder"]["bn1"]["mean"]
    new = mutated["batch_stats"]["encoder"]["bn1"]["mean"]
    assert not np.allclose(np.asarray(old), np.asarray(new))


def test_resnet34_param_count():
    """Full-width encoder matches torchvision resnet34 trunk (~21.28M
    params sans fc): conv+bn params only."""
    model = SDNet(n_labels=2, n_parts=1, fpn_depth=128)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), train=False)
    enc = variables["params"]["encoder"]
    n = sum(x.size for x in jax.tree.leaves(enc))
    # torchvision resnet34 totals 21,797,672 params; minus the fc head
    # (512*1000+1000 = 513,000) the conv trunk is 21,284,672 (incl. BN
    # scale+bias, excl. running stats).
    assert n == 21_284_672


def test_bridge_roundtrip(tiny_config):
    """A synthetic torch-style state_dict (numpy) bridges into the exact
    flax variable structure."""
    from structuredetector_tpu.models.torch_bridge import convert_sdnet_state_dict

    model, variables = init_model(tiny_config)

    # Build a fake reference state_dict with the right shapes by reversing
    # our own params.
    sd = {}

    def put_conv(key, kernel):
        sd[key] = np.transpose(np.asarray(kernel), (3, 2, 0, 1))

    def put_bn(prefix, bn_params, bn_stats):
        sd[f"{prefix}.weight"] = np.asarray(bn_params["scale"])
        sd[f"{prefix}.bias"] = np.asarray(bn_params["bias"])
        sd[f"{prefix}.running_mean"] = np.asarray(bn_stats["mean"])
        sd[f"{prefix}.running_var"] = np.asarray(bn_stats["var"])

    p, s = variables["params"], variables["batch_stats"]
    put_conv("adpater.0.weight", p["encoder"]["conv1"]["kernel"])
    put_bn("adpater.1", p["encoder"]["bn1"], s["encoder"]["bn1"])
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        for b in range(n_blocks):
            name = f"layer{stage + 1}_{b}"
            tname = f"down{stage + 1}.{b}"
            put_conv(f"{tname}.conv1.weight", p["encoder"][name]["conv1"]["kernel"])
            put_bn(f"{tname}.bn1", p["encoder"][name]["bn1"], s["encoder"][name]["bn1"])
            put_conv(f"{tname}.conv2.weight", p["encoder"][name]["conv2"]["kernel"])
            put_bn(f"{tname}.bn2", p["encoder"][name]["bn2"], s["encoder"][name]["bn2"])
            if stage > 0 and b == 0:
                put_conv(
                    f"{tname}.downsample.0.weight",
                    p["encoder"][name]["downsample_conv"]["kernel"],
                )
                put_bn(
                    f"{tname}.downsample.1",
                    p["encoder"][name]["downsample_bn"],
                    s["encoder"][name]["downsample_bn"],
                )
    put_conv("up1.weight", p["up1"]["kernel"])
    sd["up1.bias"] = np.asarray(p["up1"]["bias"])
    for k in (2, 3, 4):
        put_conv(f"up{k}.lateral.weight", p[f"up{k}"]["lateral"]["kernel"])
        sd[f"up{k}.lateral.bias"] = np.asarray(p[f"up{k}"]["lateral"]["bias"])
        put_conv(f"up{k}.conv.0.weight", p[f"up{k}"]["conv"]["kernel"])
        put_bn(f"up{k}.conv.1", p[f"up{k}"]["bn"], s[f"up{k}"]["bn"])
    put_conv("head.conv.weight", p["head"]["kernel"])
    sd["head.conv.bias"] = np.asarray(p["head"]["bias"])

    bridged = convert_sdnet_state_dict(sd)

    # Structures must match exactly, and the model must run with them.
    want_struct = jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, dict(variables)))
    got_struct = jax.tree_util.tree_structure(jax.tree.map(lambda x: 0, bridged))
    assert want_struct == got_struct

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 64, 64, 3))
    out_a = model.apply(variables, x, train=False)
    out_b = model.apply(bridged, x, train=False)
    np.testing.assert_allclose(
        np.asarray(out_a["anchor_hm"]), np.asarray(out_b["anchor_hm"]), atol=1e-6
    )


def test_save_load_params(tiny_config, tmp_path):
    from structuredetector_tpu.models.network import load_params, save_params

    model, variables = init_model(tiny_config)
    path = tmp_path / "model.msgpack"
    save_params(variables, path)
    loaded = load_params(path)
    x = jnp.ones((1, 64, 64, 3))
    a = model.apply(variables, x, train=False)
    b = model.apply(loaded, x, train=False)
    np.testing.assert_allclose(np.asarray(a["offsets"]), np.asarray(b["offsets"]))


def test_bridge_loads_real_torch_pth(tiny_config, tmp_path):
    """End-to-end .pth path: an actual torch.save'd state_dict with the
    reference's key naming loads via load_params/resolve_variables."""
    torch = pytest.importorskip("torch")
    from structuredetector_tpu.models.network import load_params, resolve_variables

    model, variables = init_model(tiny_config)
    p, s = variables["params"], variables["batch_stats"]

    sd = {}

    def put_conv(key, kernel):
        sd[key] = torch.from_numpy(
            np.ascontiguousarray(np.transpose(np.asarray(kernel), (3, 2, 0, 1)))
        )

    def put_bn(prefix, bn_params, bn_stats):
        sd[f"{prefix}.weight"] = torch.from_numpy(np.asarray(bn_params["scale"]))
        sd[f"{prefix}.bias"] = torch.from_numpy(np.asarray(bn_params["bias"]))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(np.asarray(bn_stats["mean"]))
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.asarray(bn_stats["var"]))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    put_conv("adpater.0.weight", p["encoder"]["conv1"]["kernel"])
    put_bn("adpater.1", p["encoder"]["bn1"], s["encoder"]["bn1"])
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        for b in range(n_blocks):
            name = f"layer{stage + 1}_{b}"
            tname = f"down{stage + 1}.{b}"
            put_conv(f"{tname}.conv1.weight", p["encoder"][name]["conv1"]["kernel"])
            put_bn(f"{tname}.bn1", p["encoder"][name]["bn1"], s["encoder"][name]["bn1"])
            put_conv(f"{tname}.conv2.weight", p["encoder"][name]["conv2"]["kernel"])
            put_bn(f"{tname}.bn2", p["encoder"][name]["bn2"], s["encoder"][name]["bn2"])
            if stage > 0 and b == 0:
                put_conv(f"{tname}.downsample.0.weight",
                         p["encoder"][name]["downsample_conv"]["kernel"])
                put_bn(f"{tname}.downsample.1",
                       p["encoder"][name]["downsample_bn"],
                       s["encoder"][name]["downsample_bn"])
    put_conv("up1.weight", p["up1"]["kernel"])
    sd["up1.bias"] = torch.from_numpy(np.asarray(p["up1"]["bias"]))
    for k in (2, 3, 4):
        put_conv(f"up{k}.lateral.weight", p[f"up{k}"]["lateral"]["kernel"])
        sd[f"up{k}.lateral.bias"] = torch.from_numpy(
            np.asarray(p[f"up{k}"]["lateral"]["bias"])
        )
        put_conv(f"up{k}.conv.0.weight", p[f"up{k}"]["conv"]["kernel"])
        put_bn(f"up{k}.conv.1", p[f"up{k}"]["bn"], s[f"up{k}"]["bn"])
    put_conv("head.conv.weight", p["head"]["kernel"])
    sd["head.conv.bias"] = torch.from_numpy(np.asarray(p["head"]["bias"]))

    path = tmp_path / "reference_style.pth"
    torch.save(sd, path)

    bridged = resolve_variables(path, variables)
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 64, 64, 3))
    a = model.apply(variables, x, train=False)
    b = model.apply(bridged, x, train=False)
    np.testing.assert_allclose(
        np.asarray(a["part_hm"]), np.asarray(b["part_hm"]), atol=1e-6
    )


def test_pretrained_backbone_warm_start(tiny_config, tmp_path, monkeypatch):
    """--pretrained flow: locate a torchvision-style resnet34 checkpoint
    in $TORCH_HOME, bridge it, and warm-start only the encoder."""
    torch = pytest.importorskip("torch")
    from structuredetector_tpu.models.network import resolve_variables
    from structuredetector_tpu.models.torch_bridge import find_imagenet_resnet34

    model, variables = init_model(tiny_config)
    p, s = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(3)
    sd = {}

    def put_conv(key, like):
        w = rng.normal(0, 0.05, np.transpose(np.asarray(like), (3, 2, 0, 1)).shape)
        sd[key] = torch.from_numpy(w.astype(np.float32))

    def put_bn(prefix, like_params):
        n = np.asarray(like_params["scale"]).shape[0]
        sd[f"{prefix}.weight"] = torch.from_numpy(rng.normal(1, 0.1, n).astype(np.float32))
        sd[f"{prefix}.bias"] = torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32))
        sd[f"{prefix}.running_mean"] = torch.from_numpy(rng.normal(0, 0.1, n).astype(np.float32))
        sd[f"{prefix}.running_var"] = torch.from_numpy(np.abs(rng.normal(1, 0.1, n)).astype(np.float32))
        sd[f"{prefix}.num_batches_tracked"] = torch.tensor(0)

    put_conv("conv1.weight", p["encoder"]["conv1"]["kernel"])
    put_bn("bn1", p["encoder"]["bn1"])
    for stage, n_blocks in enumerate((3, 4, 6, 3)):
        for b in range(n_blocks):
            ours = f"layer{stage + 1}_{b}"
            theirs = f"layer{stage + 1}.{b}"
            put_conv(f"{theirs}.conv1.weight", p["encoder"][ours]["conv1"]["kernel"])
            put_bn(f"{theirs}.bn1", p["encoder"][ours]["bn1"])
            put_conv(f"{theirs}.conv2.weight", p["encoder"][ours]["conv2"]["kernel"])
            put_bn(f"{theirs}.bn2", p["encoder"][ours]["bn2"])
            if stage > 0 and b == 0:
                put_conv(f"{theirs}.downsample.0.weight",
                         p["encoder"][ours]["downsample_conv"]["kernel"])
                put_bn(f"{theirs}.downsample.1", p["encoder"][ours]["downsample_bn"])
    # classifier head present in real torchvision checkpoints, ignored by the bridge
    sd["fc.weight"] = torch.zeros(1000, 512)
    sd["fc.bias"] = torch.zeros(1000)

    ckpt_dir = tmp_path / "hub" / "checkpoints"
    ckpt_dir.mkdir(parents=True)
    torch.save(sd, ckpt_dir / "resnet34-b627a593.pth")
    monkeypatch.delenv("SDNET_PRETRAINED", raising=False)
    monkeypatch.setenv("TORCH_HOME", str(tmp_path))

    path = find_imagenet_resnet34()
    warmed = resolve_variables(path, variables)

    # encoder took the checkpoint values...
    got = np.asarray(warmed["params"]["encoder"]["conv1"]["kernel"])
    want = np.transpose(sd["conv1.weight"].numpy(), (2, 3, 1, 0))
    np.testing.assert_allclose(got, want, atol=1e-7)
    got_bn = np.asarray(warmed["batch_stats"]["encoder"]["layer2_0"]["bn1"]["mean"])
    np.testing.assert_allclose(got_bn, sd["layer2.0.bn1.running_mean"].numpy(), atol=1e-7)
    # ...while the FPN/head stayed at their fresh initialization
    np.testing.assert_array_equal(
        np.asarray(warmed["params"]["head"]["kernel"]), np.asarray(p["head"]["kernel"])
    )


def test_head_conv_deep_head(tiny_config):
    """--head_conv N inserts a 3x3+ReLU hidden conv before the 1x1 head;
    output shapes/splits are unchanged and the param tree gains exactly
    the hidden conv."""
    import dataclasses

    import jax.numpy as jnp

    from structuredetector_tpu.models.network import init_model

    cfg = dataclasses.replace(tiny_config, head_conv=32)
    model, variables = init_model(cfg)
    assert "head_hidden" in variables["params"]
    out = model.apply(variables, jnp.zeros((1, 64, 64, 3)), train=False)
    assert out["anchor_hm"].shape == (1, 16, 16, 2)
    assert out["embeddings"].shape == (1, 16, 16, 2)

    base_model, base_vars = init_model(tiny_config)
    assert "head_hidden" not in base_vars["params"]
