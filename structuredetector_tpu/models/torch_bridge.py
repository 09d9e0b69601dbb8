"""One-way weight bridge: torch state_dicts -> our Flax variable pytree.

Two checkpoint families are supported:

1. The reference's trained SDNet `.pth` (`torch.save(state_dict)`,
   `/root/reference/src/sdnet/model/network.py:86-87`) with its attribute
   naming: `adpater.{0,1}` (stem conv/bn — sic), `down1..down4`
   (resnet stages), `up1` (1x1 conv), `up2..up4` (Fpn blocks:
   `lateral`, `conv.0` 3x3 conv, `conv.1` BN), `head.conv`.
2. A raw torchvision `resnet34` ImageNet state_dict (`conv1`, `bn1`,
   `layer1..4`), used to warm-start the encoder only (the reference
   downloads these at `network.py:41`).

Conv kernels are transposed OIHW -> HWIO for NHWC convs. BatchNorm
weight/bias/running_mean/running_var map to scale/bias and
batch_stats mean/var. Requires torch (CPU) to unpickle `.pth` files;
plain dicts of numpy arrays are accepted too (for tests).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

STAGE_SIZES = (3, 4, 6, 3)  # resnet34/50; resnet18 is (2, 2, 2, 2)


def _to_numpy(t) -> np.ndarray:
    if isinstance(t, np.ndarray):
        return t
    # torch tensor
    return t.detach().cpu().numpy()


def _conv(kernel) -> np.ndarray:
    """OIHW -> HWIO."""
    return np.transpose(_to_numpy(kernel), (2, 3, 1, 0))


class _Missing(KeyError):
    pass


def _sd_get(sd: Mapping[str, Any], key: str) -> np.ndarray:
    if key not in sd:
        raise _Missing(key)
    return _to_numpy(sd[key])


def _bn(sd, prefix: str):
    params = {
        "scale": _sd_get(sd, f"{prefix}.weight"),
        "bias": _sd_get(sd, f"{prefix}.bias"),
    }
    stats = {
        "mean": _sd_get(sd, f"{prefix}.running_mean"),
        "var": _sd_get(sd, f"{prefix}.running_var"),
    }
    return params, stats


def _basic_block(sd, prefix: str, has_downsample: bool):
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv1"] = {"kernel": _conv(_sd_get(sd, f"{prefix}.conv1.weight"))}
    params["bn1"], stats["bn1"] = _bn(sd, f"{prefix}.bn1")
    params["conv2"] = {"kernel": _conv(_sd_get(sd, f"{prefix}.conv2.weight"))}
    params["bn2"], stats["bn2"] = _bn(sd, f"{prefix}.bn2")
    if has_downsample:
        params["downsample_conv"] = {
            "kernel": _conv(_sd_get(sd, f"{prefix}.downsample.0.weight"))
        }
        params["downsample_bn"], stats["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def _bottleneck_block(sd, prefix: str, has_downsample: bool):
    """torchvision Bottleneck: conv1/bn1 (1x1), conv2/bn2 (3x3),
    conv3/bn3 (1x1 expand), optional downsample."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = {"kernel": _conv(_sd_get(sd, f"{prefix}.conv{i}.weight"))}
        params[f"bn{i}"], stats[f"bn{i}"] = _bn(sd, f"{prefix}.bn{i}")
    if has_downsample:
        params["downsample_conv"] = {
            "kernel": _conv(_sd_get(sd, f"{prefix}.downsample.0.weight"))
        }
        params["downsample_bn"], stats["downsample_bn"] = _bn(sd, f"{prefix}.downsample.1")
    return params, stats


def _detect_arch(sd: Mapping[str, Any], stage_prefix) -> tuple:
    """(block converter, stage sizes, downsample-in-stage-0) from the
    state_dict shape: Bottleneck blocks carry a conv3; resnet18 has no
    layer1.2."""
    if f"{stage_prefix(0)}.0.conv3.weight" in sd:
        return _bottleneck_block, (3, 4, 6, 3), True  # resnet50
    if f"{stage_prefix(0)}.2.conv1.weight" in sd:
        return _basic_block, (3, 4, 6, 3), False  # resnet34
    return _basic_block, (2, 2, 2, 2), False  # resnet18


def convert_encoder(sd: Mapping[str, Any], style: str) -> Dict[str, Any]:
    """Convert ResNet encoder weights (resnet18/34/50, auto-detected).

    style='sdnet' uses the reference SDNet naming (adpater/down1..4);
    style='torchvision' uses raw resnet naming (conv1/layer1..4).
    """
    if style == "sdnet":
        stem_conv, stem_bn = "adpater.0", "adpater.1"
        stage_prefix = lambda s: f"down{s + 1}"
    else:
        stem_conv, stem_bn = "conv1", "bn1"
        stage_prefix = lambda s: f"layer{s + 1}"

    block_fn, stage_sizes, ds_in_stage0 = _detect_arch(sd, stage_prefix)

    params: Dict[str, Any] = {"conv1": {"kernel": _conv(_sd_get(sd, f"{stem_conv}.weight"))}}
    stats: Dict[str, Any] = {}
    params["bn1"], stats["bn1"] = _bn(sd, stem_bn)

    for stage, n_blocks in enumerate(stage_sizes):
        for block in range(n_blocks):
            has_ds = (stage > 0 or ds_in_stage0) and block == 0
            name = f"layer{stage + 1}_{block}"
            p, s = block_fn(sd, f"{stage_prefix(stage)}.{block}", has_ds)
            params[name] = p
            stats[name] = s

    return {"params": params, "batch_stats": stats}


def convert_sdnet_state_dict(sd: Mapping[str, Any]) -> Dict[str, Any]:
    """Full reference SDNet state_dict -> {'params', 'batch_stats'}."""
    enc = convert_encoder(sd, style="sdnet")
    params: Dict[str, Any] = {"encoder": enc["params"]}
    stats: Dict[str, Any] = {"encoder": enc["batch_stats"]}

    params["up1"] = {
        "kernel": _conv(_sd_get(sd, "up1.weight")),
        "bias": _sd_get(sd, "up1.bias"),
    }
    for k in (2, 3, 4):
        blk_params: Dict[str, Any] = {
            "lateral": {
                "kernel": _conv(_sd_get(sd, f"up{k}.lateral.weight")),
                "bias": _sd_get(sd, f"up{k}.lateral.bias"),
            },
            "conv": {"kernel": _conv(_sd_get(sd, f"up{k}.conv.0.weight"))},
        }
        bn_params, bn_stats = _bn(sd, f"up{k}.conv.1")
        blk_params["bn"] = bn_params
        params[f"up{k}"] = blk_params
        stats[f"up{k}"] = {"bn": bn_stats}

    params["head"] = {
        "kernel": _conv(_sd_get(sd, "head.conv.weight")),
        "bias": _sd_get(sd, "head.conv.bias"),
    }
    return {"params": params, "batch_stats": stats}


def find_imagenet_resnet34(backbone: str = "resnet34") -> "Path":
    """Locate a torchvision ImageNet checkpoint for `backbone` in the
    standard local caches (the reference downloads resnet34 implicitly
    via `pretrained=True`, network.py:41; this environment has no
    network egress, so the file must already be on disk).

    Search order:
      1. $SDNET_PRETRAINED — explicit file path,
      2. $TORCH_HOME/hub/checkpoints/<backbone>-*.pth,
      3. ~/.cache/torch/hub/checkpoints/<backbone>-*.pth.
    """
    import os
    from pathlib import Path

    explicit = os.environ.get("SDNET_PRETRAINED")
    if explicit:
        p = Path(explicit)
        if p.is_file():
            return p
        raise FileNotFoundError(
            f"$SDNET_PRETRAINED points at '{p}', which does not exist"
        )

    torch_home = Path(os.environ.get("TORCH_HOME", Path.home() / ".cache" / "torch"))
    hits = sorted((torch_home / "hub" / "checkpoints").glob(f"{backbone}-*.pth"))
    if hits:
        return hits[0]

    raise FileNotFoundError(
        f"--pretrained: no ImageNet {backbone} checkpoint found. Place "
        f"torchvision's {backbone} weights (e.g. from "
        "https://download.pytorch.org/models/) under "
        f"{torch_home / 'hub' / 'checkpoints'}/, or set $SDNET_PRETRAINED "
        "(or $TORCH_HOME), or pass the file directly via --load_model."
    )


def load_torch_checkpoint(path) -> Dict[str, Any]:
    """Unpickle a `.pth` and convert. Detects reference-SDNet vs raw
    torchvision-resnet34 naming."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if any(k.startswith("adpater.") for k in sd):
        return convert_sdnet_state_dict(sd)
    if any(k.startswith("layer1.") for k in sd):
        return {"encoder_only": True, **convert_encoder(sd, style="torchvision")}
    raise ValueError(f"Unrecognized torch checkpoint key style in {path}")


def warm_start_encoder(variables: Dict[str, Any], encoder_tree: Dict[str, Any]) -> Dict[str, Any]:
    """Graft bridged encoder weights into freshly-initialized variables
    (ImageNet warm start, reference network.py:41)."""
    import flax

    variables = flax.core.unfreeze(variables)
    variables["params"]["encoder"] = encoder_tree["params"]
    variables["batch_stats"]["encoder"] = encoder_tree["batch_stats"]
    return variables
