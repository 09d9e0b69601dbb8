"""Reverse weight bridge: our Flax variable pytree -> the reference's
torch ``state_dict`` layout (``torch.save``-able ``.pth``).

This is the exact inverse of
:func:`structuredetector_tpu.models.torch_bridge.convert_sdnet_state_dict`
(reference naming: ``adpater.{0,1}``, ``down1..4``, ``up1``,
``up2..4.{lateral,conv.0,conv.1}``, ``head.conv`` —
`/root/reference/src/sdnet/model/network.py:32-57`). It exists for
cross-framework parity evidence: a checkpoint trained by THIS framework
exported through here is loadable by the reference's own
``Network.load_state_dict`` (strict mode — every key incl.
``num_batches_tracked`` is emitted) and scored by the reference's own
``evaluate`` loop (`/root/reference/src/sdnet/cli/evaluate.py:30-45`).

Conv kernels go HWIO -> OIHW. Only the reference-compatible model
surface is exportable: resnet34 encoder, fpn_depth-sized FPN, 1x1 head.
The opt-in deep head (``--head_conv``) and resnet18/50 backbones have
no reference counterpart and raise.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Mapping

import numpy as np

from .torch_bridge import STAGE_SIZES


def _np(x) -> np.ndarray:
    return np.asarray(x)


def _conv_oihw(kernel) -> np.ndarray:
    """HWIO -> OIHW."""
    return np.transpose(_np(kernel), (3, 2, 0, 1))


def _put_bn(out: Dict[str, np.ndarray], prefix: str,
            params: Mapping[str, Any], stats: Mapping[str, Any]) -> None:
    out[f"{prefix}.weight"] = _np(params["scale"])
    out[f"{prefix}.bias"] = _np(params["bias"])
    out[f"{prefix}.running_mean"] = _np(stats["mean"])
    out[f"{prefix}.running_var"] = _np(stats["var"])
    # torch BN tracks this buffer; strict load_state_dict requires it.
    out[f"{prefix}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)


def export_sdnet_state_dict(tree: Mapping[str, Any]) -> "OrderedDict[str, Any]":
    """``{'params', 'batch_stats'}`` pytree -> reference-layout numpy
    state_dict (caller wraps values in torch tensors via
    :func:`save_reference_pth`)."""
    params, stats = tree["params"], tree["batch_stats"]
    enc_p, enc_s = params["encoder"], stats["encoder"]

    if "head_hidden" in params:
        raise ValueError(
            "--head_conv deep head has no reference counterpart; only the "
            "1x1 head is exportable to the reference layout"
        )
    if "kernel" not in params["head"]:
        raise ValueError("unrecognized head structure")
    n_blocks_seen = sum(1 for k in enc_p if k.startswith("layer1_"))
    if n_blocks_seen != STAGE_SIZES[0]:
        raise ValueError(
            f"encoder has {n_blocks_seen} layer1 blocks; only resnet34 "
            f"({STAGE_SIZES[0]}) matches the reference Network"
        )
    if "downsample_conv" in enc_p.get("layer1_0", {}):
        raise ValueError("bottleneck (resnet50-style) encoder is not "
                         "representable in the reference layout")

    out: "OrderedDict[str, Any]" = OrderedDict()
    out["adpater.0.weight"] = _conv_oihw(enc_p["conv1"]["kernel"])
    _put_bn(out, "adpater.1", enc_p["bn1"], enc_s["bn1"])

    for stage, n_blocks in enumerate(STAGE_SIZES):
        for block in range(n_blocks):
            src = f"layer{stage + 1}_{block}"
            dst = f"down{stage + 1}.{block}"
            p, s = enc_p[src], enc_s[src]
            out[f"{dst}.conv1.weight"] = _conv_oihw(p["conv1"]["kernel"])
            _put_bn(out, f"{dst}.bn1", p["bn1"], s["bn1"])
            out[f"{dst}.conv2.weight"] = _conv_oihw(p["conv2"]["kernel"])
            _put_bn(out, f"{dst}.bn2", p["bn2"], s["bn2"])
            if "downsample_conv" in p:
                out[f"{dst}.downsample.0.weight"] = _conv_oihw(
                    p["downsample_conv"]["kernel"])
                _put_bn(out, f"{dst}.downsample.1",
                        p["downsample_bn"], s["downsample_bn"])

    out["up1.weight"] = _conv_oihw(params["up1"]["kernel"])
    out["up1.bias"] = _np(params["up1"]["bias"])
    for k in (2, 3, 4):
        blk_p, blk_s = params[f"up{k}"], stats[f"up{k}"]
        out[f"up{k}.lateral.weight"] = _conv_oihw(blk_p["lateral"]["kernel"])
        out[f"up{k}.lateral.bias"] = _np(blk_p["lateral"]["bias"])
        out[f"up{k}.conv.0.weight"] = _conv_oihw(blk_p["conv"]["kernel"])
        _put_bn(out, f"up{k}.conv.1", blk_p["bn"], blk_s["bn"])

    out["head.conv.weight"] = _conv_oihw(params["head"]["kernel"])
    out["head.conv.bias"] = _np(params["head"]["bias"])
    return out


def save_reference_pth(tree: Mapping[str, Any], path) -> None:
    """Write a ``torch.save`` ``.pth`` the reference can
    ``load_state_dict`` strictly."""
    import torch

    # np.ascontiguousarray promotes 0-d scalars (num_batches_tracked)
    # to 1-d; keep them 0-d like torch's own BN buffers.
    sd = OrderedDict(
        (k, torch.from_numpy(np.ascontiguousarray(v).copy()).reshape(
            np.asarray(v).shape))
        for k, v in export_sdnet_state_dict(tree).items()
    )
    torch.save(sd, path)
