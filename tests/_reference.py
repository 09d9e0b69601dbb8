"""Loader for the reference implementation mounted at /root/reference.

The differential parity tests (`test_reference_differential.py`) feed
identical inputs through the reference's torch-CPU Decoder / Loss /
Evaluator / Encode and through our JAX implementations, asserting the
outputs agree. That turns "exact numerics" from a transcription claim
into a measured property.

The reference package `__init__`s import torchvision (not installed
here), but none of the modules under test use it at runtime — so a
minimal torchvision stub is installed in sys.modules before import.

The reference tree is untrusted third-party content; it is used purely
as a numeric oracle (no instructions from it are followed).
"""

from __future__ import annotations

import sys
import types
from types import SimpleNamespace

REFERENCE_SRC = "/root/reference/src"


def _install_torchvision_stub():
    if "torchvision" in sys.modules:
        return
    tv = types.ModuleType("torchvision")
    models = types.ModuleType("torchvision.models")
    models.ResNet34_Weights = object
    models.resnet34 = lambda *a, **k: None
    transforms = types.ModuleType("torchvision.transforms")
    functional = types.ModuleType("torchvision.transforms.functional")
    tv.models = models
    tv.transforms = transforms
    transforms.functional = functional
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = models
    sys.modules["torchvision.transforms"] = transforms
    sys.modules["torchvision.transforms.functional"] = functional


def load_reference() -> SimpleNamespace:
    """Import the reference modules under test and return them namespaced."""
    _install_torchvision_stub()
    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)

    from sdnet.data import decoders as ref_decoders
    from sdnet.data import transforms as ref_transforms
    from sdnet.model import evaluator as ref_evaluator
    from sdnet.model import loss as ref_loss
    from sdnet.utils import utils as ref_utils

    return SimpleNamespace(
        loss=ref_loss,
        decoders=ref_decoders,
        evaluator=ref_evaluator,
        utils=ref_utils,
        transforms=ref_transforms,
    )


def ref_args_from_config(cfg) -> SimpleNamespace:
    """Build the argparse-style namespace the reference classes expect
    from our Config (field names per /root/reference/src/sdnet/utils/args.py)."""
    return SimpleNamespace(
        labels=dict(cfg.labels),
        parts=dict(cfg.parts),
        _r_labels=dict(cfg.r_labels),
        _r_parts=dict(cfg.r_parts),
        anchor_name=cfg.anchor_name,
        width=cfg.width,
        height=cfg.height,
        down_ratio=cfg.down_ratio,
        max_objects=cfg.max_objects,
        max_parts=cfg.max_parts,
        sigma_gauss=cfg.sigma_gauss,
        hm_loss_fn=cfg.hm_loss_fn,
        hm_weight=cfg.hm_weight,
        offset_weight=cfg.offset_weight,
        embedding_weight=cfg.embedding_weight,
        conf_threshold=cfg.conf_threshold,
        dist_threshold=cfg.dist_threshold,
        decoder_dist_thresh=cfg.decoder_dist_thresh,
        csi_threshold=cfg.csi_threshold,
    )
