"""Losses vs closed-form values (reference loss.py semantics)."""

import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.ops.encode import EncodedTargets
from structuredetector_tpu.ops.losses import (
    focal_loss,
    masked_l1_loss,
    mse_loss,
    sdnet_loss,
)


def test_focal_loss_closed_form():
    """Hand-computed 2-pixel case."""
    pred = jnp.array([[[[0.9], [0.2]]]])  # (1,1,2,1)
    target = jnp.array([[[[1.0], [0.0]]]])
    # pos pixel: log(0.9) * (1-0.9)^2 ; neg pixel: log(1-0.2) * 0.2^2 * (1-0)^4
    pos = np.log(0.9) * 0.1**2
    neg = np.log(0.8) * 0.04
    want = -(pos + neg) / 1.0
    assert float(focal_loss(pred, target)) == pytest.approx(want, rel=5e-4)


def test_focal_loss_no_positives():
    """Pure-negative fallback: returns -neg_loss unnormalized
    (loss.py:110-111)."""
    pred = jnp.full((1, 2, 2, 1), 0.3)
    target = jnp.full((1, 2, 2, 1), 0.5)
    neg = np.log(0.7) * 0.09 * 0.5**4 * 4
    assert float(focal_loss(pred, target)) == pytest.approx(-neg, rel=5e-4)


def test_focal_penalty_reduction():
    """Near-positive pixels (target just below 1) are strongly
    down-weighted by (1-t)^4."""
    pred = jnp.full((1, 1, 1, 1), 0.9)
    t_hi = jnp.full((1, 1, 1, 1), 0.99)
    t_lo = jnp.full((1, 1, 1, 1), 0.0)
    assert float(focal_loss(pred, t_hi)) < float(focal_loss(pred, t_lo)) / 1e3


def test_mse_loss_is_mean():
    pred = jnp.array([[[[1.0], [0.0]]]])
    target = jnp.array([[[[0.0], [0.0]]]])
    assert float(mse_loss(pred, target)) == pytest.approx(0.5)


def test_masked_l1_gathers_and_normalizes():
    # feature map (1, 2, 2, 2): value = [10*y+x, 100+10*y+x]
    feat = np.zeros((1, 2, 2, 2), np.float32)
    for y in range(2):
        for x in range(2):
            feat[0, y, x] = (10 * y + x, 100 + 10 * y + x)
    inds = jnp.array([[3, 1, 0]])  # (y1,x1), (y0,x1), (y0,x0)
    target = jnp.array([[[11.0, 111.0], [0.0, 100.0], [5.0, 100.0]]])
    mask = jnp.array([[True, True, False]])
    # entry0 exact: |11-11|+|111-111| = 0; entry1: |1-0|+|101-100| = 2; masked: 0
    got = float(masked_l1_loss(jnp.asarray(feat), target, inds, mask))
    assert got == pytest.approx(2.0 / 2.0)


def test_masked_l1_empty_mask_is_zero():
    feat = jnp.zeros((1, 2, 2, 2))
    got = masked_l1_loss(
        feat, jnp.ones((1, 3, 2)), jnp.zeros((1, 3), jnp.int32), jnp.zeros((1, 3), bool)
    )
    assert float(got) == 0.0


def _dummy_targets(b=1, h=4, w=4, m=2, n=1, o=3, p=5):
    return EncodedTargets(
        anchor_hm=jnp.zeros((b, h, w, m)),
        part_hm=jnp.zeros((b, h, w, n)),
        anchor_inds=jnp.zeros((b, o), jnp.int32),
        part_inds=jnp.zeros((b, p), jnp.int32),
        anchor_offsets=jnp.zeros((b, o, 2)),
        part_offsets=jnp.zeros((b, p, 2)),
        embeddings=jnp.zeros((b, p, 2)),
        anchor_mask=jnp.zeros((b, o), bool),
        part_mask=jnp.zeros((b, p), bool),
    )


def test_sdnet_loss_composition():
    b, h, w, m, n = 1, 4, 4, 2, 1
    outputs = {
        "anchor_hm": jnp.zeros((b, h, w, m)),
        "part_hm": jnp.zeros((b, h, w, n)),
        "offsets": jnp.ones((b, h, w, 2)),
        "embeddings": jnp.ones((b, h, w, 2)),
    }
    targets = _dummy_targets(b, h, w, m, n)
    total, stats = sdnet_loss(outputs, targets, hm_loss_fn="mse")
    # sigmoid(0) = 0.5, target 0 -> mse 0.25 per map, x2 maps
    assert float(stats["hm_loss"]) == pytest.approx(0.5, rel=1e-6)
    # empty masks -> regression losses 0
    assert float(stats["offset_loss"]) == 0.0
    assert float(stats["embedding_loss"]) == 0.0
    assert float(total) == pytest.approx(float(stats["total_loss"]))


def test_sdnet_loss_weights():
    b, h, w, m, n = 1, 4, 4, 1, 1
    outputs = {
        "anchor_hm": jnp.zeros((b, h, w, m)),
        "part_hm": jnp.zeros((b, h, w, n)),
        "offsets": jnp.ones((b, h, w, 2)),
        "embeddings": jnp.full((b, h, w, 2), 3.0),
    }
    targets = _dummy_targets(b, h, w, m, n)._replace(
        part_mask=jnp.ones((1, 5), bool),
        anchor_mask=jnp.ones((1, 3), bool),
    )
    _, s1 = sdnet_loss(outputs, targets, hm_loss_fn="mse",
                       offset_weight=1.0, embedding_weight=1.0)
    _, s2 = sdnet_loss(outputs, targets, hm_loss_fn="mse",
                       offset_weight=0.5, embedding_weight=0.25)
    assert float(s2["offset_loss"]) == pytest.approx(0.5 * float(s1["offset_loss"]))
    assert float(s2["embedding_loss"]) == pytest.approx(0.25 * float(s1["embedding_loss"]))
    # offsets map is 1s, targets 0 -> per-entry L1 = 2 (two coords), both
    # anchor and part terms
    assert float(s1["offset_loss"]) == pytest.approx(4.0)
    assert float(s1["embedding_loss"]) == pytest.approx(6.0)
