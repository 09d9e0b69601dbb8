"""Golden numeric regression fixtures (SURVEY.md §4).

Fixed-seed inputs with frozen expected outputs: any change to the
encode / loss / decode numerics trips these. Values were produced by
the implementation at framework v0.1 on the CPU backend; the semantics
are independently verified by the closed-form tests in test_losses.py /
test_encode.py — these values pin against silent numeric drift.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.ops.decode import decode_feature_maps
from structuredetector_tpu.ops.encode import encode_targets
from structuredetector_tpu.ops.losses import focal_loss, masked_l1_loss, mse_loss


def golden_inputs():
    """Deterministic synthetic scene: 2 objects, 3 parts on a 16x16 grid."""
    anchors_xy = jnp.array([[[3.25, 4.5], [10.75, 12.0]]])
    anchor_cls = jnp.array([[0, 1]])
    anchor_mask = jnp.array([[True, True]])
    parts_xy = jnp.array([[[5.0, 4.0], [9.5, 11.25], [12.0, 13.5]]])
    part_kind = jnp.array([[0, 0, 0]])
    part_owner_xy = jnp.array([[[3.25, 4.5], [10.75, 12.0], [10.75, 12.0]]])
    part_mask = jnp.array([[True, True, True]])
    return (anchors_xy, anchor_cls, anchor_mask, parts_xy, part_kind,
            part_owner_xy, part_mask)


def test_encode_golden():
    t = encode_targets(
        *golden_inputs(), out_h=16, out_w=16, n_labels=2, n_parts=1,
        sigma_gauss=0.1,
    )
    np.testing.assert_array_equal(np.asarray(t.anchor_inds[0]), [4 * 16 + 3, 12 * 16 + 10])
    np.testing.assert_array_equal(np.asarray(t.part_inds[0]), [4 * 16 + 5, 11 * 16 + 9, 13 * 16 + 12])
    np.testing.assert_allclose(np.asarray(t.anchor_offsets[0]), [[0.25, 0.5], [0.75, 0.0]], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t.embeddings[0]),
        [[-1.75, 0.5], [1.25, 0.75], [-1.25, -1.5]], atol=1e-6,
    )
    # frozen heatmap samples (sigma = 0.1*16/3)
    hm = np.asarray(t.anchor_hm[0])
    assert hm[4, 3, 0] == pytest.approx(1.0, abs=1e-6)
    assert hm[4, 4, 0] == pytest.approx(0.17242162, rel=1e-4)
    assert hm[12, 10, 1] == pytest.approx(1.0, abs=1e-6)
    assert float(np.asarray(t.part_hm).sum()) == pytest.approx(5.4394708, rel=1e-3)


def test_loss_golden():
    t = encode_targets(
        *golden_inputs(), out_h=16, out_w=16, n_labels=2, n_parts=1,
        sigma_gauss=0.1,
    )
    # deterministic "predictions": logits zero everywhere
    zero_hm2 = jnp.zeros((1, 16, 16, 2))
    zero_hm1 = jnp.zeros((1, 16, 16, 1))
    half = 0.5 * jnp.ones((1, 16, 16, 2))

    mse_a = float(mse_loss(jnp.full_like(zero_hm2, 0.5), t.anchor_hm))
    assert mse_a == pytest.approx(0.24730115, rel=1e-4)

    focal_a = float(focal_loss(jnp.full_like(zero_hm2, 0.5), t.anchor_hm))
    assert focal_a == pytest.approx(43.911293, rel=2e-3)

    l1_off = float(masked_l1_loss(half, t.anchor_offsets, t.anchor_inds, t.anchor_mask))
    # residuals |0.5-0.25|+|0.5-0.5| + |0.5-0.75|+|0.5-0| = 1.0 over 2
    assert l1_off == pytest.approx(0.5, rel=1e-5)


def test_decode_golden():
    """Frozen decode of a deterministic map set."""
    m, n, g = 2, 1, 16
    anchor_hm = np.full((1, g, g, m), -8.0, np.float32)
    part_hm = np.full((1, g, g, n), -8.0, np.float32)
    offsets = np.zeros((1, g, g, 2), np.float32)
    embeddings = np.zeros((1, g, g, 2), np.float32)
    anchor_hm[0, 4, 3, 0] = 2.0   # sigmoid 0.880797
    anchor_hm[0, 12, 10, 1] = 1.0  # sigmoid 0.731059
    part_hm[0, 4, 5, 0] = 1.5      # sigmoid 0.817574
    offsets[0, 4, 3] = (0.25, 0.5)
    embeddings[0, 4, 5] = (-1.75, 0.5)

    dec = decode_feature_maps(
        {"anchor_hm": jnp.asarray(anchor_hm), "part_hm": jnp.asarray(part_hm),
         "offsets": jnp.asarray(offsets), "embeddings": jnp.asarray(embeddings)},
        max_objects=4, max_parts=4, conf_thresh=0.5, dist_thresh=0.15,
    )
    a = np.asarray(dec["anchors"][0])
    np.testing.assert_allclose(a[0], [3.25, 4.5, 0.8807971, 0.0], rtol=1e-5)
    np.testing.assert_allclose(a[1], [10.0, 12.0, 0.7310586, 1.0], rtol=1e-5)
    p = np.asarray(dec["parts"][0])
    np.testing.assert_allclose(p[0], [5.0, 4.0, 0.81757444, 0.0, 3.25, 4.5], rtol=1e-5)
    # part links to anchor 0 (origin (3.25,4.5) == anchor 0 position)
    assert int(dec["part_parent"][0, 0]) == 0
    assert bool(dec["part_valid"][0, 0])
    assert not bool(dec["part_valid"][0, 1])  # padded slot
