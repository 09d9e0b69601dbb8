"""On-device target encoder vs hand-computed fixtures
(reference Encode semantics, transforms.py:121-208)."""

import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.ops.encode import encode_targets


def test_encode_single_object():
    out_h = out_w = 16
    sigma_gauss = 0.1
    sigma = sigma_gauss * 16 / 3  # transforms.py:142

    # one object at grid (3.7, 5.2), label 1; one part at (8.4, 2.9)
    anchors_xy = jnp.array([[[3.7, 5.2], [0.0, 0.0]]])
    anchor_cls = jnp.array([[1, 0]])
    anchor_mask = jnp.array([[True, False]])
    parts_xy = jnp.array([[[8.4, 2.9], [0.0, 0.0]]])
    part_kind = jnp.array([[0, 0]])
    part_owner_xy = jnp.array([[[3.7, 5.2], [0.0, 0.0]]])
    part_mask = jnp.array([[True, False]])

    t = encode_targets(
        anchors_xy, anchor_cls, anchor_mask, parts_xy, part_kind, part_owner_xy,
        part_mask, out_h=out_h, out_w=out_w, n_labels=2, n_parts=1,
        sigma_gauss=sigma_gauss,
    )

    # index = int(y) * out_w + int(x) (transforms.py:163)
    assert int(t.anchor_inds[0, 0]) == 5 * 16 + 3
    assert int(t.part_inds[0, 0]) == 2 * 16 + 8
    # offsets = frac part (transforms.py:165-166)
    np.testing.assert_allclose(np.asarray(t.anchor_offsets[0, 0]), [0.7, 0.2], atol=1e-6)
    np.testing.assert_allclose(np.asarray(t.part_offsets[0, 0]), [0.4, 0.9], atol=1e-6)
    # embedding = anchor - part in float grid coords (transforms.py:181-182)
    np.testing.assert_allclose(
        np.asarray(t.embeddings[0, 0]), [3.7 - 8.4, 5.2 - 2.9], atol=1e-6
    )

    # Gaussian peak is exactly 1 at the truncated center, on the right channel
    hm = np.asarray(t.anchor_hm[0])
    assert hm[5, 3, 1] == pytest.approx(1.0)
    assert hm[:, :, 0].max() == 0.0  # label 0 channel empty
    # value one pixel to the right: exp(-1 / (2 sigma^2))
    assert hm[5, 4, 1] == pytest.approx(np.exp(-1 / (2 * sigma**2)), rel=1e-5)

    phm = np.asarray(t.part_hm[0])
    assert phm[2, 8, 0] == pytest.approx(1.0)

    # masked-out slots are zeroed
    assert int(t.anchor_inds[0, 1]) == 0
    assert np.asarray(t.embeddings[0, 1]).sum() == 0.0


def test_encode_max_merge_two_objects_same_class():
    """Overlapping Gaussians merge with per-pixel max (transforms.py:161)."""
    anchors_xy = jnp.array([[[4.0, 4.0], [6.0, 4.0]]])
    anchor_cls = jnp.array([[0, 0]])
    anchor_mask = jnp.array([[True, True]])
    empty = jnp.zeros((1, 1, 2))
    t = encode_targets(
        anchors_xy, anchor_cls, anchor_mask, empty, jnp.zeros((1, 1), jnp.int32),
        empty, jnp.zeros((1, 1), bool), out_h=16, out_w=16, n_labels=1, n_parts=1,
        sigma_gauss=0.1,
    )
    hm = np.asarray(t.anchor_hm[0, :, :, 0])
    sigma = 0.1 * 16 / 3
    # midpoint (5, 4) is distance 1 from both
    assert hm[4, 5] == pytest.approx(np.exp(-1 / (2 * sigma**2)), rel=1e-5)
    assert hm[4, 4] == pytest.approx(1.0)
    assert hm[4, 6] == pytest.approx(1.0)


def test_encode_batched_jit():
    import jax

    b, o, p = 4, 3, 6
    f = jax.jit(
        lambda a, ac, am, pxy, pk, po, pm: encode_targets(
            a, ac, am, pxy, pk, po, pm, out_h=32, out_w=32, n_labels=2, n_parts=1,
            sigma_gauss=0.1,
        )
    )
    t = f(
        jnp.ones((b, o, 2)), jnp.zeros((b, o), jnp.int32), jnp.ones((b, o), bool),
        jnp.ones((b, p, 2)), jnp.zeros((b, p), jnp.int32), jnp.ones((b, p, 2)),
        jnp.ones((b, p), bool),
    )
    assert t.anchor_hm.shape == (b, 32, 32, 2)
    assert t.part_hm.shape == (b, 32, 32, 1)
    assert t.part_inds.shape == (b, p)
