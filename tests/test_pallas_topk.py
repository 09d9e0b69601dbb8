"""Pallas fused sigmoid+NMS+top-k kernel vs the XLA reference path.

The kernel (`ops.pallas.topk`) must reproduce
`_topk_iterative(plateau_nms(clamped_sigmoid(x)))` exactly — values,
flat indices, and the ascending-flat-index tie-break — since the
decode fast path (`ops.decode.decode_feature_maps_cfirst`) substitutes
it for the XLA decode front. Runs in interpreter mode on CPU; on a
real TPU backend the hardware test additionally pins Mosaic-compiled
outputs bit-for-bit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.ops.pallas.topk import fused_sigmoid_nms_topk
from structuredetector_tpu.ops.tensor import (
    _topk_iterative,
    clamped_sigmoid,
    plateau_nms,
)


def _reference(x: np.ndarray, k: int):
    """XLA decode front on NHWC logits -> (B*C, k) vals/inds."""
    b, h, w, c = x.shape
    sup = plateau_nms(clamped_sigmoid(jnp.asarray(x)))
    per_class = jnp.transpose(sup, (0, 3, 1, 2)).reshape(b, c, h * w)
    rv, ri = _topk_iterative(per_class, k)
    return np.asarray(rv).reshape(b * c, k), np.asarray(ri).reshape(b * c, k)


def _planes(x: np.ndarray):
    b, h, w, c = x.shape
    return jnp.transpose(jnp.asarray(x), (0, 3, 1, 2)).reshape(b * c, h, w)


@pytest.mark.parametrize(
    "shape,k",
    [
        ((3, 32, 48, 2), 12),  # plane count 6: full-array grid step
        ((4, 16, 16, 2), 5),   # plane count 8: one 8-plane step
        ((1, 32, 32, 1), 40),  # k > peak count: zeros selected, asc index
        ((2, 24, 40, 3), 7),   # H not a multiple of 8 planes * ...
        ((5, 16, 16, 2), 6),   # plane count 10: padded to 16, one step
        ((25, 16, 16, 2), 4),  # plane count 50: padded to 56, 8-plane steps
    ],
)
@pytest.mark.parametrize("variant", ["rounds", "onehot"])
def test_fused_topk_matches_xla(rng, shape, k, variant):
    x = rng.normal(0, 3, size=shape).astype(np.float32)
    # inject a plateau (equal-value region) to exercise tie-breaks
    x[0, 4:7, 4:7, 0] = 2.5
    want_v, want_i = _reference(x, k)
    got_v, got_i = fused_sigmoid_nms_topk(_planes(x), k, interpret=True,
                                          variant=variant)
    np.testing.assert_array_equal(np.asarray(got_v), want_v)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


@pytest.mark.parametrize("variant", ["rounds", "onehot"])
def test_fused_topk_tie_break_ascending(rng, variant):
    """All-equal plane: every pixel is its own plateau peak; selection
    must walk ascending flat indices at the shared value (the iterative
    argmax semantics the reference decode inherits from torch)."""
    x = np.zeros((1, 16, 16, 1), np.float32)
    got_v, got_i = fused_sigmoid_nms_topk(_planes(x), 5, interpret=True,
                                          variant=variant)
    np.testing.assert_array_equal(np.asarray(got_i)[0], [0, 1, 2, 3, 4])
    np.testing.assert_allclose(np.asarray(got_v)[0], 0.5, atol=1e-6)


def test_fused_topk_rejects_oversized_k():
    with pytest.raises(ValueError, match="exceeds plane size"):
        fused_sigmoid_nms_topk(jnp.zeros((1, 4, 4)), 17, interpret=True)


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU (Mosaic) backend"
)
@pytest.mark.parametrize("variant", ["rounds", "onehot"])
def test_fused_topk_bit_exact_on_hardware(rng, variant):
    """Hardware pin: Mosaic compilation must match the XLA decode front
    bit for bit at the flagship serving shapes (anchors C=2 k=20,
    parts C=1 k=40 at 128x128) and at a P=16-blocked plane count —
    for BOTH kernel variants (the shootout in
    tools/bench_topk_variants.py picks the faster one)."""
    for shape, k in (((128, 128, 128, 2), 20), ((128, 128, 128, 1), 40),
                     ((8, 64, 64, 2), 7),
                     # plane count 100 (e.g. detect --eval_batch_size 50
                     # x 2 labels): indivisible by 8, must pad instead
                     # of falling back to one VMEM-overflowing block.
                     ((50, 128, 128, 2), 20)):
        x = rng.normal(0, 3, size=shape).astype(np.float32)
        want_v, want_i = _reference(x, k)
        got_v, got_i = fused_sigmoid_nms_topk(_planes(x), k, variant=variant)
        np.testing.assert_array_equal(np.asarray(got_v), want_v)
        np.testing.assert_array_equal(np.asarray(got_i), want_i)
