"""Pallas fused sigmoid+NMS kernel vs the XLA reference path.

Runs in interpreter mode on the CPU test mesh; on a real TPU backend
(driver/bench environment) `test_fused_kernel_bit_exact_on_hardware`
additionally pins Mosaic-compiled outputs bit-for-bit against XLA."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from structuredetector_tpu.ops.pallas.nms import fused_sigmoid_nms
from structuredetector_tpu.ops.tensor import clamped_sigmoid, plateau_nms


def test_fused_kernel_matches_xla(rng):
    x = rng.normal(0, 3, size=(2, 16, 24, 3)).astype(np.float32)
    want = np.asarray(plateau_nms(clamped_sigmoid(jnp.asarray(x))))
    got = np.asarray(fused_sigmoid_nms(jnp.asarray(x), interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_kernel_peaks_survive(rng):
    x = np.full((1, 16, 16, 1), -10.0, np.float32)
    x[0, 5, 5, 0] = 4.0
    got = np.asarray(fused_sigmoid_nms(jnp.asarray(x), interpret=True))
    sig = 1 / (1 + np.exp(-4.0))
    assert got[0, 5, 5, 0] == np.float32(sig)
    # neighbors suppressed
    assert got[0, 5, 6, 0] == 0.0
    # far-away uniform region: every pixel equals the window max -> kept
    assert got[0, 12, 12, 0] > 0


@pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU (Mosaic) backend"
)
def test_fused_kernel_bit_exact_on_hardware(rng):
    """Hardware pin for the DESIGN.md bit-exactness claim: the Mosaic
    compilation of the fused kernel must match XLA's sigmoid+NMS
    lowering bit for bit, across shapes incl. non-aligned W and the
    flagship 128x128 grid."""
    for shape in ((2, 16, 24, 3), (1, 33, 47, 2), (4, 128, 128, 3)):
        x = rng.normal(0, 3, size=shape).astype(np.float32)
        want = np.asarray(jax.jit(lambda a: plateau_nms(clamped_sigmoid(a)))(x))
        got = np.asarray(jax.jit(fused_sigmoid_nms)(x))
        np.testing.assert_array_equal(got, want)
