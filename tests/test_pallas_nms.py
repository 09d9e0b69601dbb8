"""Pallas fused sigmoid+NMS kernel vs the XLA reference path
(interpreter mode on CPU)."""

import jax.numpy as jnp
import numpy as np

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
