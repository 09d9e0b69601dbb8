"""Fused sigmoid -> clamp -> 5x5 plateau-NMS Pallas (Mosaic) kernel.

This is the decode front of SURVEY.md §2b's "native tier": the
reference runs `sigmoid` then `max_pool2d(5,1,2)` as two CUDA kernels
with an HBM round-trip between them (`utils.py:441-443` +
`decoders.py:44-45`); here one VMEM-resident kernel computes the
sigmoid, the windowed max, and the plateau equality mask in a single
pass over each heatmap plane.

Layout: the (B, H, W, C) heatmap is viewed as (B*C) independent (H, W)
planes so the W axis rides the 128-wide vector lanes. Each grid step
loads one plane into VMEM, materializes a (H+4, W+4) halo'd scratch
(border filled with -1, below any sigmoid output), and max-reduces the
25 statically-shifted windows on the VPU.

Falls back to interpreter mode off-TPU so tests exercise the same code
path on CPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..tensor import CLAMP_EPS

_WINDOW = 5
_PAD = _WINDOW // 2


def _sigmoid_nms_kernel(x_ref, out_ref, scratch):
    # x_ref, out_ref: (1, H, W); scratch: (H + 4, W + 4)
    h = x_ref.shape[1]
    w = x_ref.shape[2]

    sig = jnp.clip(jax.nn.sigmoid(x_ref[0]), CLAMP_EPS, 1.0 - CLAMP_EPS)

    # Halo fill: -1 is below the sigmoid's [1e-6, 1-1e-6] range, so the
    # border never wins the window max (matches -inf padding semantics).
    scratch[:, :] = jnp.full((h + 2 * _PAD, w + 2 * _PAD), -1.0, scratch.dtype)
    scratch[_PAD : _PAD + h, _PAD : _PAD + w] = sig

    m = scratch[0:h, 0:w]
    for dy in range(_WINDOW):
        for dx in range(_WINDOW):
            if dy == 0 and dx == 0:
                continue
            m = jnp.maximum(m, scratch[dy : dy + h, dx : dx + w])

    out_ref[0] = jnp.where(sig == m, sig, jnp.zeros_like(sig))


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_sigmoid_nms(heatmaps: jax.Array, interpret: bool | None = None) -> jax.Array:
    """clamped_sigmoid + 5x5 plateau NMS, one fused kernel.

    heatmaps: (B, H, W, C) raw logits. Returns same-shape suppressed
    probabilities (non-peak pixels zeroed), numerically identical to
    `plateau_nms(clamped_sigmoid(x))`.
    """
    b, h, w, c = heatmaps.shape
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    planes = jnp.transpose(heatmaps, (0, 3, 1, 2)).reshape(b * c, h, w)
    planes = planes.astype(jnp.float32)

    out = pl.pallas_call(
        _sigmoid_nms_kernel,
        out_shape=jax.ShapeDtypeStruct((b * c, h, w), jnp.float32),
        grid=(b * c,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((h + 2 * _PAD, w + 2 * _PAD), jnp.float32)],
        interpret=interpret,
    )(planes)

    return jnp.transpose(out.reshape(b, c, h, w), (0, 2, 3, 1))
