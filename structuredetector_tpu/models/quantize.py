"""Int8 inference convolution for the MXU.

TPU v5e executes s8 x s8 -> s32 convolutions at twice the bf16 peak
(394 vs 197 TOPS). This module provides a drop-in conv for *inference*
quantization:

- weights: symmetric per-output-channel int8, scale = amax/127,
  quantized from the float checkpoint at call time (pre-quantize with
  `prequantize_variables` to hoist this out of the serving graph);
- activations: symmetric per-SAMPLE *dynamic* int8 — each batch
  element's scale comes from its own live values, so no calibration
  dataset is needed (the reference ships none) and, crucially for
  micro-batched serving, one high-range request cannot degrade the
  quantization of its batchmates;
- accumulation in int32 on the MXU, dequantized as
  `y * (x_scale * w_scale[c])` fused into the following elementwise ops.

The param tree is identical to `flax.linen.Conv` ("kernel", "bias"),
so any trained checkpoint loads transparently. Training always uses
the float path (`nn.Conv`); quantized training is out of scope.

No counterpart exists in the reference (its CoreML export runs fp16 on
the ANE, README.md:114); this is TPU-native serving surface.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence, Tuple, Union

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

Padding = Union[str, int, Sequence[Tuple[int, int]]]


def _abs_max(x: jax.Array, axes) -> jax.Array:
    return jnp.max(jnp.abs(x), axis=axes)


def quantize_symmetric(x: jax.Array, scale: jax.Array) -> jax.Array:
    """Round to int8 at `scale` (broadcastable), clipped to [-127, 127]."""
    q = jnp.round(x / scale)
    return jnp.clip(q, -127, 127).astype(jnp.int8)


def weight_qparams(kernel: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(HWIO float kernel) -> (int8 kernel, per-Cout float32 scale)."""
    kernel = kernel.astype(jnp.float32)
    amax = _abs_max(kernel, axes=(0, 1, 2))
    scale = jnp.where(amax > 0, amax, 1.0) / 127.0
    return quantize_symmetric(kernel, scale), scale


class Int8Conv(nn.Module):
    """Inference-only conv: dynamic per-tensor int8 activations x
    per-channel int8 weights -> int32 MXU accumulation -> dequant.

    Same constructor surface (subset) and parameter names as `nn.Conv`.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Union[int, Tuple[int, int]] = 1
    padding: Padding = "SAME"
    use_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            if self.use_bias
            else None
        )

        if kernel.dtype == jnp.int8:
            # pre-quantized tree (prequantize_variables): the kernel is
            # already int8 and its per-channel scale sits alongside it
            w_q = kernel
            w_scale = self.param(
                "kernel_scale", nn.initializers.ones, (self.features,), jnp.float32
            )
        else:
            w_q, w_scale = weight_qparams(kernel)

        x = x.astype(jnp.float32)
        if self.has_variable("params", "act_scale"):
            # calibrated static scale (calibrate_activation_scales):
            # no live amax pass — this is what fixes batch-1 latency,
            # where the per-conv global reduction otherwise serializes
            x_scale = self.param(
                "act_scale", nn.initializers.ones, (), jnp.float32
            )
        else:
            # per-SAMPLE amax (batch axis kept, scale broadcast): in
            # micro-batched serving a single high-range image must not
            # degrade int8 precision for its batchmates — each request's
            # output depends only on its own pixels
            x_amax = _abs_max(x, axes=tuple(range(1, x.ndim)))
            # record the observed input range when a calibration pass
            # asks for it (no-op unless "calibration" is mutable; skipped
            # at init, where every collection is mutable and the sow
            # would leave a stray collection in the variable tree)
            if not self.is_initializing():
                self.sow(
                    "calibration", "act_amax", jnp.max(x_amax),
                    reduce_fn=jnp.maximum,
                    init_fn=lambda: jnp.float32(0.0),
                )
            x_scale = jnp.where(x_amax > 0, x_amax, 1.0) / 127.0
            x_scale = x_scale.reshape((-1,) + (1,) * (x.ndim - 1))
        x_q = quantize_symmetric(x, x_scale)

        strides = (
            (self.strides, self.strides)
            if isinstance(self.strides, int)
            else tuple(self.strides)
        )
        padding = self.padding
        if isinstance(padding, int):
            padding = ((padding, padding), (padding, padding))

        y = lax.conv_general_dilated(
            x_q,
            w_q,
            window_strides=strides,
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (x_scale * w_scale)
        if bias is not None:
            y = y + bias
        return y.astype(self.dtype)


def _int8_eligible(path: Tuple[str, ...]) -> bool:
    """Whether the conv module at `path` (params-tree key path) runs int8.

    Mirrors SDNet/ResNet34Encoder: every residual-block and FPN conv is
    int8; the stem (`encoder/conv1`) and the `head` conv stay float."""
    if not path or path[-1] == "head":
        return False
    if len(path) >= 2 and path[-2] == "encoder" and path[-1] == "conv1":
        return False
    return True


def prequantize_variables(variables: Mapping) -> dict:
    """Pre-quantize the int8-eligible conv kernels of a float checkpoint.

    Returns a new variables pytree where each kernel that `Int8Conv`
    would otherwise quantize per call is stored as int8, with its
    per-output-channel float32 scale alongside as `kernel_scale`.
    `Int8Conv` detects the int8 dtype and skips requantization, so this
    hoists the weight-quantization ops (and the float weight reads) out
    of the serving graph — use it before `export_model` so the artifact
    embeds 4x-smaller weights. Bit-identical to the dynamic path."""

    def walk(tree, path):
        out = {}
        for name, val in tree.items():
            out[name] = walk(val, path + (name,)) if isinstance(val, Mapping) else val
        kernel = out.get("kernel")
        if (
            kernel is not None
            and not isinstance(kernel, Mapping)
            and getattr(kernel, "ndim", 0) == 4
            and _int8_eligible(path)
        ):
            out["kernel"], out["kernel_scale"] = weight_qparams(kernel)
        return out

    out = dict(variables)
    out["params"] = walk(variables["params"], ())
    return out


def calibrate_activation_scales(model, variables: Mapping, batches) -> dict:
    """Bake static per-conv activation scales from calibration data.

    Runs each batch through the (dynamically-quantized) int8 model with
    the "calibration" collection mutable, so every `Int8Conv` records
    the max |input| it saw; the running max across batches becomes a
    static `act_scale` (amax/127) param alongside the conv's kernel.
    Serving with the returned tree skips the per-call global amax
    reduction — the pass that dominates batch-1 latency — at the cost
    of clipping inputs that exceed the calibrated range.

    `batches` is an iterable of (B, H, W, C) image arrays, already
    normalized exactly as at serving time. Calibrating and serving on
    the same single-image batch is bit-identical to the dynamic path
    (with >1 calibration image the static scale is the max over all of
    them, while the dynamic path scales each sample individually).
    Re-calibrating
    an already-calibrated tree works: existing act_scale params are
    stripped first so every conv records fresh ranges."""

    def strip(tree):
        return {
            k: strip(v) if isinstance(v, Mapping) else v
            for k, v in tree.items()
            if k != "act_scale"
        }

    variables = dict(variables)
    variables["params"] = strip(variables["params"])

    amax = None
    for x in batches:
        _, mut = model.apply(variables, x, train=False, mutable=["calibration"])
        if "calibration" not in mut:
            # nothing sowed: the model has no dynamically-quantized conv
            raise ValueError(
                "nothing to calibrate: the model has no Int8Conv running "
                "dynamic quantization (build it with config.int8=True)"
            )
        cal = mut["calibration"]
        amax = cal if amax is None else jax.tree.map(jnp.maximum, amax, cal)
    if amax is None:
        raise ValueError("calibration needs at least one batch")

    def bake(params, cal):
        out = {}
        for name, val in params.items():
            sub = cal.get(name) if isinstance(cal, Mapping) else None
            if isinstance(val, Mapping):
                out[name] = bake(val, sub if isinstance(sub, Mapping) else {})
            else:
                out[name] = val
        if "act_amax" in cal and not isinstance(cal["act_amax"], Mapping):
            a = jnp.asarray(cal["act_amax"], jnp.float32)
            out["act_scale"] = jnp.where(a > 0, a, 1.0) / 127.0
        return out

    out = dict(variables)
    out["params"] = bake(variables["params"], amax)
    return out


def conv(features, kernel_size, *, strides=1, padding="SAME", use_bias=True,
         dtype=jnp.float32, name=None, int8=False):
    """`nn.Conv` or `Int8Conv` with an identical parameter tree —
    the model modules pick per the `int8` inference flag."""
    if int8:
        return Int8Conv(
            features=features, kernel_size=tuple(kernel_size), strides=strides,
            padding=padding, use_bias=use_bias, dtype=dtype, name=name,
        )
    return nn.Conv(
        features, tuple(kernel_size), strides=strides, padding=padding,
        use_bias=use_bias, dtype=dtype, name=name,
    )
