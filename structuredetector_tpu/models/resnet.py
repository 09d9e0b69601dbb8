"""ResNet34 encoder, NHWC, Flax linen.

Architecture matches torchvision's resnet34 used by the reference
(`/root/reference/src/sdnet/model/network.py:41-50`): 7x7/2 stem + 3x3/2
max pool, then BasicBlock stages [3, 4, 6, 3] at widths [64, 128, 256,
512]. Returned as the four stage feature maps (strides 4/8/16/32) for the
FPN decoder.

TPU-first choices: NHWC layout (native conv layout for the MXU), compute
dtype configurable (bf16 by default via the model wrapper), parameters
and batch-norm statistics always float32. Submodule names mirror the
torchvision state_dict so pretrained/reference weights can be bridged
mechanically (`models.torch_bridge`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .quantize import conv

STAGE_SIZES = (3, 4, 6, 3)  # resnet34
STAGE_WIDTHS = (64, 128, 256, 512)


def space_to_depth(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, H/2, W/2, 4C); channel = (ry*2 + rx)*C + c."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def stem_kernel_to_s2d(k7):
    """Rewrite a 7x7/stride-2 stem kernel (7, 7, Cin, Cout) as the
    exactly-equivalent 4x4/stride-1 kernel (4, 4, 4*Cin, Cout) over
    space-to-depth(2) input.

    The 7x7 kernel (taps at offsets -3..3 around the output center) is
    zero-padded to 8x8 (offsets -4..3) and split by tap parity: tap
    t = 2u + r lands at s2d kernel position u, phase r. With input
    padding ((2, 1), (2, 1)) the receptive field and zero-padding
    semantics match the original conv exactly; outputs differ only by
    summation order (fp rounding)."""
    import numpy as np

    k7 = np.asarray(k7)
    kh, kw, cin, cout = k7.shape
    assert (kh, kw) == (7, 7), f"expected a 7x7 stem kernel, got {k7.shape}"
    kpad = np.zeros((8, 8, cin, cout), k7.dtype)
    kpad[1:, 1:] = k7
    out = np.zeros((4, 4, 4 * cin, cout), k7.dtype)
    for ry in (0, 1):
        for rx in (0, 1):
            g = (ry * 2 + rx) * cin
            out[:, :, g : g + cin, :] = kpad[ry::2, rx::2, :, :]
    return out


class BasicBlock(nn.Module):
    """torchvision BasicBlock: 3x3-BN-ReLU-3x3-BN + identity, ReLU."""

    filters: int
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    int8: bool = False  # inference-only int8 convs (models.quantize)

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        y = conv(
            self.filters, (3, 3), strides=self.stride, padding=1, use_bias=False,
            dtype=self.dtype, name="conv1", int8=self.int8,
        )(x)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype, name="bn1",
        )(y)
        # BN math/stats stay f32 in train; the activation tensor (and its
        # cotangent) is cast back to compute dtype so the materialized
        # inter-fusion buffers are bf16 (halves HBM traffic of the
        # bandwidth-bound train-step tail).
        y = nn.relu(y.astype(self.dtype))
        y = conv(
            self.filters, (3, 3), strides=1, padding=1, use_bias=False,
            dtype=self.dtype, name="conv2", int8=self.int8,
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype, name="bn2",
        )(y)
        y = y.astype(self.dtype)

        if self.stride != 1 or identity.shape[-1] != self.filters:
            identity = conv(
                self.filters, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv", int8=self.int8,
            )(identity)
            identity = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32 if train else self.dtype, name="downsample_bn",
            )(identity)
            identity = identity.astype(self.dtype)

        return nn.relu(y + identity.astype(y.dtype))


class Bottleneck(nn.Module):
    """torchvision Bottleneck (v1.5: stride on the 3x3): 1x1 reduce -
    3x3 - 1x1 expand(x4), BN after each, identity add, ReLU."""

    filters: int  # base width; output channels = 4 * filters
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    int8: bool = False  # inference-only int8 convs (models.quantize)
    EXPANSION = 4

    @nn.compact
    def __call__(self, x, train: bool):
        out_ch = self.filters * self.EXPANSION
        identity = x

        def bn(y, name):
            y = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32 if train else self.dtype, name=name,
            )(y)
            return y.astype(self.dtype)  # bf16 activations, f32 BN math

        y = conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                 name="conv1", int8=self.int8)(x)
        y = nn.relu(bn(y, "bn1"))
        y = conv(self.filters, (3, 3), strides=self.stride, padding=1,
                 use_bias=False, dtype=self.dtype, name="conv2",
                 int8=self.int8)(y)
        y = nn.relu(bn(y, "bn2"))
        y = conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype,
                 name="conv3", int8=self.int8)(y)
        y = bn(y, "bn3")

        if self.stride != 1 or identity.shape[-1] != out_ch:
            identity = conv(
                out_ch, (1, 1), strides=self.stride, use_bias=False,
                dtype=self.dtype, name="downsample_conv", int8=self.int8,
            )(identity)
            identity = bn(identity, "downsample_bn")

        return nn.relu(y + identity.astype(y.dtype))


# backbone name -> (block module, blocks per stage)
ARCHS = {
    "resnet18": (BasicBlock, (2, 2, 2, 2)),
    "resnet34": (BasicBlock, (3, 4, 6, 3)),
    "resnet50": (Bottleneck, (3, 4, 6, 3)),
}


class ResNet34Encoder(nn.Module):
    """Stem + 4 stages; returns (C2, C3, C4, C5) at strides (4, 8, 16, 32).

    Despite the historical name this builds any `ARCHS` backbone
    (`arch` field); submodule names mirror the torchvision state_dict
    per family so `models.torch_bridge` maps mechanically."""

    dtype: jnp.dtype = jnp.float32
    arch: str = "resnet34"
    stage_widths: Sequence[int] = STAGE_WIDTHS
    # int8 inference convs in the residual blocks (models.quantize).
    # The stem stays float: its 3-channel contraction underfills the MXU
    # whatever the dtype, and the normalized input has the widest range.
    int8: bool = False
    # Space-to-depth stem: mathematically equivalent 4x4/1 conv on 12
    # channels instead of 7x7/2 on 3 (see stem_kernel_to_s2d). The 3-in-
    # channel strided conv is the single worst-mapped op on the MXU; the
    # s2d form keeps the same receptive field with a denser contraction.
    s2d_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jax.Array, ...]:
        # Stem ("adapter" in the reference, network.py:43-45)
        if self.s2d_stem:
            x = nn.Conv(
                64, (4, 4), strides=1, padding=((2, 1), (2, 1)),
                use_bias=False, dtype=self.dtype, name="conv1",
            )(space_to_depth(x))
        else:
            x = nn.Conv(
                64, (7, 7), strides=2, padding=3, use_bias=False, dtype=self.dtype,
                name="conv1",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype, name="bn1",
        )(x)
        x = nn.relu(x.astype(self.dtype))
        # torch MaxPool2d(3, stride=2, padding=1)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        block_cls, stage_sizes = ARCHS[self.arch]
        feats = []
        for stage, (n_blocks, width) in enumerate(zip(stage_sizes, self.stage_widths)):
            for block in range(n_blocks):
                stride = 2 if stage > 0 and block == 0 else 1
                x = block_cls(
                    width, stride=stride, dtype=self.dtype, int8=self.int8,
                    name=f"layer{stage + 1}_{block}",
                )(x, train=train)
            feats.append(x)
        return tuple(feats)
