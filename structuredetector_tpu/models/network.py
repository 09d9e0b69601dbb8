"""SDNet: ResNet34 encoder + FPN decoder + 1x1 head, NHWC.

Structure matches the reference `Network`
(`/root/reference/src/sdnet/model/network.py:32-87`):

- encoder: ResNet34 (stages C2..C5),
- `up1`: 1x1 conv 512 -> fpn_depth on C5 (network.py:52),
- `up2..up4`: FPN up-blocks — nearest x2 upsample + 1x1 lateral conv on
  the skip + sum + 3x3 conv(bias=False)+BN+ReLU (Fpn, network.py:6-19),
- `head`: single 1x1 conv to M+N+4 channels (network.py:22-29, :57),
- output stride 4; the head output splits into anchor heatmaps (M),
  part heatmaps (N), shared sub-pixel offsets (2) and grouping
  embeddings (2) on the channel axis (network.py:77-84).

No activation inside the network — sigmoid is applied by the loss and
the decoder, keeping the exported graph raw (network.py:74-75).

TPU-first: NHWC, bf16 compute / fp32 params+BN, nearest upsample as a
cheap reshape-broadcast (no gather), all shapes static under jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from .quantize import conv
from .resnet import ResNet34Encoder


def upsample2x_nearest(x: jax.Array) -> jax.Array:
    """Nearest-neighbor x2 upsample of (B, H, W, C) via broadcast —
    equivalent to torch nn.Upsample(scale_factor=2) (network.py:10)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


# Measured and rejected, twice (round 4), targeting the 2.4 ms the
# int8 serving step spends materializing this broadcast and then
# re-reading it to quantize the FPN conv input (batch-128 f1 level):
# (a) an expression shuffle (dim-split reshape on `lateral` so the ×2
#     broadcast stays an unmaterialized add operand): 3 943 vs
#     3 950 img/s — XLA just moves the copy onto the reshaped lateral;
# (b) a Pallas fused upsample+add+quantize kernel handed to Int8Conv
#     (MXU one-hot dot for the sublane interleave, bit-exact f32-sum
#     semantics): the kernel itself beat the XLA pair (1.60 vs
#     2.44 ms), but a Pallas custom call pins default {3,2,1,0}
#     layouts, and XLA's layout assignment re-laid-out the surrounding
#     conv region around it — the f1 conv split into an s32-
#     materializing pass + two relayout fusions (4.1 -> 9.5 ms) and
#     the 64x64 conv fusions broke the same way. Net: 3 950 ->
#     2 791 img/s. See DESIGN.md "The fused decode front" for why the
#     decode kernels DON'T pay this: they sit at a natural layout
#     boundary (post-head, already row-major planes).


class FpnBlock(nn.Module):
    """Upsample x2 + lateral 1x1 + add + 3x3 conv(bias=False)+BN+ReLU
    (reference Fpn, network.py:6-19)."""

    filters: int
    dtype: jnp.dtype = jnp.float32
    int8: bool = False  # inference-only int8 convs (models.quantize)

    @nn.compact
    def __call__(self, x, skip, train: bool):
        lateral = conv(
            self.filters, (1, 1), use_bias=True, dtype=self.dtype,
            name="lateral", int8=self.int8,
        )(skip)
        y = upsample2x_nearest(x) + lateral
        y = conv(
            self.filters, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
            name="conv", int8=self.int8,
        )(y)
        y = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=jnp.float32 if train else self.dtype, name="bn",
        )(y)
        # BN math f32 in train, activation buffer back to compute dtype
        # (see resnet.BasicBlock) — halves HBM traffic around each BN.
        return nn.relu(y.astype(self.dtype))


class _CFirstHead(nn.Module):
    """The 1x1 head evaluated channel-leading: out (F, B, H, W).

    Parameter tree identical to the `nn.Conv` head (kernel (1,1,C,F),
    bias (F,)), so checkpoints swap freely between layouts. Why: the
    NHWC head writes an (B,H,W,7)-shaped map whose 7-channel minor dim
    rides the 128-wide vector lanes at 7/128 utilization — measured
    1.83 ms of a 31.6 ms batch-128 int8 serving step on v5e. Expressed
    as dot_general(kernel (C,F), x (B,H,W,C)) the natural output order
    is (F, B, H, W): H*W rides the lanes, the write runs at full rate,
    and the channel-leading layout is exactly what the decode top-k
    wants (it otherwise starts by transposing NHWC to (B,C,H*W))."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        w = kernel[0, 0].astype(self.dtype)  # (C, F)
        y = jnp.einsum("cf,bhwc->fbhw", w, x.astype(self.dtype))
        return y + bias.astype(self.dtype)[:, None, None, None]


class SDNet(nn.Module):
    """Anchor+parts structure detection network, output stride 4."""

    n_labels: int  # M
    n_parts: int  # N
    fpn_depth: int = 128
    dtype: jnp.dtype = jnp.float32
    s2d_stem: bool = False  # see resnet.ResNet34Encoder.s2d_stem
    backbone: str = "resnet34"  # any key of resnet.ARCHS
    # int8 inference: residual-block + FPN convs run s8xs8->s32 on the
    # MXU (2x bf16 peak on v5e); stem and head stay float (MXU-underfilled
    # 3- and M+N+4-channel contractions; the head feeds decode thresholds).
    # Inference-only: training with int8 is rejected.
    int8: bool = False
    # Hidden head width: 0 = the reference's single 1x1 head
    # (network.py:22-29). > 0 inserts a 3x3 conv + ReLU before the 1x1
    # (the standard CenterNet head) — gives the regression outputs
    # (embeddings especially) local capacity the thin shared 1x1 lacks;
    # see DESIGN.md "Structural grouping".
    head_conv: int = 0
    # "nhwc" (default, training + parity surface) or "cfirst": the
    # serving layout where the head is a dot_general emitting
    # (M+N+4, B, H, W) — full-lane writes of the thin-channel output
    # and zero transposes into the decode top-k (see _CFirstHead).
    # Inference-only; identical params either way.
    head_layout: str = "nhwc"

    @property
    def out_channels(self) -> int:
        return self.n_labels + self.n_parts + 4

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False, raw_output: bool = False
    ):
        if self.int8 and train:
            raise ValueError("int8 is an inference-only mode; train in float")
        x = x.astype(self.dtype)
        c2, c3, c4, c5 = ResNet34Encoder(
            dtype=self.dtype, arch=self.backbone, s2d_stem=self.s2d_stem,
            int8=self.int8, name="encoder",
        )(x, train=train)

        f4 = conv(
            self.fpn_depth, (1, 1), use_bias=True, dtype=self.dtype, name="up1",
            int8=self.int8,
        )(c5)
        f3 = FpnBlock(self.fpn_depth, dtype=self.dtype, int8=self.int8,
                      name="up2")(f4, c4, train=train)
        f2 = FpnBlock(self.fpn_depth, dtype=self.dtype, int8=self.int8,
                      name="up3")(f3, c3, train=train)
        f1 = FpnBlock(self.fpn_depth, dtype=self.dtype, int8=self.int8,
                      name="up4")(f2, c2, train=train)

        if self.head_conv > 0:
            f1 = nn.relu(nn.Conv(
                self.head_conv, (3, 3), padding=1, use_bias=True,
                dtype=self.dtype, name="head_hidden",
            )(f1))
        nb_hm = self.n_labels + self.n_parts
        if self.head_layout == "cfirst":
            if train:
                raise ValueError("head_layout='cfirst' is inference-only; "
                                 "train with the default NHWC head")
            out = _CFirstHead(
                self.out_channels, dtype=self.dtype, name="head"
            )(f1)
            out = out.astype(jnp.float32)
            if raw_output:
                return out  # (M+N+4, B, H/4, W/4)
            return {
                "anchor_hm": out[: self.n_labels],
                "part_hm": out[self.n_labels : nb_hm],
                "offsets": out[nb_hm : nb_hm + 2],
                "embeddings": out[nb_hm + 2 : nb_hm + 4],
            }
        if self.head_layout != "nhwc":
            raise ValueError(f"unknown head_layout {self.head_layout!r}")

        out = nn.Conv(
            self.out_channels, (1, 1), use_bias=True, dtype=self.dtype, name="head"
        )(f1)
        out = out.astype(jnp.float32)

        if raw_output:
            return out  # (B, H/4, W/4, M+N+4)

        return {
            "anchor_hm": out[..., : self.n_labels],
            "part_hm": out[..., self.n_labels : nb_hm],
            "offsets": out[..., nb_hm : nb_hm + 2],
            "embeddings": out[..., nb_hm + 2 : nb_hm + 4],
        }


def build_model(config, dtype: Optional[jnp.dtype] = None,
                head_layout: str = "nhwc") -> SDNet:
    return SDNet(
        n_labels=config.n_labels,
        n_parts=config.n_parts,
        fpn_depth=config.fpn_depth,
        dtype=dtype if dtype is not None else config.compute_dtype,
        s2d_stem=getattr(config, "s2d_stem", False),
        backbone=getattr(config, "backbone", "resnet34"),
        int8=getattr(config, "int8", False),
        head_conv=getattr(config, "head_conv", 0),
        head_layout=head_layout,
    )


import functools


@functools.lru_cache(maxsize=16)
def _cached_init_fn(n_labels: int, n_parts: int, fpn_depth: int, dtype_name: str,
                    h: int, w: int, c: int, s2d_stem: bool = False,
                    backbone: str = "resnet34", head_conv: int = 0):
    """One compiled init program per unique model signature per process
    (plain `jax.jit(lambda ...)` would recompile for every new lambda)."""
    model = SDNet(
        n_labels=n_labels, n_parts=n_parts, fpn_depth=fpn_depth,
        dtype=jnp.dtype(dtype_name), s2d_stem=s2d_stem, backbone=backbone,
        head_conv=head_conv,
    )
    dummy = jnp.zeros((1, h, w, c), jnp.float32)
    return jax.jit(lambda rng: model.init(rng, dummy, train=False))


def init_model(
    config, rng: Optional[jax.Array] = None, input_size: Optional[Tuple[int, int]] = None
) -> Tuple[SDNet, Dict[str, Any]]:
    """Initialize model variables ({'params', 'batch_stats'})."""
    model = build_model(config)
    rng = rng if rng is not None else jax.random.PRNGKey(config.seed)
    w, h = input_size or config.input_size
    init_fn = _cached_init_fn(
        config.n_labels, config.n_parts, config.fpn_depth,
        jnp.dtype(config.compute_dtype).name, h, w, config.in_channels,
        getattr(config, "s2d_stem", False),
        getattr(config, "backbone", "resnet34"),
        getattr(config, "head_conv", 0),
    )
    return model, init_fn(rng)


def save_params(variables: Dict[str, Any], path) -> None:
    """Serialize model variables (params + batch_stats) to msgpack —
    the analog of the reference's `torch.save(state_dict)`
    (network.py:86-87)."""
    from pathlib import Path

    import os

    data = flax.serialization.msgpack_serialize(
        jax.tree.map(lambda x: jax.device_get(x), flax.core.unfreeze(variables))
    )
    # Atomic replace: checkpoint files are resume-critical (the stall
    # watchdog's os._exit / SIGKILL preemption can land mid-write), so
    # never leave a truncated file at the final path.
    path = Path(path)
    tmp = path.with_name(path.name + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def load_params(path) -> Dict[str, Any]:
    """Load model variables saved by `save_params`, or bridge a torch
    `.pth` state_dict (reference checkpoint) transparently."""
    from pathlib import Path

    path = Path(path)
    if path.suffix in {".pth", ".pt"}:
        from .torch_bridge import load_torch_checkpoint

        return load_torch_checkpoint(path)
    return flax.serialization.msgpack_restore(path.read_bytes())


def _adapt_stem(loaded: Dict[str, Any], init_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Reconcile the stem kernel layout between a checkpoint and the
    model being loaded into. A standard 7x7 stem checkpoint loads into
    an `--s2d_stem` model via the exact kernel rewrite
    (`resnet.stem_kernel_to_s2d`); the reverse direction is impossible
    (the s2d kernel's padded taps train away from zero) and errors."""
    import numpy as np

    try:
        # full checkpoints nest the encoder; encoder-only bridge trees
        # (torchvision warm start) are the encoder itself
        enc = loaded["params"].get("encoder", loaded["params"])
        have = enc["conv1"]["kernel"]
        want = init_variables["params"]["encoder"]["conv1"]["kernel"]
    except (KeyError, TypeError, AttributeError):
        return loaded
    have_shape = tuple(np.shape(have))
    want_shape = tuple(want.shape)
    if have_shape == want_shape:
        return loaded
    if have_shape[:2] == (7, 7) and want_shape[:2] == (4, 4):
        from .resnet import stem_kernel_to_s2d

        enc["conv1"]["kernel"] = stem_kernel_to_s2d(have)
        return loaded
    if have_shape[:2] == (4, 4) and want_shape[:2] == (7, 7):
        raise ValueError(
            "This checkpoint was trained with --s2d_stem (4x4 stem kernel); "
            "pass --s2d_stem to load it. A trained s2d stem cannot be "
            "folded back into a 7x7/stride-2 conv."
        )
    raise ValueError(
        f"Stem kernel shape mismatch: checkpoint {have_shape} vs model {want_shape}"
    )


def resolve_variables(path, init_variables: Dict[str, Any]) -> Dict[str, Any]:
    """Load a checkpoint for inference/training start.

    Full checkpoints replace `init_variables`; an encoder-only bridge
    (raw torchvision resnet34 `.pth`) warm-starts just the encoder
    (reference network.py:41 ImageNet init). Stem kernels are adapted
    to the model's layout (`_adapt_stem`) in both cases."""
    loaded = load_params(path)
    if loaded.pop("encoder_only", False):
        from .torch_bridge import warm_start_encoder

        loaded = _adapt_stem(loaded, init_variables)
        return warm_start_encoder(init_variables, loaded)
    return _adapt_stem(loaded, init_variables)
