"""Typed configuration shared by all CLIs.

Flag names, defaults, and validation mirror the reference's argparse
`Arguments` (`/root/reference/src/sdnet/utils/args.py:11-269`) so that a
user of the reference can reuse their command lines unchanged. Device
selection differs: this framework targets TPU via JAX and adds mesh /
precision knobs instead of cuda/mps autodetect (`args.py:241-249`).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, Optional, Tuple

from .annotations import get_unique_color_map

DEFAULT_SEED = 926354916  # reference args.py:257


@dataclasses.dataclass
class Config:
    # data
    train_dir: Optional[Path] = None
    valid_dir: Optional[Path] = None
    labels_path: Path = Path("labels.json")
    anchor_name: str = "anchor"

    # model
    width: int = 512
    height: int = 512
    in_channels: int = 3
    fpn_depth: int = 128
    down_ratio: float = 4.0
    pretrained_model: Optional[Path] = None  # --load_model

    # training
    batch_size: int = 8
    epochs: int = 100
    no_augmentation: bool = False
    learning_rate: float = 1e-3
    lr_step: int = 3  # number of /10 divisions; converted to step size at parse
    hm_loss_fn: str = "mse"
    max_objects: int = 20
    max_parts: int = 40
    hm_weight: float = 1.0
    offset_weight: float = 1e-3
    embedding_weight: float = 1e-3
    sigma_gauss: float = 0.1

    # decode / eval thresholds
    conf_threshold: float = 0.5
    dist_threshold: float = 0.05
    decoder_dist_thresh: float = 0.1
    csi_threshold: float = 0.75
    csv_path: Optional[Path] = None
    summary_path: Optional[Path] = None
    # evaluate-only: re-decode the same forward outputs at each of these
    # confidence thresholds (one pass over the dataset, one metric table
    # per threshold) — deployment threshold selection without N eval runs
    conf_sweep: Optional[Tuple[float, ...]] = None

    # precision: "--amp" in the reference enables autocast; on TPU the
    # native mixed precision is bf16 compute + fp32 params, which is the
    # default here. `use_amp=False` forces full fp32 compute.
    use_amp: bool = True

    # TPU / parallelism
    data_parallel: int = 0  # 0 = all available devices on the "data" axis
    model_parallel: int = 1
    profile: bool = False
    # Abort (exit code 87) if no training/validation step completes for
    # this many seconds. A wedged device RPC (e.g. a dropped tunnel
    # connection to a remote TPU) blocks the main thread in
    # uninterruptible C code forever; the watchdog turns that silent
    # stall into a fast, resumable failure (pair with --resume or
    # tools/train_supervised.sh). 0 disables. Set it well above the
    # longest legitimate gap — first-epoch compiles of a new resolution
    # bucket can take minutes on a cold cache.
    stall_timeout_s: float = 0.0
    # Return freed glibc heap to the OS at each epoch end. Mitigation
    # lever for the anonymous-heap RSS growth observed on long
    # multi-scale runs through tunneled backends (ROADMAP.md
    # "Performance"); opt-in because it costs a heap walk per epoch.
    malloc_trim: bool = False
    # Exponential moving average of the params (decay per step; 0 = off).
    # Validation and the 4-best snapshots use the averaged params,
    # persisted separately as ema_params.msgpack (loadable via
    # --load_model); the Orbax train-state checkpoint keeps the live
    # params. A standard CenterNet-family training stabilizer the
    # reference lacks. One fused multiply-add pytree op per step.
    ema: float = 0.0
    # Compile every multi-scale resolution bucket before the first epoch
    # (default on): without it each of the 9 bucket shapes pays a cold
    # jit mid-training, stalling a random epoch for the compile time and
    # forcing --stall_timeout_s to stay loose. Pairs with
    # --compile_cache for instant re-warm across runs.
    prewarm: bool = True
    # Persistent XLA compilation-cache directory ('' = off). With it,
    # pre-warm and resumed runs reuse compiled programs across processes.
    compile_cache: str = ""

    seed: int = DEFAULT_SEED
    # host-side loader threads; -1 = auto, min(cpu_count, 4) like the
    # reference (args.py:251). 0 = fully synchronous loading.
    num_workers: int = -1
    # Native C++ IO (fused decode+resize+normalize on a no-GIL thread
    # pool; see native/sdnet_io.cpp). Default mode is bit-identical to
    # the PIL host path (Pillow-semantics resample) and ~1.4x faster
    # per core, so it's on by default; falls back to PIL when the
    # library isn't built (`make -C native`).
    native_io: bool = True
    # Approximate fast mode for the *training* feed only: DCT-space
    # scaled JPEG decode + 2-tap bilinear (~2.2x PIL per core; small
    # pixel differences). Validation/eval always uses the exact mode.
    native_io_fast: bool = False
    # Run color jitter + flips inside the jitted train step on the TPU
    # (host only decodes+resizes). Disable for the reference's host-side
    # PIL augmentation path.
    device_augment: bool = True
    # In device-augment mode, ship the training batch as raw uint8 and
    # do /255 inside the jitted step: 4x less host->device transfer
    # (512x512x3: 0.75 vs 3 MB/img). Bit-identical to the float feed in
    # bf16 compute (every u8 level rounds to the same bf16 either way);
    # in fp32 mode XLA's reciprocal-multiply rewrite leaves <=1-ulp
    # input rounding. Same design as the serving feed
    # (`make_forward(from_uint8=True)`). Ignored outside device-augment
    # mode, where the host must normalize (reference parity for
    # eval/host-augment paths).
    uint8_feed: bool = True
    # Warm-start the encoder from a locally cached torchvision ImageNet
    # resnet34 checkpoint (reference network.py:41 `pretrained=True`).
    pretrained_backbone: bool = False
    # Encoder family. The reference ships exactly one (ResNet34,
    # network.py:41); resnet18/resnet50 are drop-in alternates sharing
    # the same FPN/head (the FPN convs are channel-agnostic) and the
    # same torchvision weight bridge.
    backbone: str = "resnet34"
    # Space-to-depth stem: replace the 7x7/stride-2 stem conv (3 input
    # channels badly underfill the MXU) with the equivalent 4x4/stride-1
    # conv on space-to-depth(2) input. Same function at init / when
    # loading a 7x7 checkpoint (kernel is rewritten exactly); the padded
    # taps then train freely, so an s2d-trained checkpoint requires this
    # flag to load.
    s2d_stem: bool = False
    # Hidden head width: 0 = the reference's single shared 1x1 head.
    # > 0 inserts a 3x3 conv + ReLU before the 1x1 (the standard
    # CenterNet head shape) — extra local capacity for the regression
    # outputs; changes the checkpoint layout (pass the same value at
    # evaluate/detect/export time).
    head_conv: int = 0
    # Train-time flip probability (h and v independently). 0.5 matches
    # the reference's intent (its randn quirk actually flips ~69%,
    # reproducible via data.augment legacy_flip). Flip augmentation
    # interacts with the embedding head: displacement targets flip SIGN
    # with the image, so the net must break mirror-equivariance to
    # regress them — see DESIGN.md "Structural grouping". 0 disables.
    flip_prob: float = 0.5
    # Int8 inference: residual-block + FPN convs quantize dynamically to
    # s8xs8->s32 MXU ops (2x bf16 peak on v5e). Inference only — train
    # rejects it. See models/quantize.py.
    int8: bool = False
    debug_nans: bool = False  # enable jax_debug_nans (SURVEY.md §5)
    resume_dir: Optional[Path] = None  # trainings/<ts> dir to resume from
    # evaluation device batch (metrics identical; >1 amortizes dispatch)
    eval_batch_size: int = 1
    # detect: sliding-window tiling for images larger than the network
    # input (Predictor.predict_tiled) instead of downscaling them
    tiled: bool = False
    tile_overlap: float = 0.25  # fraction of shared border between tiles

    # label maps, filled by `finalize()`
    labels: Dict[str, int] = dataclasses.field(default_factory=dict)
    parts: Dict[str, int] = dataclasses.field(default_factory=dict)

    # ------------------------------------------------------------------
    @property
    def n_labels(self) -> int:
        return len(self.labels)

    @property
    def n_parts(self) -> int:
        return len(self.parts)

    @property
    def out_channels(self) -> int:
        """Head channels: M anchor heatmaps + N part heatmaps + 2 offsets
        + 2 embeddings (reference network.py:38)."""
        return self.n_labels + self.n_parts + 4

    @property
    def input_size(self) -> Tuple[int, int]:
        return (self.width, self.height)

    @property
    def r_labels(self) -> Dict[int, str]:
        return {v: k for k, v in self.labels.items()}

    @property
    def r_parts(self) -> Dict[int, str]:
        return {v: k for k, v in self.parts.items()}

    @property
    def label_color_map(self) -> Dict[str, tuple]:
        return get_unique_color_map(self.labels)

    @property
    def part_color_map(self) -> Dict[str, tuple]:
        return get_unique_color_map(self.parts)

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.use_amp else jnp.float32

    # ------------------------------------------------------------------
    def validate(self) -> "Config":
        """Same invariants as the reference parse() (args.py:181-211)."""
        assert self.width % 32 == 0 and self.width > 0, (
            "Width should be divisible by 32 and greater than 0"
        )
        assert self.height % 32 == 0 and self.height > 0, (
            "Height should be divisible by 32 and greater than 0"
        )
        assert self.in_channels > 0
        assert self.fpn_depth > 0
        assert self.batch_size > 0
        assert self.epochs > 0
        assert self.learning_rate > 0
        assert self.lr_step >= 0
        assert self.down_ratio > 0
        assert self.max_objects > 0
        assert self.max_parts > 0
        assert self.hm_weight >= 0
        assert self.offset_weight >= 0
        assert self.embedding_weight >= 0
        assert 0 <= self.conf_threshold <= 1
        assert 0 <= self.dist_threshold <= 1
        assert 0 <= self.decoder_dist_thresh <= 1
        if self.conf_sweep is not None:
            assert self.conf_sweep, "--conf_sweep needs at least one threshold"
            assert all(0 <= t <= 1 for t in self.conf_sweep), (
                f"--conf_sweep thresholds must be in [0, 1]: {self.conf_sweep}"
            )
        assert 0 <= self.ema < 1, f"--ema must be in [0, 1): {self.ema}"
        assert 0 <= self.csi_threshold <= 1
        assert 0 < self.sigma_gauss <= 1
        if self.hm_loss_fn.lower() not in {"focal", "mse"}:
            raise ValueError(
                f"unknown hm_loss_fn {self.hm_loss_fn!r}: pick 'focal' or 'mse'"
            )
        from .models.resnet import ARCHS

        if self.backbone not in ARCHS:
            raise ValueError(
                f"unknown backbone {self.backbone!r}: pick one of {sorted(ARCHS)}"
            )
        if self.num_workers < 0:  # auto: reference num_workers policy (args.py:251)
            self.num_workers = min(os.cpu_count() or 1, 4)
        return self

    def load_labels(self) -> "Config":
        """Load the name->index maps from the labels JSON
        (args.py:224-239, same list/dict/str forms)."""
        data = json.loads(Path(self.labels_path).expanduser().resolve().read_text())
        self.labels = _as_index_map(data["labels"])
        self.parts = _as_index_map(data["parts"])
        return self

    def set_labels(self, labels, parts) -> "Config":
        self.labels = _as_index_map(labels)
        self.parts = _as_index_map(parts)
        return self

    def lr_step_epochs(self) -> int:
        """StepLR step size in epochs: epochs // lr_step, or `epochs`
        (i.e. never) when lr_step == 0 (args.py:213-215)."""
        return int(self.epochs / self.lr_step) if self.lr_step != 0 else self.epochs

    def grid_size(self, input_size: Optional[Tuple[int, int]] = None) -> Tuple[int, int]:
        w, h = input_size or self.input_size
        return int(w / self.down_ratio), int(h / self.down_ratio)

    def finalize(self) -> "Config":
        self.validate()
        if not self.labels:
            self.load_labels()
        return self


def _as_index_map(value) -> Dict[str, int]:
    if isinstance(value, dict):
        return dict(value)
    if isinstance(value, (list, tuple)):
        return {v: i for i, v in enumerate(value)}
    return {value: 0}


# ----------------------------------------------------------------------
# CLI


def build_parser(parser: Optional[argparse.ArgumentParser] = None) -> argparse.ArgumentParser:
    """Argparse front-end with the reference's flag names and defaults
    (args.py:17-175) plus TPU-specific additions."""
    p = parser or argparse.ArgumentParser(
        formatter_class=argparse.ArgumentDefaultsHelpFormatter
    )
    d = Config()

    p.add_argument("--train_dir", type=str, help="The training directory.")
    p.add_argument("--valid_dir", type=str, help="The validation directory.")
    p.add_argument("--labels", "-m", dest="labels_path", type=str, default=str(d.labels_path),
                   help="Json file of anchor and part names.")
    p.add_argument("--anchor_name", "-s", type=str, default=d.anchor_name,
                   help="Name of the keypoint representing the anchor of the object.")
    p.add_argument("--width", "-W", type=int, default=d.width, help="The network input width.")
    p.add_argument("--height", "-H", type=int, default=d.height, help="The network input height.")
    p.add_argument("--in_channels", "-c", type=int, default=d.in_channels,
                   help="Number of input channels.")
    p.add_argument("--fpn_depth", type=int, default=d.fpn_depth,
                   help="Depth of FPN layers of the decoder.")
    p.add_argument("--load_model", "-o", dest="pretrained_model", default=None,
                   help="Load a previously trained model for evaluation or inference "
                        "(orbax/msgpack checkpoint, or a torch .pth to bridge).")
    p.add_argument("--batch_size", "-b", type=int, default=d.batch_size,
                   help="Batch size for training.")
    p.add_argument("--epochs", "-e", type=int, default=d.epochs,
                   help="The number of epochs to train.")
    p.add_argument("--no_augmentation", "-a", action="store_true",
                   help="Disable augmentations during training.")
    p.add_argument("--learning_rate", "-l", type=float, default=d.learning_rate,
                   help="The learning rate for training.")
    p.add_argument("--lr_step", type=int, default=d.lr_step,
                   help="Number of divisions by 10 of the learning rate during training.")
    p.add_argument("--down_ratio", "-g", type=float, default=d.down_ratio,
                   help="Downsampling ratio of the network output.")
    p.add_argument("--hm_loss_fn", "-f", type=str, default=d.hm_loss_fn,
                   help="Loss for heatmap regression: 'focal' or 'mse'.")
    p.add_argument("--max_objects", "-n", type=int, default=d.max_objects,
                   help="Maximum number of objects detectable in an image.")
    p.add_argument("--max_parts", "-k", type=int, default=d.max_parts,
                   help="Maximum number of parts detectable in an image.")
    p.add_argument("--hm_weight", type=float, default=d.hm_weight,
                   help="Weight for the heatmap loss.")
    p.add_argument("--offset_weight", type=float, default=d.offset_weight,
                   help="Weight for the offset loss.")
    p.add_argument("--embedding_weight", type=float, default=d.embedding_weight,
                   help="Weight for the embedding loss.")
    p.add_argument("--sigma_gauss", type=float, default=d.sigma_gauss,
                   help="Gaussian splat size in percent of image side length.")
    p.add_argument("--conf_threshold", "-t", type=float, default=d.conf_threshold,
                   help="Confidence threshold for keypoint detection, in [0, 1].")
    p.add_argument("--dist_threshold", "-d", type=float, default=d.dist_threshold,
                   help="Eval match radius in percent of min image length, in [0, 1].")
    p.add_argument("--decoder_dist_thresh", type=float, default=d.decoder_dist_thresh,
                   help="Part->anchor linkage radius in percent of min image length.")
    p.add_argument("--csi_threshold", type=float, default=d.csi_threshold,
                   help="CSI threshold for evaluation, in [0, 1].")
    p.add_argument("--save_csv_eval", dest="csv_path", type=Path, default=None)
    p.add_argument("--save_summary", dest="summary_path", type=Path, default=None,
                   help="Write the flat metric summary (scalar_summary) as JSON.")
    p.add_argument("--conf_sweep", type=str, default=None,
                   help="evaluate only: comma-separated confidence thresholds "
                        "(e.g. 0.2,0.3,0.4); the dataset is forwarded ONCE and "
                        "re-decoded per threshold, printing one metric row "
                        "each — deployment threshold selection in one run.")
    p.add_argument("--amp", action="store_true", dest="amp_flag",
                   help="Mixed precision (bf16 compute) — the TPU default, so this "
                        "flag confirms it; conflicts with --no_amp.")
    p.add_argument("--no_amp", action="store_true", help="Force fp32 compute.")
    p.add_argument("--pretrained", action="store_true", dest="pretrained_backbone",
                   help="Warm-start the ResNet34 encoder from a locally cached "
                        "torchvision ImageNet checkpoint (searched in "
                        "$SDNET_PRETRAINED, then $TORCH_HOME/hub/checkpoints; "
                        "reference default behavior, network.py:41).")
    p.add_argument("--data_parallel", type=int, default=d.data_parallel,
                   help="Devices on the data-parallel mesh axis (0 = all).")
    p.add_argument("--model_parallel", type=int, default=d.model_parallel,
                   help="Devices on the model-parallel mesh axis.")
    p.add_argument("--profile", action="store_true",
                   help="Capture a jax.profiler trace of a few training steps.")
    p.add_argument("--stall_timeout_s", type=float, default=d.stall_timeout_s,
                   help="Abort with exit code 87 if no step completes for "
                        "this many seconds (wedged device RPC detector; "
                        "0 = off). Resumable via --resume.")
    p.add_argument("--malloc_trim", action="store_true",
                   help="Call glibc malloc_trim(0) at each epoch end to "
                        "return freed heap to the OS (host-RSS mitigation).")
    p.add_argument("--ema", type=float, default=d.ema,
                   help="Per-step EMA decay for the params (e.g. 0.999); "
                        "validation and best-model snapshots use the "
                        "averaged weights. 0 disables.")
    p.add_argument("--no_prewarm", dest="prewarm", action="store_false",
                   default=d.prewarm,
                   help="Skip compiling all multi-scale buckets at train "
                        "start (buckets then compile cold mid-training).")
    p.add_argument("--compile_cache", type=str, default=d.compile_cache,
                   help="Persistent XLA compilation-cache directory "
                        "(speeds up pre-warm and restarts; '' = off).")
    p.add_argument("--seed", type=int, default=d.seed)
    p.add_argument("--num_workers", type=int, default=d.num_workers,
                   help="Host-side data prefetch threads.")
    p.add_argument("--host_augment", action="store_true",
                   help="Augment on the host with PIL (reference behavior) "
                        "instead of on-device.")
    p.add_argument("--native_io", dest="native_io", action="store_true",
                   default=True,
                   help="Use the native C++ image loader (bit-identical to "
                        "the PIL path, faster; the default when "
                        "native/libsdnet_io.so is built).")
    p.add_argument("--no_native_io", dest="native_io", action="store_false",
                   help="Force the PIL loader.")
    p.add_argument("--native_io_fast", action="store_true",
                   help="Approximate fast decode for the training feed "
                        "(DCT-scaled JPEG + 2-tap bilinear); eval stays "
                        "exact.")
    p.add_argument("--float_feed", action="store_true",
                   help="Ship the training batch as float32 instead of "
                        "raw uint8 (uint8 + on-device /255 is the "
                        "default in device-augment mode: 4x less "
                        "host->device transfer, identical numerics).")
    p.add_argument("--backbone", type=str, default=d.backbone,
                   choices=["resnet18", "resnet34", "resnet50"],
                   help="Encoder family (reference ships resnet34).")
    p.add_argument("--s2d_stem", action="store_true",
                   help="Space-to-depth stem: equivalent 4x4/1 conv on 12 "
                        "channels instead of 7x7/2 on 3 (faster on the MXU; "
                        "changes the checkpoint stem layout).")
    p.add_argument("--flip_prob", type=float, default=d.flip_prob,
                   help="Train-time h/v flip probability (0 disables "
                        "flip augmentation; 0.5 = reference intent).")
    p.add_argument("--head_conv", type=int, default=d.head_conv,
                   help="Hidden 3x3 head width before the 1x1 output conv "
                        "(0 = reference single-1x1 head). Changes the "
                        "checkpoint layout; pass the same value when "
                        "evaluating/exporting the checkpoint.")
    p.add_argument("--int8", action="store_true",
                   help="Int8 inference mode: dynamic activation + "
                        "per-channel weight quantization on the MXU "
                        "(evaluate/detect/benchmark only).")
    p.add_argument("--debug_nans", action="store_true",
                   help="Enable jax_debug_nans for fault isolation.")
    p.add_argument("--resume", dest="resume_dir", type=str, default=None,
                   help="Resume training from a previous trainings/<ts> dir "
                        "(restores params, optimizer state, and step).")
    p.add_argument("--eval_batch_size", type=int, default=d.eval_batch_size,
                   help="Images per device batch during evaluation (metrics "
                        "are identical; larger batches amortize dispatch).")
    p.add_argument("--tiled", action="store_true",
                   help="detect: run sliding-window tiles at native "
                        "resolution instead of downscaling the image "
                        "(cross-tile duplicates are merged).")
    p.add_argument("--tile_overlap", type=float, default=d.tile_overlap,
                   help="Fraction of shared border between detect tiles.")
    return p


def config_from_args(argv=None) -> Config:
    parser = build_parser()
    ns = parser.parse_args(argv)
    if ns.amp_flag and ns.no_amp:
        parser.error("--amp and --no_amp are mutually exclusive")
    cfg = Config(
        train_dir=_opt_path(ns.train_dir),
        valid_dir=_opt_path(ns.valid_dir),
        labels_path=Path(ns.labels_path),
        anchor_name=ns.anchor_name,
        width=ns.width,
        height=ns.height,
        in_channels=ns.in_channels,
        fpn_depth=ns.fpn_depth,
        pretrained_model=_opt_path(ns.pretrained_model),
        batch_size=ns.batch_size,
        epochs=ns.epochs,
        no_augmentation=ns.no_augmentation,
        learning_rate=ns.learning_rate,
        lr_step=ns.lr_step,
        down_ratio=ns.down_ratio,
        hm_loss_fn=ns.hm_loss_fn,
        max_objects=ns.max_objects,
        max_parts=ns.max_parts,
        hm_weight=ns.hm_weight,
        offset_weight=ns.offset_weight,
        embedding_weight=ns.embedding_weight,
        sigma_gauss=ns.sigma_gauss,
        conf_threshold=ns.conf_threshold,
        dist_threshold=ns.dist_threshold,
        decoder_dist_thresh=ns.decoder_dist_thresh,
        csi_threshold=ns.csi_threshold,
        csv_path=ns.csv_path,
        summary_path=ns.summary_path,
        conf_sweep=(
            tuple(float(t) for t in ns.conf_sweep.split(","))
            if ns.conf_sweep else None
        ),
        use_amp=not ns.no_amp,
        data_parallel=ns.data_parallel,
        model_parallel=ns.model_parallel,
        profile=ns.profile,
        stall_timeout_s=max(0.0, ns.stall_timeout_s),
        malloc_trim=ns.malloc_trim,
        ema=ns.ema,
        prewarm=ns.prewarm,
        compile_cache=ns.compile_cache,
        seed=ns.seed,
        num_workers=ns.num_workers,
        native_io=ns.native_io or ns.native_io_fast,
        native_io_fast=ns.native_io_fast,
        device_augment=not ns.host_augment,
        uint8_feed=not ns.float_feed,
        pretrained_backbone=ns.pretrained_backbone,
        backbone=ns.backbone,
        s2d_stem=ns.s2d_stem,
        head_conv=max(0, ns.head_conv),
        flip_prob=min(1.0, max(0.0, ns.flip_prob)),
        int8=ns.int8,
        debug_nans=ns.debug_nans,
        resume_dir=_opt_path(ns.resume_dir),
        eval_batch_size=max(1, ns.eval_batch_size),
        tiled=ns.tiled,
        tile_overlap=ns.tile_overlap,
    )
    if cfg.debug_nans:
        import jax

        jax.config.update("jax_debug_nans", True)
    return cfg.finalize()


def _opt_path(v) -> Optional[Path]:
    return Path(v).expanduser().resolve() if v is not None else None
