"""StructureDetector-TPU: a TPU-native JAX/XLA/Pallas framework for
anchor+parts structure detection (SDNet, BMVC 2021 family).

This is a ground-up TPU-first re-design with the capabilities of the
PyTorch reference (laclouis5/StructureDetector):

- objects = one *anchor* keypoint + N *part* keypoints, grouped via a
  regressed 2-D embedding (part -> anchor displacement),
- CenterNet-style heatmap encode/decode at output stride 4,
- ResNet34 + FPN backbone, focal/MSE heatmap loss + masked L1 regression,
- greedy-matching evaluation (keypoint F1, CSI, classification),
- train / evaluate / detect / export CLIs.

TPU-native design points (not in the reference):
- NHWC bf16 compute, fp32 params/optimizer,
- target encoding (Gaussian splatting) is a jitted device op fused into
  the train step instead of per-sample Python on dataloader workers,
- decode (sigmoid -> plateau NMS -> top-k -> gather -> grouping argmin)
  is a fixed-shape jitted device program, with a fused Pallas kernel for
  the sigmoid+NMS front,
- data parallelism via `jax.sharding.Mesh` + jit shardings (GSPMD),
  gradient reduction rides ICI collectives,
- Orbax checkpointing with full train-state resume.
"""

__version__ = "0.1.0"

import os as _os

# Persistent XLA compilation cache: amortizes the slow first compile
# across processes/sessions (multi-scale buckets, CLI restarts, tests).
# OPT-IN ONLY (SDNET_XLA_CACHE=1): loading cached CPU AOT executables
# SIGABRTs when the visible host CPU features drift (heterogeneous VM
# hosts), and serializing through tunneled TPU backends can stall.
if "JAX_COMPILATION_CACHE_DIR" not in _os.environ and (
    _os.environ.get("SDNET_XLA_CACHE") == "1"
):
    try:
        import jax as _jax

        _cache = _os.path.join(
            _os.environ.get("HOME", "/tmp"), ".cache", "structuredetector_tpu_xla"
        )
        _os.makedirs(_cache, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass

if "JAX_PLATFORMS" in _os.environ:
    # Some TPU platform plugins pre-import jax and ignore JAX_PLATFORMS;
    # re-assert the user's choice via jax.config (no-op if the backend
    # is already initialized).
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from .config import Config  # noqa: F401
from .annotations import Box, ImageAnnotation, Keypoint, Object  # noqa: F401


def __getattr__(name):
    """Lazy top-level API (avoids importing jax/flax at package import)."""
    if name == "Predictor":
        from .predictor import Predictor

        return Predictor
    if name == "ExportPredictor":
        from .predictor import ExportPredictor

        return ExportPredictor
    if name == "MicroBatcher":
        from .serve import MicroBatcher

        return MicroBatcher
    if name == "Evaluator":
        from .evaluation import Evaluator

        return Evaluator
    if name == "Trainer":
        from .train import Trainer

        return Trainer
    if name == "SDNet":
        from .models import SDNet

        return SDNet
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
