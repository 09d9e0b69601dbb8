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

from .config import Config  # noqa: F401
from .annotations import Box, ImageAnnotation, Keypoint, Object  # noqa: F401
