"""Trace the inference path (forward + decode) on TPU."""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install

import sys
import jax, jax.numpy as jnp

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.ops.decode import decode_feature_maps
from structuredetector_tpu.ops.pallas import fused_sigmoid_nms

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
cfg = Config(width=512, height=512, use_amp=True)
cfg.set_labels(["bean", "maize"], ["leaf"])
cfg.validate()
model, variables = init_model(cfg)

@jax.jit
def step(variables, images):
    outputs = model.apply(variables, images, train=False)
    return decode_feature_maps(
        outputs, max_objects=cfg.max_objects, max_parts=cfg.max_parts,
        conf_thresh=cfg.conf_threshold, dist_thresh=cfg.decoder_dist_thresh,
        nms_fn=fused_sigmoid_nms, with_metadata=False)

images = jnp.zeros((batch, 512, 512, 3), jnp.float32)
out = step(variables, images)
_ = float(out["anchors"][0, 0, 2])

with jax.profiler.trace("/tmp/jaxtrace_fwd"):
    for _ in range(3):
        out = step(variables, images)
    _ = float(out["anchors"][0, 0, 2])
print("done")
