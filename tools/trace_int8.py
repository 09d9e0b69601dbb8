"""Trace the int8-static inference path (forward + decode) on TPU and
print a per-HLO device-time breakdown (framework_op / hlo_op stats via
the tensorboard profile plugin's raw_to_tool_data converters).

Usage: python tools/trace_int8.py [batch] [bf16]
"""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import glob
import json
import sys

import jax
import jax.numpy as jnp
from jax import lax

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.models.quantize import (
    calibrate_activation_scales,
    prequantize_variables,
)
from structuredetector_tpu.ops.decode import decode_feature_maps
from structuredetector_tpu.ops.pallas import fused_sigmoid_nms

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
use_int8 = "bf16" not in sys.argv[2:]
cfg = Config(width=512, height=512, use_amp=True, int8=use_int8)
cfg.set_labels(["bean", "maize"], ["leaf"])
cfg.validate()
model, variables = init_model(cfg)

images = jax.random.uniform(
    jax.random.PRNGKey(0), (batch, 512, 512, 3), jnp.float32,
    minval=-2.12, maxval=2.64)
if use_int8:
    variables = calibrate_activation_scales(model, variables, [images])
    variables = prequantize_variables(variables)


@jax.jit
def step(variables, images):
    def body(carry, _):
        out = model.apply(variables, images + carry * 1e-12, train=False)
        dec = decode_feature_maps(
            out, max_objects=cfg.max_objects, max_parts=cfg.max_parts,
            conf_thresh=cfg.conf_threshold,
            dist_thresh=cfg.decoder_dist_thresh,
            nms_fn=fused_sigmoid_nms, with_metadata=False)
        return dec["anchors"][0, 0, 2], None

    carry, _ = lax.scan(body, jnp.float32(0.0), None, length=10)
    return carry


_ = float(step(variables, images))

trace_dir = "/tmp/jaxtrace_int8"
with jax.profiler.trace(trace_dir):
    _ = float(step(variables, images))
print("traced to", trace_dir)

# ---- parse: per-HLO device time ----
from tensorboard_plugin_profile.convert import raw_to_tool_data

xs = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))
print("xplane files:", xs)
if xs:
    data, _ = raw_to_tool_data.xspace_to_tool_data(xs, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    out = _Path("/tmp/hlo_stats.json")
    out.write_text(data)
    d = json.loads(data)
    rows = d.get("data", d) if isinstance(d, dict) else d
    print("wrote /tmp/hlo_stats.json; top-level type:", type(d).__name__)
