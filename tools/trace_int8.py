"""Trace the int8-static inference path (forward + decode) on TPU and
print a per-HLO device-time breakdown (parsed straight from the
xplane protobuf; run with PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python).

Usage: python tools/trace_int8.py [batch] [bf16] [nhwc]
  bf16: disable int8 (bf16 convs)
  nhwc: trace the legacy NHWC-head + XLA-top-k decode instead of the
        shipping cfirst + fused-Pallas-top-k serving path
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
from structuredetector_tpu.models.network import build_model
from structuredetector_tpu.ops.decode import (
    decode_feature_maps,
    decode_feature_maps_cfirst,
)
from structuredetector_tpu.ops.pallas import fused_sigmoid_nms

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
use_int8 = "bf16" not in sys.argv[2:]
use_cfirst = "nhwc" not in sys.argv[2:]
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


model_cf = build_model(cfg, head_layout="cfirst")


@jax.jit
def step(variables, images):
    def body(carry, _):
        if use_cfirst:
            out = model_cf.apply(variables, images + carry * 1e-12, train=False)
            dec = decode_feature_maps_cfirst(
                out, max_objects=cfg.max_objects, max_parts=cfg.max_parts,
                conf_thresh=cfg.conf_threshold,
                dist_thresh=cfg.decoder_dist_thresh)
        else:
            out = model.apply(variables, images + carry * 1e-12, train=False)
            dec = decode_feature_maps(
                out, max_objects=cfg.max_objects, max_parts=cfg.max_parts,
                conf_thresh=cfg.conf_threshold,
                dist_thresh=cfg.decoder_dist_thresh,
                nms_fn=fused_sigmoid_nms, with_metadata=False)
        # consume every decode output or XLA DCEs the parts decode +
        # association out of the traced program (see bench.py)
        probe = (
            dec["anchors"][0, 0, 2]
            + dec["parts"][0, 0, 2]
            + dec["part_parent"][0, 0].astype(jnp.float32) * 1e-9
            + dec["part_valid"][0, 0].astype(jnp.float32) * 1e-9
        )
        return probe, None

    carry, _ = lax.scan(body, jnp.float32(0.0), None, length=10)
    return carry


_ = float(step(variables, images))

# fresh dir per run: /tmp/jaxtrace_int8 accumulates runs and the glob
# below would otherwise parse the OLDEST xplane (a stale ledger)
import tempfile

trace_dir = tempfile.mkdtemp(prefix="jaxtrace_int8_")
with jax.profiler.trace(trace_dir):
    _ = float(step(variables, images))
print("traced to", trace_dir)

# ---- parse: per-HLO device time, straight from the xplane protobuf
# (the tensorboard_plugin_profile converters no longer import against
# the installed protobuf/tensorflow pair; the raw XSpace always parses.
# Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python in the env.)
import collections
import re

from tensorflow.tsl.profiler.protobuf import xplane_pb2

xs = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))
print("xplane files:", xs)
if xs:
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xs[0], "rb").read())
    for plane in space.planes:
        if plane.name != "/device:TPU:0":
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            agg = collections.Counter()
            cnt = collections.Counter()
            full = {}
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                m = re.match(r"%([a-zA-Z0-9_.\-]+)", name)
                key = m.group(1) if m else name[:40]
                agg[key] += ev.duration_ps
                cnt[key] += 1
                full[key] = name
            # duration_ps / 1e9 = ms; the traced step scans ITERS=10
            # model applications, so /10 gives ms per inference iter.
            print("=== per-op ms/iter (>= 0.05), outer while excluded ===")
            for key, ps in agg.most_common(60):
                ms = ps / 1e9 / 10
                # the outer scan-over-iters while appears once and
                # contains everything — skip the inclusive wrapper
                if ms < 0.05 or (key.startswith("while.") and cnt[key] == 1):
                    continue
                print(f"  {ms:7.3f} ms x{cnt[key]:4d}  {full[key][:120]}")

            # ---- category rollup: attribute each fusion's device time
            # to MXU (contains a convolution/dot) vs pure elementwise /
            # data movement, by cross-referencing the compiled HLO.
            hlo = step.lower(variables, images).compile().as_text()
            calls = dict(re.findall(
                r"%?([\w.\-]+) = [^\n]*? fusion\([^\n]*?calls=%?([\w.\-]+)", hlo))
            bodies = {}
            for m in re.finditer(
                r"^\s*%?([\w.\-]+) \([^)]*\) -> [^{]+\{(.*?)^\s*\}",
                hlo, re.S | re.M,
            ):
                bodies[m.group(1)] = m.group(2)

            def category(key, name):
                # opcode = the token right before the first "(", taken
                # from the op's OWN definition (not operand text — input
                # names can contain "custom-call"/"fusion" too)
                mm = re.match(r"%[\w.\-]+ = \S+(?: \S+)*? ([\w\-]+)\(", name)
                opcode = mm.group(1) if mm else "?"
                if opcode == "custom-call":
                    return "pallas custom-call"
                if key.startswith("while.") or opcode != "fusion":
                    op = opcode
                    return {"copy": "data movement",
                            "broadcast": "data movement",
                            # inner while durations are inclusive of
                            # their body fusions (counted separately);
                            # report only the loop overhead would need
                            # subtraction — skip to avoid double count
                            "while": None,
                            }.get(op, f"other:{op}")
                body = bodies.get(calls.get(key, ""), "")
                if "convolution(" in body or " dot(" in body:
                    return "MXU fusion (conv/dot + fused elementwise)"
                return "elementwise/requant fusion"

            roll = collections.Counter()
            for key, ps in agg.items():
                name = full[key]
                if key.startswith("while."):
                    continue  # inclusive wrappers (outer scan / top-k loop)
                cat = category(key, name)
                if cat is not None:
                    roll[cat] += ps
            print("=== category rollup, ms/iter ===")
            total = 0.0
            for cat, ps in roll.most_common():
                ms = ps / 1e9 / 10
                total += ms
                print(f"  {ms:7.3f} ms  {cat}")
            print(f"  {total:7.3f} ms  TOTAL (sum of op self-times)")
