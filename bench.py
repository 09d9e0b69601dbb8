"""Headline benchmark: batched end-to-end 512x512 inference throughput.

Runs on whatever accelerator JAX exposes (one TPU chip under the
driver). Measures the full device path in the BEST shipping serving
configuration — int8 convs (s8xs8->s32 on the MXU at 2x the bf16 peak)
with statically calibrated activation scales, prequantized weights,
fused sigmoid/NMS + top-k decode to fixed-shape detection arrays —
i.e. everything up to the host annotation materialization. Calibration
runs in-process on synthetic data spanning the normalized input range,
exactly as `convert_export --int8 --calibrate_dir` would bake it.

Methodology: ITERS inference steps are chained *inside one jitted
program* via `lax.scan`, with a data dependence between iterations (the
previous step's decoded score perturbs the next input) so XLA cannot
hoist or CSE the loop body. This amortizes host->device dispatch
latency (large under the tunneled test setup) and reports steady-state
device throughput, which is what a pipelined serving deployment sees.

Baseline: the reference's best published end-to-end number, 90 fps on
an M1 Pro ANE (/root/reference/README.md:114; BASELINE.md). North star:
>1000 fps/chip (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
from jax import lax

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.models.quantize import (
    calibrate_activation_scales,
    prequantize_variables,
)
from structuredetector_tpu.ops.decode import decode_feature_maps_cfirst

BASELINE_FPS = 90.0  # reference README.md:114 (M1 Pro ANE, end-to-end)
ITERS = 25
# ImageNet-normalized input range: (0 - mean)/std to (1 - mean)/std
NORM_LO, NORM_HI = -2.12, 2.64


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=0,
                    help="override the batch size (0 = per-backend default)")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    # CPU fallback exists only as a smoke test: XLA CPU emulates the
    # int8 convs far too slowly for 512x512, so shrink there.
    size = 512 if on_tpu else 128
    cfg = Config(width=size, height=size, use_amp=True, int8=True)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.validate()

    model, variables = init_model(cfg)
    # Serving layout: channel-leading head + fused Pallas
    # sigmoid/NMS/top-k decode (models.network._CFirstHead,
    # ops.decode.decode_feature_maps_cfirst) — same detections as the
    # NHWC path (pinned in tests/test_decode.py), measured faster on
    # v5e (full-lane head writes + one-HBM-pass decode front).
    from structuredetector_tpu.models.network import build_model

    model_cf = build_model(cfg, head_layout="cfirst")
    # int8 + static scales measured fastest at batch 128 (DESIGN.md
    # serving section: 4,007-4,035 img/s across repeats on v5e).
    batch = args.batch or (128 if on_tpu else 2)

    key = jax.random.PRNGKey(0)
    images = jax.random.uniform(
        key, (batch, cfg.height, cfg.width, 3), jnp.float32,
        minval=NORM_LO, maxval=NORM_HI)

    # static activation scales: no per-call amax reductions in the
    # serving graph; prequantized int8 kernels: weight quantization (and
    # the float weight reads) hoisted out of the graph.
    variables = calibrate_activation_scales(model, variables, [images])
    variables = prequantize_variables(variables)

    def one_step(variables, images):
        outputs = model_cf.apply(variables, images, train=False)
        return decode_feature_maps_cfirst(
            outputs,
            max_objects=cfg.max_objects,
            max_parts=cfg.max_parts,
            conf_thresh=cfg.conf_threshold,
            dist_thresh=cfg.decoder_dist_thresh,
        )

    @jax.jit
    def infer_loop(variables, images):
        def body(carry, _):
            # Tiny (but non-zero: XLA folds x*0) perturbation forces a
            # real loop-carried dependence so the body can't be hoisted.
            dec = one_step(variables, images + carry * 1e-12)
            # The probe must consume EVERY decode output: a carry that
            # read only `anchors` let XLA dead-code-eliminate the whole
            # parts top-k + association (found in the round-4 per-HLO
            # trace — the bench was silently skipping ~1 ms of the path).
            probe = (
                dec["anchors"][0, 0, 2]
                + dec["parts"][0, 0, 2]
                + dec["part_parent"][0, 0].astype(jnp.float32) * 1e-9
                + dec["part_valid"][0, 0].astype(jnp.float32) * 1e-9
            )
            return probe, None

        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    # warmup / compile. NOTE: synchronization is via a host transfer
    # (float(...)) — block_until_ready is unreliable through tunneled
    # single-controller backends and can return before execution.
    float(infer_loop(variables, images))

    reps = 2 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(reps):
        out = infer_loop(variables, images)
    _ = float(out)
    dt = time.perf_counter() - t0

    fps = batch * ITERS * reps / dt
    print(json.dumps({
        "metric": "e2e_inference_fps_512_int8_static",
        "value": round(fps, 1),
        "unit": "img/s",
        "vs_baseline": round(fps / BASELINE_FPS, 2),
    }))


if __name__ == "__main__":
    main()
