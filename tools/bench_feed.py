"""Measure host->device feed cost: fp32 pre-normalized vs uint8 raw.

Times the full dispatch path (host array -> device transfer -> forward
-> decoded arrays -> host sync) for the two Predictor feeds at a given
batch size. The uint8 path ships 4x fewer bytes and normalizes on the
VPU inside the jitted graph.

Note: under the tunneled test backend each dispatch carries a fixed
~20-30 ms latency floor, so absolute numbers are pessimistic; the
fp32-vs-uint8 delta isolates the transfer-size effect.
"""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.ops.decode import decode_feature_maps


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = 10
    cfg = Config(width=512, height=512, use_amp=True)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.validate()
    model, variables = init_model(cfg)

    from structuredetector_tpu.ops.device_augment import (
        IMAGENET_MEAN, IMAGENET_STD, normalize_images)

    def make_step(from_uint8):
        @jax.jit
        def step(variables, images):
            if from_uint8:
                images = normalize_images(images.astype(jnp.float32) / 255.0)
            outputs = model.apply(variables, images, train=False)
            return decode_feature_maps(
                outputs, max_objects=cfg.max_objects, max_parts=cfg.max_parts,
                conf_thresh=cfg.conf_threshold,
                dist_thresh=cfg.decoder_dist_thresh, with_metadata=False)

        return step

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (reps, batch, 512, 512, 3), np.uint8)
    f32 = (u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    for name, feed, from_u8 in (("float32", f32, False), ("uint8", u8, True)):
        step = make_step(from_u8)
        _ = float(step(variables, feed[0])["anchors"][0, 0, 2])  # compile
        t0 = time.perf_counter()
        for i in range(reps):
            out = step(variables, feed[i])
            _ = float(out["anchors"][0, 0, 2])  # per-call host sync
        dt = (time.perf_counter() - t0) / reps
        mb = feed[0].nbytes / 1e6
        print(f"{name:8s} feed: {dt * 1e3:7.2f} ms/batch-{batch} "
              f"({batch / dt:7.1f} img/s, {mb:.1f} MB H2D/batch)")


if __name__ == "__main__":
    main()
