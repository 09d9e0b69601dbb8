"""Host-RSS growth probe: is the trainer leak in dispatch or in Python?

Long flagship runs through the tunneled single-controller backend grow
host RSS ~250-400 MB/epoch of pure anonymous heap (ROADMAP.md
"Performance"; live probes show flat mmap/FD/thread counts). This tool
isolates the lowest layer: it repeats ONLY the per-step device work of
the training loop — fresh host uint8 batch -> `jnp.asarray` ->
donated jitted train step -> scalar fetch — with none of the trainer's
periphery (no TensorBoard, no Orbax, no data loader threads), sampling
both process RSS and tracemalloc's Python-heap total every few steps.

Reading the output:
- RSS grows, Python flat      -> native retention (PJRT/IFRT client
  transfer buffers or glibc arenas). Re-run with MALLOC_ARENA_MAX=2 to
  split those two.
- RSS and Python both grow    -> our Python path retains references.
- both flat                   -> the leak lives in the trainer
  periphery (TB writer, Orbax, loader threads), not dispatch.

Usage:
    python tools/probe_rss.py [--steps 120] [--batch 32] [--size 512]
    MALLOC_ARENA_MAX=2 python tools/probe_rss.py ...   # arena A/B
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
import json
import tracemalloc

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    return 0.0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=120)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--sample_every", type=int, default=10)
    p.add_argument("--float_feed", action="store_true",
                   help="feed float32 instead of uint8 (4x transfer size)")
    p.add_argument("--malloc_trim", action="store_true",
                   help="call glibc malloc_trim(0) at every sample point "
                        "(the trainer's --malloc_trim mitigation, probed "
                        "at step granularity)")
    p.add_argument("--reuse_buffer", action="store_true",
                   help="write each step's pixels into ONE persistent host "
                        "array instead of allocating a fresh one — probes "
                        "whether client-side transfer retention is keyed "
                        "to buffer identity")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from structuredetector_tpu.config import Config
    from structuredetector_tpu.models import init_model
    from structuredetector_tpu.train.state import TrainState
    from structuredetector_tpu.train.steps import make_train_step

    cfg = Config(width=args.size, height=args.size, use_amp=True,
                 batch_size=args.batch)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.validate()
    model, variables = init_model(cfg)
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.int32(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    out = int(args.size / cfg.down_ratio)  # down_ratio is float (ref parity)
    step = make_train_step(model, cfg, tx, out_h=out, out_w=out,
                           augment=True, donate=True)

    rng = np.random.default_rng(0)
    o, pm = cfg.max_objects, cfg.max_parts
    img_dtype = np.float32 if args.float_feed else np.uint8
    persistent = (np.empty((args.batch, args.size, args.size, 3), img_dtype)
                  if args.reuse_buffer else None)

    def fresh_batch(i):
        """New host arrays each step (different bytes: a caching client
        must actually transfer them). With --reuse_buffer the bytes still
        change but land in the same allocation."""
        if persistent is not None:
            # cheap whole-buffer rewrite: roll one random row pattern
            persistent[..., :] = (i % 251) if not args.float_feed else i * 1e-3
            img = persistent
        elif args.float_feed:
            img = rng.random((args.batch, args.size, args.size, 3),
                             np.float32)
        else:
            img = rng.integers(0, 256, (args.batch, args.size, args.size, 3),
                               dtype=np.uint8)
        kp = {
            "anchors_xy": rng.uniform(0, out, (args.batch, o, 2)).astype(np.float32),
            "anchor_cls": np.zeros((args.batch, o), np.int32),
            "anchor_mask": np.ones((args.batch, o), bool),
            "parts_xy": rng.uniform(0, out, (args.batch, pm, 2)).astype(np.float32),
            "part_kind": np.zeros((args.batch, pm), np.int32),
            "part_owner_xy": rng.uniform(0, out, (args.batch, pm, 2)).astype(np.float32),
            "part_mask": np.ones((args.batch, pm), bool),
        }
        return jnp.asarray(img), {k: jnp.asarray(v) for k, v in kp.items()}

    # compile + settle before baseline
    img, kp = fresh_batch(0)
    state, stats = step(state, img, kp)
    _ = float(stats["total_loss"])

    tracemalloc.start()
    py0 = tracemalloc.get_traced_memory()[0]
    rss0 = rss_mb()
    samples = []
    for i in range(1, args.steps + 1):
        img, kp = fresh_batch(i)
        state, stats = step(state, img, kp)
        if i % args.sample_every == 0:
            _ = float(stats["total_loss"])  # sync via host transfer
            if args.malloc_trim:
                from structuredetector_tpu.train.trainer import malloc_trim

                malloc_trim()
            py = (tracemalloc.get_traced_memory()[0] - py0) / 1e6
            samples.append({"step": i, "rss_mb": round(rss_mb() - rss0, 1),
                            "py_mb": round(py, 1)})
            print(samples[-1], flush=True)
    _ = float(stats["total_loss"])
    tracemalloc.stop()

    d_rss = samples[-1]["rss_mb"] - samples[0]["rss_mb"]
    d_py = samples[-1]["py_mb"] - samples[0]["py_mb"]
    n = samples[-1]["step"] - samples[0]["step"]
    mb_per_img = args.batch * args.size * args.size * 3 / 1e6
    mb_per_img *= 4 if args.float_feed else 1
    verdict = ("native" if d_rss > 5 * max(d_py, 1e-9) + 10 else
               "python" if d_py > 10 else "flat")
    print(json.dumps({
        "rss_mb_per_step": round(d_rss / n, 2),
        "py_mb_per_step": round(d_py / n, 2),
        "transfer_mb_per_step": round(mb_per_img, 1),
        "growth_layer": verdict,
    }))


if __name__ == "__main__":
    main()
