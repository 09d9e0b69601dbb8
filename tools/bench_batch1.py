"""Batch-1 serving-latency breakdown: forward vs decode, and decode
variants (VERDICT r2 #6).

Measures, on the real chip with scan-chained steps (same methodology
as bench.py — in particular synced via a host transfer, because
block_until_ready can return early through the tunneled backend):

  - forward only
  - forward + decode (e2e)
  - decode only, split further into: sigmoid+NMS front, the two
    iterative top-k scans, and the lax.top_k sort lowering for
    comparison

Usage: python tools/bench_batch1.py [--batch 1] [--steps 200]
"""

from __future__ import annotations

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install


import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def chain(fn, steps):
    """Scan-chain `fn` with a non-foldable data dependence (bench.py
    methodology: per-call dispatch through the tunnel costs ~25 ms)."""

    def run(x):
        def body(carry, _):
            out = fn(carry)
            # fold a scalar from the output back into the carry
            return carry + (out * 1e-12).astype(carry.dtype), None

        final, _ = jax.lax.scan(body, x, None, length=steps)
        return jnp.sum(final)

    return jax.jit(run)


def timeit(fn, x, steps, warmup=2):
    for _ in range(warmup):
        float(fn(x))
    t0 = time.perf_counter()
    float(fn(x))
    dt = (time.perf_counter() - t0) / steps
    return dt


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--size", type=int, default=512)
    args = p.parse_args()

    from structuredetector_tpu.config import Config
    from structuredetector_tpu.models import init_model
    from structuredetector_tpu.ops.decode import decode_feature_maps, split_head_output
    from structuredetector_tpu.ops.tensor import (
        clamped_sigmoid, plateau_nms, topk_per_class,
    )

    cfg = Config(width=args.size, height=args.size)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    model, variables = init_model(cfg)

    B, H, W = args.batch, args.size, args.size
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, H, W, 3)).astype(np.float32))
    raw_np = rng.normal(0, 1, (B, H // 4, W // 4, cfg.out_channels))
    raw = jnp.asarray(raw_np.astype(np.float32))

    def fwd(img):
        return model.apply(variables, img, train=False, raw_output=True)

    def decode(r):
        d = decode_feature_maps(
            split_head_output(r, cfg.n_labels, cfg.n_parts),
            max_objects=cfg.max_objects, max_parts=cfg.max_parts,
            conf_thresh=cfg.conf_threshold, dist_thresh=cfg.decoder_dist_thresh,
            with_metadata=False)
        return d["anchors"][..., 2].sum() + d["parts"][..., 2].sum()

    def e2e(img):
        return decode(fwd(img))

    def front_only(r):
        d = split_head_output(r, cfg.n_labels, cfg.n_parts)
        return (plateau_nms(clamped_sigmoid(d["anchor_hm"])).sum()
                + plateau_nms(clamped_sigmoid(d["part_hm"])).sum())

    def topk_only(r):
        d = split_head_output(r, cfg.n_labels, cfg.n_parts)
        a = topk_per_class(d["anchor_hm"], cfg.max_objects)
        pp = topk_per_class(d["part_hm"], cfg.max_parts)
        return a[0].sum() + pp[0].sum()

    def topk_sort(r):
        """lax.top_k sort lowering, for comparison."""
        d = split_head_output(r, cfg.n_labels, cfg.n_parts)
        a = topk_per_class(d["anchor_hm"], cfg.max_objects, iterative=False)
        pp = topk_per_class(d["part_hm"], cfg.max_parts, iterative=False)
        return a[0].sum() + pp[0].sum()

    results = {}
    for name, fn, inp in (
        ("forward", lambda i: fwd(i).sum(), x),
        ("e2e", e2e, x),
        ("decode", decode, raw),
        ("decode/front", front_only, raw),
        ("decode/topk", topk_only, raw),
        ("decode/topk_sort", topk_sort, raw),
    ):
        dt = timeit(chain(fn, args.steps), inp, args.steps)
        results[name] = dt
        print(f"{name:24s} {dt * 1e3:8.3f} ms/step  "
              f"({args.batch / dt:8.1f} img/s)")

    dec = results["decode"]
    print(f"\ndecode share of e2e: {dec / results['e2e']:.1%}")
    print(f"front+topk account for "
          f"{(results['decode/front'] + results['decode/topk']) / dec:.1%} of decode")


if __name__ == "__main__":
    main()
