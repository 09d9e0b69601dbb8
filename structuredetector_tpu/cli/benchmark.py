"""`benchmark` console script: device throughput measurements.

Measures (on the current JAX backend):
- end-to-end batched inference (forward + fused decode),
- forward-only,
- decode-only (XLA vs Pallas sigmoid+NMS front),
- train-step throughput (encode + fwd + bwd + update).
"""

from __future__ import annotations

import argparse
import json
import time

import jax
import jax.numpy as jnp


def _sync(out):
    # host transfer as the sync point: block_until_ready can return
    # before execution on tunneled single-controller backends
    jax.device_get(jax.tree.leaves(out)[0])


def _chain_time(step_fn, *args, iters=20):
    """Seconds per application of `step_fn`, measured by chaining `iters`
    applications inside ONE jitted `lax.scan` with a loop-carried data
    dependence. Per-call dispatch through a tunneled backend costs
    ~20-30 ms — per-call timing over-reports device time severely (and
    can even rank a subset of the work slower than a superset), so every
    section here chains.

    step_fn(carry: f32 scalar, *args) -> f32 scalar feeding the next carry.
    """
    from jax import lax

    # scan trip count doesn't affect compile time (the body compiles
    # once), so chain at least 50 steps to drown the ~20-30 ms dispatch
    iters = max(iters, 50)

    @jax.jit
    def loop(*a):
        def body(carry, _):
            return step_fn(carry, *a), None
        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    float(loop(*args))  # compile + first run
    t0 = time.perf_counter()
    float(loop(*args))
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--width", "-W", type=int, default=512)
    p.add_argument("--height", "-H", type=int, default=512)
    p.add_argument("--batch_size", "-b", type=int, default=32)
    p.add_argument("--fpn_depth", type=int, default=128,
                   help="FPN width to benchmark (compare model sizes).")
    p.add_argument("--backbone", type=str, default="resnet34",
                   choices=("resnet18", "resnet34", "resnet50"))
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--int8", action="store_true",
                   help="Int8 inference convs (models/quantize.py); skips "
                        "the train-step section (int8 is inference-only).")
    p.add_argument("--int8_static", action="store_true",
                   help="Int8 with static activation scales (calibrated on "
                        "the benchmark batch) — no per-call amax pass; "
                        "implies --int8.")
    p.add_argument("--json", action="store_true", dest="as_json")
    args = p.parse_args(argv)

    from ..config import Config
    from ..models import init_model
    from ..ops.decode import decode_feature_maps
    from ..ops.pallas import fused_sigmoid_nms
    from ..train.state import create_train_state, make_optimizer
    from ..train.steps import make_train_step

    args.int8 = args.int8 or args.int8_static
    cfg = Config(width=args.width, height=args.height, use_amp=not args.fp32,
                 int8=args.int8, fpn_depth=args.fpn_depth,
                 backbone=args.backbone)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.validate()
    b = args.batch_size

    model, variables = init_model(cfg)
    if args.int8:
        from ..models.quantize import (calibrate_activation_scales,
                                       prequantize_variables)

        if args.int8_static:
            # calibrate on random data spanning the ImageNet-normalized
            # input range ((0-mean)/std ≈ -2.12 to (1-mean)/std ≈ 2.64):
            # an all-zeros batch would drive every act_scale to the 1/127
            # fallback, timing a graph with unrealistically tiny scales
            warm = jax.random.uniform(
                jax.random.PRNGKey(0), (b, cfg.height, cfg.width, 3),
                jnp.float32, minval=-2.12, maxval=2.64)
            variables = calibrate_activation_scales(model, variables, [warm])
        variables = prequantize_variables(variables)
    images = jnp.zeros((b, cfg.height, cfg.width, 3), jnp.float32)
    on_tpu = jax.default_backend() == "tpu"

    results = {}

    def fwd_step(carry, v, x):
        out = model.apply(v, x + carry * 1e-12, train=False)
        return out["anchor_hm"][0, 0, 0, 0]

    t = _chain_time(fwd_step, variables, images, iters=args.iters)
    results["forward_fps"] = b / t

    def make_infer_step(nms_fn):
        def infer_step(carry, v, x):
            d = decode_feature_maps(
                model.apply(v, x + carry * 1e-12, train=False),
                max_objects=cfg.max_objects, max_parts=cfg.max_parts,
                conf_thresh=cfg.conf_threshold, dist_thresh=cfg.decoder_dist_thresh,
                nms_fn=nms_fn, with_metadata=False,
            )
            return d["anchors"][0, 0, 2]
        return infer_step

    t = _chain_time(make_infer_step(None), variables, images, iters=args.iters)
    results["e2e_xla_fps"] = b / t
    if on_tpu:
        t = _chain_time(make_infer_step(fused_sigmoid_nms), variables, images,
                        iters=args.iters)
        results["e2e_pallas_fps"] = b / t

    # batch-1 end-to-end latency: steps chained inside one jitted scan
    # with a loop-carried dependence, so dispatch overhead (large on
    # tunneled backends) is amortized and the number reflects device
    # latency — comparable with the reference's 5 ms ANE / 11 ms
    # realistic single-image figures (reference README.md:114).
    from jax import lax

    # many chained iterations: a single dispatch+transfer (~20-30 ms
    # through tunneled backends) must amortize to noise per step
    lat_iters = max(100, args.iters)
    nms = fused_sigmoid_nms if on_tpu else None

    @jax.jit
    def lat_loop(v, x):
        def body(carry, _):
            d = decode_feature_maps(
                model.apply(v, x + carry * 1e-12, train=False),
                max_objects=cfg.max_objects, max_parts=cfg.max_parts,
                conf_thresh=cfg.conf_threshold,
                dist_thresh=cfg.decoder_dist_thresh,
                nms_fn=nms, with_metadata=False,
            )
            return d["anchors"][0, 0, 2], None

        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=lat_iters)
        return carry

    one_img = jnp.zeros((1, cfg.height, cfg.width, 3), jnp.float32)
    _sync(lat_loop(variables, one_img))
    t0 = time.perf_counter()
    _sync(lat_loop(variables, one_img))
    results["e2e_latency_batch1_ms"] = (time.perf_counter() - t0) / lat_iters * 1e3

    # decode-only on synthetic maps
    out_w, out_h = cfg.grid_size()
    maps = {
        "anchor_hm": jnp.zeros((b, out_h, out_w, cfg.n_labels)),
        "part_hm": jnp.zeros((b, out_h, out_w, cfg.n_parts)),
        "offsets": jnp.zeros((b, out_h, out_w, 2)),
        "embeddings": jnp.zeros((b, out_h, out_w, 2)),
    }
    for name, nms_fn in (("xla", None),) + ((("pallas", fused_sigmoid_nms),) if on_tpu else ()):
        def dec_step(carry, m, f=nms_fn):
            d = decode_feature_maps(
                {**m, "anchor_hm": m["anchor_hm"] + carry * 1e-12},
                max_objects=cfg.max_objects, max_parts=cfg.max_parts,
                conf_thresh=cfg.conf_threshold,
                dist_thresh=cfg.decoder_dist_thresh,
                nms_fn=f, with_metadata=False)
            return d["anchors"][0, 0, 2]
        t = _chain_time(dec_step, maps, iters=args.iters)
        results[f"decode_{name}_us_per_img"] = t / b * 1e6

    if args.int8:
        # int8 is inference-only (the model rejects train=True)
        _report(results, args, cfg, b)
        return

    # train step
    optimizer = make_optimizer(cfg, steps_per_epoch=100)
    state = create_train_state(cfg, variables, optimizer)
    step = make_train_step(model, cfg, optimizer, out_h=out_h, out_w=out_w,
                           donate=False)
    o, pmax = cfg.max_objects, cfg.max_parts
    kp = {
        "anchors_xy": jnp.ones((b, o, 2)), "anchor_cls": jnp.zeros((b, o), jnp.int32),
        "anchor_mask": jnp.ones((b, o), bool), "parts_xy": jnp.ones((b, pmax, 2)),
        "part_kind": jnp.zeros((b, pmax), jnp.int32),
        "part_owner_xy": jnp.ones((b, pmax, 2)), "part_mask": jnp.ones((b, pmax), bool),
    }

    # the train chain carries the full train state (real step-to-step
    # dependence), not just a scalar
    from jax import lax

    tr_iters = max(20, args.iters // 2)

    @jax.jit
    def train_loop(s, x, k):
        def body(st, _):
            st2, stats = step(st, x, k)
            return st2, stats["total_loss"]
        _, losses = lax.scan(body, s, None, length=tr_iters)
        return losses[-1]

    float(train_loop(state, images, kp))
    t0 = time.perf_counter()
    float(train_loop(state, images, kp))
    t = (time.perf_counter() - t0) / tr_iters
    results["train_step_imgs_per_s"] = b / t

    _report(results, args, cfg, b)


def _report(results, args, cfg, b):
    if args.as_json:
        print(json.dumps({k: round(v, 2) for k, v in results.items()}))
    else:
        dtype = "fp32" if args.fp32 else ("int8" if args.int8 else "bf16")
        print(f"backend={jax.default_backend()} batch={b} "
              f"{args.width}x{args.height} dtype={dtype}")
        for k, v in results.items():
            print(f"  {k:28s} {v:12.2f}")


if __name__ == "__main__":
    main()
