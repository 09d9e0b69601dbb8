"""Profile forward + train step on the TPU: time, FLOPs, MFU."""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install

import time, json, sys
import jax, jax.numpy as jnp
from jax import lax
import optax

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.train.state import TrainState
from structuredetector_tpu.train.steps import make_train_step

PEAK_BF16 = 197e12  # v5e

def timed(fn, *args, reps=3):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])  # sync via host transfer
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / reps

def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    iters = 5
    cfg = Config(width=512, height=512, use_amp=True, batch_size=batch,
                 s2d_stem="s2d" in sys.argv[2:],
                 int8="int8" in sys.argv[2:],
                 backbone=next((a for a in sys.argv[2:] if a.startswith("resnet")), "resnet34"))
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.validate()
    model, variables = init_model(cfg)

    # ---- forward ----
    def fwd_loop(variables, images):
        def body(carry, _):
            out = model.apply(variables, images + carry * 1e-12, train=False)
            return out["anchor_hm"][0, 0, 0, 0], None
        carry, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    images = jnp.zeros((batch, 512, 512, 3), jnp.float32)
    jfwd = jax.jit(fwd_loop)
    # FLOPs from an UN-scanned single forward: cost_analysis counts a
    # lax.scan body once regardless of trip count, so dividing the
    # scanned program's flops by `iters` under-reports by that factor.
    ca = (
        jax.jit(lambda v, x: model.apply(v, x, train=False))
        .lower(variables, images).compile().cost_analysis()
    )
    fwd_flops = ca.get("flops", 0.0)
    dt = timed(jfwd, variables, images) / iters
    fwd = dict(ms=dt * 1e3, imgs=batch / dt, gflop_img=fwd_flops / batch / 1e9,
               mfu=fwd_flops / dt / PEAK_BF16)
    print("forward", json.dumps({k: round(v, 3) for k, v in fwd.items()}))
    if cfg.int8:
        return  # int8 is inference-only; skip the train-step section

    # ---- train step ----
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.int32(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, cfg, tx, out_h=128, out_w=128, augment=True,
                           donate=False)
    n_anchors, n_parts = cfg.max_objects, cfg.max_parts
    kp = {
        "anchors_xy": jnp.zeros((batch, n_anchors, 2), jnp.float32),
        "anchor_cls": jnp.zeros((batch, n_anchors), jnp.int32),
        "anchor_mask": jnp.zeros((batch, n_anchors), jnp.bool_),
        "parts_xy": jnp.zeros((batch, n_parts, 2), jnp.float32),
        "part_kind": jnp.zeros((batch, n_parts), jnp.int32),
        "part_owner_xy": jnp.zeros((batch, n_parts, 2), jnp.float32),
        "part_mask": jnp.zeros((batch, n_parts), jnp.bool_),
    }

    def train_loop(state, images, kp):
        def body(st, _):
            st2, stats = step(st, images, kp)
            return st2, stats["total_loss"]
        st, losses = lax.scan(body, state, None, length=iters)
        return losses

    jtr = jax.jit(train_loop)
    # un-scanned single step for the same scan-undercount reason; keep
    # the full (state, stats) output so backward+update aren't DCEd
    ca2 = jax.jit(step).lower(state, images, kp).compile().cost_analysis()
    tr_flops = ca2.get("flops", 0.0)
    dt = timed(jtr, state, images, kp) / iters
    tr = dict(ms=dt * 1e3, imgs=batch / dt, gflop_img=tr_flops / batch / 1e9,
              mfu=tr_flops / dt / PEAK_BF16)
    print("train", json.dumps({k: round(v, 3) for k, v in tr.items()}))

if __name__ == "__main__":
    main()
