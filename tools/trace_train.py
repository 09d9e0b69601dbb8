"""Capture a jax.profiler trace of the train step on TPU."""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)  # run as `python tools/x.py` without install

import time, sys
import jax, jax.numpy as jnp
from jax import lax
import optax

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.train.state import TrainState
from structuredetector_tpu.train.steps import make_train_step

batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
cfg = Config(width=512, height=512, use_amp=True, batch_size=batch, s2d_stem=len(sys.argv) > 2 and sys.argv[2] == "s2d")
cfg.set_labels(["bean", "maize"], ["leaf"])
cfg.validate()
model, variables = init_model(cfg)
tx = optax.adam(1e-3)
state = TrainState(step=jnp.int32(0), params=variables["params"],
                   batch_stats=variables["batch_stats"],
                   opt_state=tx.init(variables["params"]))
step = make_train_step(model, cfg, tx, out_h=128, out_w=128, augment=True,
                       donate=False)
images = jnp.zeros((batch, 512, 512, 3), jnp.float32)
kp = {
    "anchors_xy": jnp.zeros((batch, cfg.max_objects, 2), jnp.float32),
    "anchor_cls": jnp.zeros((batch, cfg.max_objects), jnp.int32),
    "anchor_mask": jnp.zeros((batch, cfg.max_objects), jnp.bool_),
    "parts_xy": jnp.zeros((batch, cfg.max_parts, 2), jnp.float32),
    "part_kind": jnp.zeros((batch, cfg.max_parts), jnp.int32),
    "part_owner_xy": jnp.zeros((batch, cfg.max_parts, 2), jnp.float32),
    "part_mask": jnp.zeros((batch, cfg.max_parts), jnp.bool_),
}
st, stats = step(state, images, kp)
_ = float(stats["total_loss"])  # compile+sync

with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(3):
        st, stats = step(st, images, kp)
    _ = float(stats["total_loss"])
print("done")
