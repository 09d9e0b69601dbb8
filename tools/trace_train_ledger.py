"""Per-HLO device-time ledger for the TRAIN step (VERDICT r4 item 5 —
the serving path got this in tools/trace_int8.py; training sat at a
README-level "~50% MFU" with no breakdown of where the other half
goes: conv bwd inefficiency, BN, encode, loss, update, or infeed).

Traces N real train-step executions on the TPU, parses the xplane
protobuf, and rolls device time up into categories using the
named_scope markers compiled into the step
(`train/steps.py`: encode_targets / forward / loss / adam_update;
backward ops carry jax.grad's `transpose(jvp(...))` op_name markers).
Also reports achieved model FLOP/s vs the chip peak via the compiled
executable's cost analysis.

Usage:
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
    python tools/trace_train_ledger.py [batch] [--out ledger.json]
"""

import sys as _sys
from pathlib import Path as _Path

_REPO_ROOT = str(_Path(__file__).resolve().parents[1])
if _REPO_ROOT not in _sys.path:
    _sys.path.insert(0, _REPO_ROOT)

import collections
import glob
import json
import re
import sys
import tempfile

import jax
import jax.numpy as jnp
import optax

from structuredetector_tpu.config import Config
from structuredetector_tpu.models import init_model
from structuredetector_tpu.train.state import TrainState
from structuredetector_tpu.train.steps import make_train_step

ITERS = 10

# v5e (TPU v5 lite) bf16 peak; override for other chips.
PEAK_FLOPS = float(__import__("os").environ.get("TPU_PEAK_FLOPS", 197e12))


def build_step(batch: int, s2d: bool = False):
    cfg = Config(width=512, height=512, use_amp=True, batch_size=batch,
                 s2d_stem=s2d)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    cfg.validate()
    model, variables = init_model(cfg)
    tx = optax.adam(1e-3)
    state = TrainState(step=jnp.int32(0), params=variables["params"],
                       batch_stats=variables["batch_stats"],
                       opt_state=tx.init(variables["params"]))
    step = make_train_step(model, cfg, tx, out_h=128, out_w=128,
                           augment=True, donate=False)
    rng = jax.random.PRNGKey(0)
    images = jax.random.randint(rng, (batch, 512, 512, 3), 0, 255,
                                jnp.uint8)
    kp = {
        "anchors_xy": jax.random.uniform(rng, (batch, cfg.max_objects, 2),
                                         jnp.float32, 1, 120),
        "anchor_cls": jnp.zeros((batch, cfg.max_objects), jnp.int32),
        "anchor_mask": jnp.ones((batch, cfg.max_objects), jnp.bool_),
        "parts_xy": jax.random.uniform(rng, (batch, cfg.max_parts, 2),
                                       jnp.float32, 1, 120),
        "part_kind": jnp.zeros((batch, cfg.max_parts), jnp.int32),
        "part_owner_xy": jax.random.uniform(rng, (batch, cfg.max_parts, 2),
                                            jnp.float32, 1, 120),
        "part_mask": jnp.ones((batch, cfg.max_parts), jnp.bool_),
    }
    return step, state, images, kp


def op_name_index(step, state, images, kp):
    """%hlo_name -> jax-level op_name metadata, from the compiled HLO
    text (fusions inherit the scope of their root op)."""
    lowered = step.lower(state, images, kp)
    hlo = lowered.compile().as_text()
    idx = {}
    # every instruction line: %name = ... metadata={op_name="..." ...}
    for m in re.finditer(
            r"%?([a-zA-Z0-9_.\-]+) = [^\n]*?op_name=\"([^\"]+)\"", hlo):
        idx[m.group(1)] = m.group(2)
    return idx, hlo


CATS = (
    ("encode", lambda op: "encode_targets" in op),
    ("loss_bwd", lambda op: "loss" in op and "transpose(" in op),
    ("loss", lambda op: "/loss/" in op or op.endswith("loss")),
    ("augment", lambda op: "device_augment" in op or "augment" in op),
    ("adam_update", lambda op: "adam_update" in op),
    ("conv_bwd", lambda op: "transpose(" in op and "conv" in op),
    ("bwd_other", lambda op: "transpose(" in op),
    # the scope reads "jvp(forward)" (no slash before "forward"), so
    # match the scope name itself, not a path segment
    ("conv_fwd", lambda op: "forward" in op and "conv" in op),
    ("bn_fwd", lambda op: "forward" in op and ("/bn" in op or "norm" in op)),
    ("fwd_other", lambda op: "forward" in op),
)


def categorize(op_name: str) -> str:
    for cat, pred in CATS:
        if pred(op_name):
            return cat
    return "other"


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    batch = int(args[0]) if args else 128
    out_path = None
    if "--out" in sys.argv:
        out_path = sys.argv[sys.argv.index("--out") + 1]

    step, state, images, kp = build_step(batch, s2d="--s2d" in sys.argv)
    name_idx, hlo_text = op_name_index(step, state, images, kp)

    # model-FLOP estimate from XLA's own cost analysis of the step
    cost = step.lower(state, images, kp).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    step_flops = float(cost.get("flops", 0.0)) if cost else 0.0

    st, stats = step(state, images, kp)
    _ = float(stats["total_loss"])  # compile + sync
    trace_dir = tempfile.mkdtemp(prefix="jaxtrace_train_")
    import time

    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(ITERS):
            st, stats = step(st, images, kp)
        _ = float(stats["total_loss"])
    wall_s = (time.perf_counter() - t0) / ITERS

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = sorted(glob.glob(trace_dir + "/plugins/profile/*/*.xplane.pb"))
    assert xs, f"no xplane under {trace_dir}"
    space = xplane_pb2.XSpace()
    space.ParseFromString(open(xs[0], "rb").read())

    cat_ps = collections.Counter()
    op_ps = collections.Counter()
    op_cnt = collections.Counter()
    total_ps = 0
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        md = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = md.get(ev.metadata_id, "?")
                m = re.match(r"%?([a-zA-Z0-9_.\-]+)", name)
                key = m.group(1) if m else name[:40]
                op = name_idx.get(key, "")
                cat_ps[categorize(op)] += ev.duration_ps
                op_ps[(key, categorize(op))] += ev.duration_ps
                op_cnt[(key, categorize(op))] += 1
                total_ps += ev.duration_ps

    device_ms = total_ps / 1e9 / ITERS
    mfu = step_flops / (device_ms / 1e3) / PEAK_FLOPS if device_ms else 0.0
    wall_mfu = step_flops / wall_s / PEAK_FLOPS

    result = {
        "batch": batch,
        "device_ms_per_step": round(device_ms, 2),
        "wall_ms_per_step": round(wall_s * 1e3, 2),
        "step_model_flops": step_flops,
        "mfu_device": round(mfu, 4),
        "mfu_wall": round(wall_mfu, 4),
        "peak_flops_assumed": PEAK_FLOPS,
        "categories_ms": {
            c: round(ps / 1e9 / ITERS, 3)
            for c, ps in cat_ps.most_common()
        },
        "top_ops": [
            {
                "op": k, "cat": c,
                "ms": round(ps / 1e9 / ITERS, 3),
                "count": op_cnt[(k, c)] // ITERS or op_cnt[(k, c)],
                "op_name": name_idx.get(k, "")[:160],
            }
            for (k, c), ps in op_ps.most_common(40)
            if ps / 1e9 / ITERS >= 0.05
        ],
    }
    print(json.dumps({k: v for k, v in result.items() if k != "top_ops"},
                     indent=2))
    print("=== top ops ===")
    for o in result["top_ops"]:
        print(f"  {o['ms']:7.3f} ms x{o['count']:3d} [{o['cat']:>11}] "
              f"{o['op']}  {o['op_name'][:90]}")
    if out_path:
        _Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        _Path(out_path).write_text(json.dumps(result, indent=2))
        print("wrote", out_path)


if __name__ == "__main__":
    main()
