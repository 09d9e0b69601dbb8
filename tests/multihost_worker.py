"""Standalone worker for the multi-host data-sharding test.

Runs the REAL train step (make_train_step) over a mesh of all global
devices, feeding per-process slices of a deterministic synthetic global
batch through parallel.multihost. Prints one JSON line with the final
loss and a parameter checksum; the pytest wrapper compares 2-process vs
single-process results on the same global batches.

Usage: python multihost_worker.py <process_id> <num_processes> <port> <local_devices>
"""

import json
import os
import sys

pid, nprocs, port, local_devices = (int(a) for a in sys.argv[1:5])

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={local_devices} "
    "--xla_cpu_max_isa=AVX512"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
if nprocs > 1:
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        f"localhost:{port}", num_processes=nprocs, process_id=pid
    )

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from structuredetector_tpu.config import Config  # noqa: E402
from structuredetector_tpu.models import init_model  # noqa: E402
from structuredetector_tpu.parallel.mesh import create_mesh  # noqa: E402
from structuredetector_tpu.parallel.multihost import (  # noqa: E402
    global_batch_arrays,
    process_slice,
)
from structuredetector_tpu.train.state import create_train_state, make_optimizer  # noqa: E402
from structuredetector_tpu.train.steps import make_train_step  # noqa: E402

GLOBAL_BATCH = 8
STEPS = 3


def sample(i: int, cfg):
    """Deterministic synthetic sample for global index i."""
    rng = np.random.default_rng(1000 + i)
    o, p = cfg.max_objects, cfg.max_parts
    g = cfg.width // 4
    return {
        "image": rng.uniform(0, 1, (cfg.height, cfg.width, 3)).astype(np.float32),
        "anchors_xy": rng.uniform(1, g - 1, (o, 2)).astype(np.float32),
        "anchor_cls": rng.integers(0, cfg.n_labels, (o,)).astype(np.int32),
        "anchor_mask": np.ones((o,), bool),
        "parts_xy": rng.uniform(1, g - 1, (p, 2)).astype(np.float32),
        "part_kind": np.zeros((p,), np.int32),
        "part_owner_xy": rng.uniform(1, g - 1, (p, 2)).astype(np.float32),
        "part_mask": np.ones((p,), bool),
    }


def main():
    cfg = Config(width=32, height=32, fpn_depth=8, max_objects=2, max_parts=4,
                 batch_size=GLOBAL_BATCH, use_amp=False, num_workers=0)
    cfg.set_labels(["bean", "maize"], ["leaf"])

    model, variables = init_model(cfg, jax.random.PRNGKey(cfg.seed))
    optimizer = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(cfg, variables, optimizer)
    mesh = create_mesh(0, 1)  # all global devices on "data"

    step = make_train_step(
        model, cfg, optimizer, out_h=8, out_w=8, mesh=mesh, state_example=state
    )

    def batch_for(s):
        indices = list(range(s * GLOBAL_BATCH, (s + 1) * GLOBAL_BATCH))
        local = process_slice(indices, jax.process_index(), jax.process_count())
        samples = [sample(i, cfg) for i in local]
        images = np.stack([smp["image"] for smp in samples])
        kp = {
            k: np.stack([smp[k] for smp in samples])
            for k in samples[0]
            if k != "image"
        }
        return global_batch_arrays(mesh, images, kp)

    # AOT-compile before the first execution, then rendezvous on the
    # coordination service: XLA-CPU's gloo context init times out (~30 s)
    # if one process reaches the first collective while the other is
    # still compiling — which is guaranteed on a 1-core CI host.
    g_images, g_kp = batch_for(0)
    compiled = step.lower(state, g_images, g_kp).compile()
    if nprocs > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "compiled", timeout_in_ms=600_000
        )

    loss = None
    for s in range(STEPS):
        if s > 0:
            g_images, g_kp = batch_for(s)
        state, stats = compiled(state, g_images, g_kp)
        loss = float(stats["total_loss"])

    checksum = float(
        sum(np.abs(x).sum() for x in jax.tree.leaves(jax.device_get(state.params)))
    )

    # Validation path (Trainer.valid multi-host contract): params are
    # committed to the global mesh, so a plain-jit eval over process-
    # local batches must run on a replicated host-local copy — mixing
    # global params with local arrays raises "incompatible devices".
    # Same recipe as Trainer.valid: jit identity with replicated
    # out_shardings (a collective), then device_get the local replica.
    from jax.sharding import NamedSharding, PartitionSpec  # noqa: E402

    from structuredetector_tpu.train.steps import make_eval_step  # noqa: E402

    replicate = jax.jit(
        lambda t: t, out_shardings=NamedSharding(mesh, PartitionSpec())
    )
    local_vars = jax.tree.map(
        jax.numpy.asarray, jax.device_get(replicate(state.variables))
    )
    eval_step = make_eval_step(model, cfg, out_h=8, out_w=8)
    samples = [sample(i, cfg) for i in range(2)]  # same data on every proc
    images = np.stack([smp["image"] for smp in samples])
    kp = {k: np.stack([smp[k] for smp in samples])
          for k in samples[0] if k != "image"}
    _, eval_stats, _ = eval_step(local_vars, jax.numpy.asarray(images), kp)
    eval_loss = float(eval_stats["total_loss"])

    print(json.dumps({"pid": pid, "loss": loss, "checksum": checksum,
                      "eval_loss": eval_loss}), flush=True)


if __name__ == "__main__":
    main()
