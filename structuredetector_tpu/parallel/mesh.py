"""Device mesh + sharding rules (SPMD via GSPMD/jit).

The reference is strictly single-device (SURVEY.md §2b); this layer is
the TPU-native scale-out design:

- a 2-D `jax.sharding.Mesh` with axes ("data", "model"),
- batches sharded over "data" (pure DP — the right strategy for this
  ~21M-param CNN; gradients all-reduce over ICI automatically under
  GSPMD),
- parameters replicated by default, with an opt-in rule that shards
  large conv kernels' output-channel dimension over "model" so the mesh
  plumbing scales to wider variants without code changes,
- BatchNorm statistics are computed over the *global* batch: under jit
  the computation has global semantics and XLA inserts the cross-replica
  reductions.

Everything works identically on 1 real chip, N fake CPU devices
(`--xla_force_host_platform_device_count`), or a real slice.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def maybe_initialize_distributed(coordinator_address=None, num_processes=None,
                                 process_id=None) -> bool:
    """Multi-host init (`jax.distributed.initialize`) — the TPU analog of
    a NCCL/MPI backend bring-up (SURVEY.md §2b: the reference has no
    distributed backend at all). No-op when env vars/args are absent or
    initialization already happened. Returns True if distributed."""
    import jax

    try:
        if coordinator_address or "JAX_COORDINATOR_ADDRESS" in __import__("os").environ:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
            return True
    except RuntimeError as e:
        # Only swallow the benign re-init case ("jax.distributed.initialize
        # should only be called once", jax._src.distributed). A connect
        # failure (bad coordinator address, coordinator down) must fail
        # fast: every worker would otherwise proceed as
        # process_count()==1 and silently train an unsharded duplicate run.
        msg = str(e).lower()
        if "only be called once" in msg or "already initialized" in msg:
            return True
        raise
    return jax.process_count() > 1


def create_mesh(
    data_parallel: int = 0,
    model_parallel: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ("data", "model") mesh. data_parallel=0 uses all
    remaining devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if model_parallel <= 0:
        model_parallel = 1
    if data_parallel <= 0:
        data_parallel = n // model_parallel
    need = data_parallel * model_parallel
    if need > n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} needs {need} devices, have {n}"
        )
    grid = np.array(devices[:need]).reshape(data_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def spatial_sharding(mesh: Mesh) -> NamedSharding:
    """(B, H, W, C) activations: batch over "data" AND image rows over
    "model" — spatial partitioning, the TPU-native scale-out for inputs
    too large for one chip (SURVEY.md §5: the reference's scale axis is
    image resolution, not sequence length). Under GSPMD a convolution on
    row-sharded activations gets its kernel-height-1 halo rows exchanged
    over ICI automatically; no manual collective code."""
    return NamedSharding(mesh, P(DATA_AXIS, MODEL_AXIS))


def _kernel_spec(path_leaf_name: str, shape, model_size: int) -> P:
    """Shard conv kernels (H, W, Cin, Cout) on Cout over "model" when it
    divides evenly; replicate everything else."""
    if model_size <= 1:
        return P()
    if path_leaf_name == "kernel" and len(shape) == 4 and shape[-1] % model_size == 0:
        return P(None, None, None, MODEL_AXIS)
    if path_leaf_name in ("bias", "scale", "mean", "var") and len(shape) == 1 and shape[0] % model_size == 0:
        return P(MODEL_AXIS)
    return P()


def param_shardings(variables: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for model variables ({'params', 'batch_stats'}).

    With model axis size 1 everything is replicated (pure DP). With a
    larger model axis, conv output channels (and their BN/bias vectors)
    shard over "model" — tensor parallelism for wide variants.

    NOTE: bias/BN vectors are sharded to *match their kernel's* Cout
    sharding so elementwise ops line up without resharding.
    """
    model_size = mesh.shape[MODEL_AXIS]

    def rule(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        return NamedSharding(mesh, _kernel_spec(name, leaf.shape, model_size))

    return jax.tree_util.tree_map_with_path(rule, variables)


def shard_variables(variables: Any, mesh: Mesh) -> Any:
    """device_put the variable pytree with its shardings."""
    shardings = param_shardings(variables, mesh)
    return jax.device_put(variables, shardings)
