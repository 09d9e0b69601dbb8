"""Multi-host (multi-process) input feeding.

The reference is single-process/single-device; this is the TPU-native
scale-out data path (SURVEY.md §2b): every process loads only the slice
of each global batch that lands on its addressable devices, then the
slices are stitched into one globally-sharded `jax.Array` with
`jax.make_array_from_process_local_data` — no cross-host copies of
input data, gradients all-reduce over ICI inside the jitted step.

Contract:
- the Loader's shuffle RNG is seeded identically on every process, so
  all processes agree on the global index order;
- each global batch is split contiguously: process p takes
  `indices[p*L : (p+1)*L]` with L = global_batch // process_count.
  Contiguous split matches `PartitionSpec("data")` layout because the
  global device order enumerates process 0's devices first;
- global batches that don't divide evenly by process_count are dropped
  (only ever the trailing partial batch when drop_last=False).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import jax
import numpy as np

from .mesh import batch_sharding


def process_slice(indices: List[int], process_index: int, process_count: int):
    """This process's contiguous slice of one global index batch, or
    None when the batch doesn't split evenly (dropped everywhere so all
    processes stay in step)."""
    if process_count <= 1:
        return indices
    if len(indices) % process_count != 0:
        return None
    local = len(indices) // process_count
    return indices[process_index * local : (process_index + 1) * local]


def global_array(mesh, local: np.ndarray) -> jax.Array:
    """Process-local batch slice -> globally-sharded array (batch dim
    over the "data" mesh axis)."""
    return jax.make_array_from_process_local_data(
        batch_sharding(mesh), np.asarray(local)
    )


def global_batch_arrays(
    mesh, images, kp: Dict[str, np.ndarray]
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Assemble the train step's (images, kp) inputs.

    Single-process: plain device transfer (async, uncommitted — the
    step's internal sharding constraint distributes it). Multi-process:
    each argument becomes one global array whose addressable shards are
    exactly this process's local data.
    """
    if jax.process_count() == 1:
        import jax.numpy as jnp

        return jnp.asarray(images), {k: jnp.asarray(v) for k, v in kp.items()}
    return (
        global_array(mesh, images),
        {k: global_array(mesh, v) for k, v in kp.items()},
    )
