"""Multi-host data sharding: partition logic + a real 2-process run.

The 2-process test spawns two jax.distributed processes (gloo CPU
collectives, 1 fake device each) running the REAL train step over a
2-device global mesh, each feeding its slice of the same deterministic
global batches via `jax.make_array_from_process_local_data`, and
requires the loss trajectory and final parameters to match a
single-process run over the same 2-device mesh shape (identical
reduction structure, so the comparison is tight).

One device per process keeps XLA's spinning thread pools from starving
gloo's 30 s key-value deadlines on a 1-core CI host; the mesh math is
identical at any device count."""

import json
import os
import subprocess
import sys
from pathlib import Path

import pytest

from structuredetector_tpu.parallel.multihost import process_slice

WORKER = Path(__file__).parent / "multihost_worker.py"


def test_process_slice_single_process_identity():
    assert process_slice([3, 1, 2], 0, 1) == [3, 1, 2]


def test_process_slice_contiguous_split():
    idxs = list(range(8))
    assert process_slice(idxs, 0, 2) == [0, 1, 2, 3]
    assert process_slice(idxs, 1, 2) == [4, 5, 6, 7]
    assert process_slice(idxs, 3, 4) == [6, 7]


def test_process_slice_drops_ragged():
    assert process_slice([0, 1, 2], 0, 2) is None


def test_initialize_distributed_swallows_double_init(monkeypatch):
    """The benign re-init RuntimeError (jax 0.9: 'jax.distributed.initialize
    should only be called once.') is a no-op returning True; a connect
    failure must re-raise (silent single-process fallback would train an
    unsharded duplicate run on every worker)."""
    import jax

    from structuredetector_tpu.parallel.mesh import maybe_initialize_distributed

    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "127.0.0.1:1")

    def double_init(**kwargs):
        raise RuntimeError("jax.distributed.initialize should only be called once.")

    monkeypatch.setattr(jax.distributed, "initialize", double_init)
    assert maybe_initialize_distributed() is True

    def connect_fail(**kwargs):
        raise RuntimeError("Failed to connect to coordinator at 127.0.0.1:1")

    monkeypatch.setattr(jax.distributed, "initialize", connect_fail)
    with pytest.raises(RuntimeError, match="connect"):
        maybe_initialize_distributed()


def test_loader_process_partitioning():
    """All processes agree on the global order; slices are disjoint and
    contiguous per batch."""
    from structuredetector_tpu.data.pipeline import Loader

    class _Idx:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"i": i}

    def batches_for(pi):
        loader = Loader(
            _Idx(), batch_size=8, shuffle=True, seed=42,
            process_index=pi, process_count=2,
            collate_fn=lambda s: [x["i"] for x in s],
        )
        return list(loader)

    b0, b1 = batches_for(0), batches_for(1)
    assert len(b0) == len(b1) == 2
    for lo, hi in zip(b0, b1):
        assert len(lo) == len(hi) == 4
        assert not (set(lo) & set(hi))
    # identical global order across "processes"
    all_seen = sorted(i for b in b0 + b1 for i in b)
    assert all_seen == list(range(16))


def _run_worker(pid, nprocs, port, local_devices):
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    return subprocess.Popen(
        [sys.executable, str(WORKER), str(pid), str(nprocs), str(port), str(local_devices)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )


def _result(proc, timeout=1200):
    out, err = proc.communicate(timeout=timeout)
    assert proc.returncode == 0, f"worker failed:\n{err[-3000:]}"
    line = [l for l in out.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


@pytest.mark.slow
def test_two_process_matches_single_process():
    # single-process reference: 2 local devices, full global batch
    ref = _result(_run_worker(0, 1, 0, 2))

    # two processes x 1 device, gloo rendezvous
    p0 = _run_worker(0, 2, 23987, 1)
    p1 = _run_worker(1, 2, 23987, 1)
    r0 = _result(p0)
    r1 = _result(p1)

    # both processes observe the same (global) loss and parameters
    assert r0["loss"] == pytest.approx(r1["loss"], rel=1e-6)
    assert r0["checksum"] == pytest.approx(r1["checksum"], rel=1e-6)
    # and they match the single-process run on the same global batches
    # (rel 1e-4: gloo's cross-process allreduce accumulates in a
    # different order than the intra-process reduction, ~2e-5 on fp32
    # losses after three steps)
    assert r0["loss"] == pytest.approx(ref["loss"], rel=1e-4)
    assert r0["checksum"] == pytest.approx(ref["checksum"], rel=1e-4)
    # validation path: the replicated host-local eval (Trainer.valid's
    # multi-host contract) runs on identical data on every process and
    # must agree exactly across processes; vs the single-process run it
    # inherits the ~1e-4 param drift from gloo reduce order, amplified
    # through the nonlinear loss (measured ~1.6e-3 after 3 steps)
    assert r0["eval_loss"] == pytest.approx(r1["eval_loss"], rel=1e-6)
    assert r0["eval_loss"] == pytest.approx(ref["eval_loss"], rel=5e-3)
