"""Test harness: run everything on a virtual 8-device CPU mesh.

Multi-chip semantics (pjit shardings, psum gradients) are tested without
a TPU slice via XLA's fake host devices, per SURVEY.md §4.
"""

import os

# SDNET_TEST_TPU=1 runs the suite on the real TPU backend instead (only
# the hardware-gated tests care; most just get slower) — used to run
# tests/test_pallas_nms.py's Mosaic bit-exactness pin on a chip.
_TPU_MODE = os.environ.get("SDNET_TEST_TPU") == "1"

if not _TPU_MODE:
    # The environment pre-imports jax with a TPU (axon) platform plugin
    # that ignores JAX_PLATFORMS; jax.config still wins if set before
    # backend init.
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in xla_flags:
        xla_flags = (xla_flags + " --xla_force_host_platform_device_count=8").strip()
    if "xla_cpu_max_isa" not in xla_flags:
        # Cap codegen at AVX512: this VM's visible CPU features drift
        # between hosts (AMX sometimes vanishes) and feature-specific
        # codegen sporadically SIGABRTs during compile. AVX512 is the
        # widest ISA observed stable here; capping harder (AVX2) roughly
        # doubled compile times without eliminating the (rare) aborts.
        xla_flags = (xla_flags + " --xla_cpu_max_isa=AVX512").strip()
    os.environ["XLA_FLAGS"] = xla_flags

if not _TPU_MODE:
    # Run-scoped persistent compilation cache: the slow tier compiles
    # many identical tiny HLO modules from fresh per-test fixtures, and
    # its subprocess tests (preemption, multihost) recompile the same
    # train step from scratch. A shared cache dir dedups those at the
    # HLO level — subprocesses inherit it via the env var. The dir is
    # fresh per run (mkdtemp) unless the caller pins one, so the
    # cross-run CPU-feature-drift aborts documented in DESIGN.md
    # ("Compilation strategy") cannot occur: every entry was compiled
    # by this same host during this same run.
    import tempfile

    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", tempfile.mkdtemp(prefix="sdnet-test-xla-")
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

if not _TPU_MODE:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest

if not _TPU_MODE:
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "tests expect 8 fake CPU devices"


@pytest.fixture
def rng():
    return np.random.default_rng(926354916)


@pytest.fixture(scope="session")
def tiny_config():
    """A small config for fast CPU tests: 64x64 input, 16x16 grid."""
    from structuredetector_tpu.config import Config

    cfg = Config(width=64, height=64, max_objects=4, max_parts=8, fpn_depth=32,
                 batch_size=2, use_amp=False)
    cfg.set_labels(["bean", "maize"], ["leaf"])
    return cfg
