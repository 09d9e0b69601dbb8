"""Misc host utilities (reference utils.py:311-338).

`set_seed` seeds numpy + the process-level JAX PRNG convention (JAX keys
are explicit, so this returns a root key; the reference seeds torch/
numpy/cuda globally, utils.py:335-338).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class AverageMeter:
    """Running average accumulator (reference utils.py:311-324)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, value):
        self.sum += value
        self.count += 1
        self.avg = self.sum / self.count
        return self.avg


def set_seed(seed: int = 926354916):
    """Seed numpy's global RNG and return a JAX root PRNG key."""
    import jax

    np.random.seed(seed % (2**32))
    return jax.random.PRNGKey(seed)


def mkdir_if_needed(directory):
    Path(directory).mkdir(exist_ok=True)
