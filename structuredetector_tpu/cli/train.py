"""`train` console script (reference cli/train.py:5-13)."""

from __future__ import annotations

from ..config import config_from_args
from ..parallel.mesh import maybe_initialize_distributed
from ..train import Trainer


def main(argv=None):
    # Multi-host bring-up (no-op single-host): launching `train` on each
    # host of a slice with JAX_COORDINATOR_ADDRESS set joins the
    # distributed runtime, so jax.process_count()/process_index() drive
    # the Loader's per-process dataset sharding and the lead-only
    # logging/checkpointing (parallel/multihost.py contract). Must run
    # before any other jax call touches the backend.
    maybe_initialize_distributed()
    config = config_from_args(argv)
    assert config.train_dir, "train requires --train_dir (annotated training samples)"
    assert config.valid_dir, "train requires --valid_dir (annotated validation samples)"
    trainer = Trainer(config)
    trainer.train()


if __name__ == "__main__":
    main()
