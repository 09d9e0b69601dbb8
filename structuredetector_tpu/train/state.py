"""Train state: params + BN stats + optimizer state, one pytree.

The reference's Trainer owns a torch module + Adam + StepLR and never
checkpoints optimizer/scheduler state (SURVEY.md §5 checkpoint gap).
Here the full state is a single pytree: donated through the jitted step,
sharded with the mesh rules, and checkpointed whole for exact resume.

Optimizer: optax Adam with a piecewise-constant /10 schedule matching
the reference's StepLR semantics (`trainer.py:53-56`; step size =
epochs // lr_step, `utils/args.py:213-215`).
"""

from __future__ import annotations

from typing import Any, Dict

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @property
    def variables(self) -> Dict[str, Any]:
        return {"params": self.params, "batch_stats": self.batch_stats}


def make_lr_schedule(config, steps_per_epoch: int) -> optax.Schedule:
    """StepLR(gamma=0.1, step_size=epochs//lr_step) as an optax
    piecewise-constant schedule over optimizer steps."""
    step_epochs = config.lr_step_epochs()
    if step_epochs <= 0:
        # epochs < lr_step -> int(epochs/lr_step) == 0: no decay ever
        # fires (the reference's StepLR would crash on step_size=0).
        return optax.constant_schedule(config.learning_rate)
    boundaries = {}
    e = step_epochs
    while e < config.epochs:
        boundaries[e * steps_per_epoch] = 0.1
        e += step_epochs
    return optax.piecewise_constant_schedule(config.learning_rate, boundaries)


def make_optimizer(config, steps_per_epoch: int) -> optax.GradientTransformation:
    return optax.adam(make_lr_schedule(config, steps_per_epoch))


def create_train_state(config, variables, optimizer) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(variables["params"]),
    )
