"""Training state: params + optax Adam with the reference's exponential LR decay.

Parity: Adam(lr, betas=(0.9, 0.999)) (`DS_NeRF/run.py:1528/1638`) with
`lr(step) = lrate * 0.1^(step / (lrate_decay * 1000))` (`run.py:1035-1039`).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import optax


class TrainState(NamedTuple):
    step: jax.Array
    params: Any          # {"coarse": pytree, "fine": pytree | None}
    opt_state: Any


def make_optimizer(lrate: float, lrate_decay: int) -> optax.GradientTransformation:
    schedule = optax.exponential_decay(
        init_value=lrate,
        transition_steps=max(lrate_decay, 1) * 1000,
        decay_rate=0.1,
    )
    return optax.adam(schedule, b1=0.9, b2=0.999, eps=1e-8)


def create_train_state(params, optimizer: optax.GradientTransformation) -> TrainState:
    import jax.numpy as jnp

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
    )
