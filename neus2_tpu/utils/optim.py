"""Optimizer stack: Ema(ExponentialDecay(Adam)) as an optax chain.

Mirrors the reference's nested optimizer config
(reference: configs/nerf/base.json:5-28 and
dependencies/my_tcnn/include/tiny-cuda-nn/optimizers/{adam,ema,exponential_decay}.h):

  * Adam with beta1=0.9, beta2=0.99, eps=1e-15, L2 regularization only on
    matrix (MLP weight) parameters (adam.h:132-135);
  * piecewise-exponential learning-rate decay: lr *= decay_base every
    decay_interval steps after decay_start (exponential_decay.h);
  * an EMA copy of the parameters (decay 0.95) used for inference
    (ema.h:111-156 custom_weights) — kept in the train state, not in optax;
  * canonical/delta parameter gating becomes two separate optimizers over two
    separate pytrees (field params vs delta transform params).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    learning_rate: float = 1e-3
    # Learning rate for frames after the first in dynamic scenes
    # (reference Adam "after_learning_rate", testbed.cu:2698-2703).
    after_learning_rate: float = 1e-3
    beta1: float = 0.9
    beta2: float = 0.99
    epsilon: float = 1e-15
    l2_reg: float = 1e-6
    decay_start: int = 20000
    decay_interval: int = 10000
    decay_base: float = 0.33
    ema_decay: float = 0.95


def exp_decay_schedule(config: OptimConfig):
    """Piecewise-constant exponential decay (tcnn ExponentialDecay)."""

    def schedule(step):
        n = jnp.maximum(0, step - config.decay_start) // config.decay_interval
        active = (step >= config.decay_start).astype(jnp.float32)
        return config.learning_rate * jnp.power(
            config.decay_base, n.astype(jnp.float32) * active + active
        )

    def schedule_fixed(step):
        # lr stays at base before decay_start; afterwards multiply by
        # decay_base once per completed interval (first drop AT decay_start).
        past = jnp.maximum(step - config.decay_start, -1)
        n_drops = jnp.where(past < 0, 0, past // config.decay_interval + 1)
        return config.learning_rate * jnp.power(
            config.decay_base, n_drops.astype(jnp.float32)
        )

    return schedule_fixed


def _is_matrix_param(path: tuple, leaf) -> bool:
    """MLP weight matrices get L2 reg; tables/biases/scalars do not."""
    keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
    return "w" in keys


def make_optimizer(config: OptimConfig) -> optax.GradientTransformation:
    schedule = exp_decay_schedule(config)
    adam = optax.scale_by_adam(
        b1=config.beta1, b2=config.beta2, eps=config.epsilon
    )

    def add_l2(updates, state, params=None):
        if params is None:
            return updates, state
        flat_u = jax.tree_util.tree_flatten_with_path(updates)[0]
        del flat_u

        def leaf(path, u, p):
            if _is_matrix_param(path, p):
                return u + config.l2_reg * p
            return u

        new_updates = jax.tree_util.tree_map_with_path(
            lambda path, u, p: leaf(path, u, p), updates, params
        )
        return new_updates, state

    l2 = optax.GradientTransformation(lambda params: optax.EmptyState(), add_l2)
    return optax.chain(
        l2,
        adam,
        optax.scale_by_learning_rate(schedule),
    )


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """EMA-of-parameters used for inference (tcnn ema.h)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
