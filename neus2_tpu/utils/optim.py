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
    # Per-component freeze map from the config's optimize_params_components
    # (reference adam.h:119-180 n_weights_optimize): tuple of (component
    # name, trainable) pairs; components absent default to trainable.
    # Component names use the reference vocabulary (density_network,
    # rgb_network, variance_network, pos_encoding, dir_encoding).
    components: tuple = ()
    # AdaBound lr clamping (reference adam.h:285-290, off by default).
    adabound: bool = False
    # Reference m_non_matrix_learning_rate_factor (adam.h:143-146).
    non_matrix_lr_factor: float = 1.0


# Pytree top-level key -> reference component name (layout order
# nerf_network.h n_params_components / initialize_params 741-785).
_COMPONENT_OF_KEY = {
    "sdf_mlp": "density_network",
    "rgb_mlp": "rgb_network",
    "variance": "variance_network",
    "hashgrid": "pos_encoding",
    "hashgrid_base": "pos_encoding",
}


def exp_decay_schedule(config: OptimConfig):
    """Piecewise-constant exponential decay (tcnn ExponentialDecay)."""

    def schedule_fixed(step):
        # lr stays at base before decay_start; afterwards multiply by
        # decay_base once per completed interval (first drop AT decay_start).
        past = jnp.maximum(step - config.decay_start, -1)
        n_drops = jnp.where(past < 0, 0, past // config.decay_interval + 1)
        return config.learning_rate * jnp.power(
            config.decay_base, n_drops.astype(jnp.float32)
        )

    return schedule_fixed


def _path_keys(path: tuple) -> list:
    return [getattr(p, "key", getattr(p, "idx", None)) for p in path]


def _is_matrix_param(path: tuple, leaf=None) -> bool:
    """MLP weight matrices get L2 reg; tables/biases/scalars do not."""
    return "w" in _path_keys(path)


def _component_trainable(path: tuple, config: OptimConfig) -> bool:
    """optimize_params_components gate for the leaf at ``path``."""
    if not config.components:
        return True
    keys = _path_keys(path)
    top = keys[0] if keys else None
    name = _COMPONENT_OF_KEY.get(top, top)
    return dict(config.components).get(name, True)


def neus2_adam(config: OptimConfig) -> optax.GradientTransformation:
    """The reference's modified Adam as one optax transformation
    (my_tcnn adam.h:52-160 adam_step), producing the full update
    (new_w - w) including the lr schedule:

      * L2 reg only on matrix (MLP weight) params (adam.h:132-135);
      * NON-matrix params (hash tables, biases, variance) skip steps whose
        gradient is exactly zero — no moment decay, no step count ("lazy"
        sparse Adam, adam.h:109-112) — with PER-PARAM step counters for
        debiasing (adam.h:148-150);
      * tcnn debias form: lr *= sqrt(1-b2^t)/(1-b1^t), then
        w -= clamp(lr / (sqrt(v)+eps), bounds) * m;
      * optional AdaBound clamping of the per-param rate (adam.h:285-290);
      * per-component freezing via optimize_params_components
        (adam.h:119-180);
      * non_matrix_learning_rate_factor (adam.h:143-146).
    """
    schedule = exp_decay_schedule(config)

    def init(params):
        zeros = lambda p: jax.tree_util.tree_map(jnp.zeros_like, p)
        steps = jax.tree_util.tree_map(
            lambda p: jnp.zeros(jnp.shape(p), jnp.int32), params
        )
        return {
            "mu": zeros(params),
            "nu": zeros(params),
            "steps": steps,
            "count": jnp.zeros((), jnp.int32),
        }

    def update(updates, state, params=None):
        assert params is not None, "neus2_adam requires params"
        count = state["count"] + 1
        lr = schedule(count)
        if config.adabound:
            t = count.astype(jnp.float32)
            lower = 0.1 - 0.1 / ((1.0 - config.beta2) * t + 1.0)
            upper = 0.1 + 0.1 / ((1.0 - config.beta2) * t)
        else:
            lower, upper = 0.0, jnp.inf

        def leaf(path, g, p, mu, nu, steps):
            if not _component_trainable(path, config):
                return jnp.zeros_like(p), mu, nu, steps
            is_matrix = _is_matrix_param(path)
            if is_matrix:
                g = g + config.l2_reg * p
                active = jnp.ones(jnp.shape(g), bool)
                leaf_lr = lr
            else:
                # Lazy non-matrix updates: zero gradient => untouched.
                active = g != 0.0
                leaf_lr = lr * config.non_matrix_lr_factor
            new_mu = jnp.where(
                active, config.beta1 * mu + (1 - config.beta1) * g, mu
            )
            new_nu = jnp.where(
                active, config.beta2 * nu + (1 - config.beta2) * g * g, nu
            )
            new_steps = steps + active.astype(jnp.int32)
            t = jnp.maximum(new_steps, 1).astype(jnp.float32)
            debias = jnp.sqrt(1.0 - config.beta2**t) / (1.0 - config.beta1**t)
            eff = jnp.clip(
                leaf_lr * debias / (jnp.sqrt(new_nu) + config.epsilon),
                lower,
                upper,
            )
            delta = jnp.where(active, -eff * new_mu, 0.0)
            return delta, new_mu, new_nu, new_steps

        flat_g = jax.tree_util.tree_flatten_with_path(updates)
        paths = [p for p, _ in flat_g[0]]
        gs = [g for _, g in flat_g[0]]
        treedef = flat_g[1]
        ps = jax.tree_util.tree_leaves(params)
        mus = jax.tree_util.tree_leaves(state["mu"])
        nus = jax.tree_util.tree_leaves(state["nu"])
        sts = jax.tree_util.tree_leaves(state["steps"])
        out = [leaf(*args) for args in zip(paths, gs, ps, mus, nus, sts)]
        unflat = lambda xs: jax.tree_util.tree_unflatten(treedef, xs)
        new_state = {
            "mu": unflat([o[1] for o in out]),
            "nu": unflat([o[2] for o in out]),
            "steps": unflat([o[3] for o in out]),
            "count": count,
        }
        return unflat([o[0] for o in out]), new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(config: OptimConfig) -> optax.GradientTransformation:
    return neus2_adam(config)


def ema_update(ema_params: Any, params: Any, decay: float) -> Any:
    """EMA-of-parameters used for inference (tcnn ema.h)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema_params, params
    )
