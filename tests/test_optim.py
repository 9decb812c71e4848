"""neus2_adam: the reference's modified Adam (my_tcnn adam.h:52-160) —
component freezing, lazy non-matrix updates with per-param debias counters,
matrix-only L2, AdaBound clamping."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.utils.optim import OptimConfig, make_optimizer


def _params():
    return {
        "hashgrid": (jnp.ones((16, 2)),),
        "sdf_mlp": {"layers": [{"w": jnp.ones((4, 4)), "b": jnp.zeros((4,))}]},
        "rgb_mlp": {"layers": [{"w": jnp.ones((4, 3)), "b": jnp.zeros((3,))}]},
        "variance": jnp.asarray(0.3),
    }


def _grads(params, scale=1.0):
    return jax.tree_util.tree_map(lambda p: jnp.full_like(p, scale), params)


def test_component_freeze():
    """optimize_params_components: a frozen component's params never move
    (reference adam.h:119-180; config key accepted since round 1 but ignored
    — VERDICT item 7)."""
    cfg = OptimConfig(components=(("rgb_network", False),))
    tx = make_optimizer(cfg)
    params = _params()
    state = tx.init(params)
    updates, state = tx.update(_grads(params), state, params)
    import optax

    new = optax.apply_updates(params, updates)
    # rgb_mlp frozen exactly; others moved.
    for l0, l1 in zip(
        jax.tree_util.tree_leaves(params["rgb_mlp"]),
        jax.tree_util.tree_leaves(new["rgb_mlp"]),
    ):
        np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))
    assert not np.allclose(np.asarray(new["sdf_mlp"]["layers"][0]["w"]),
                           np.asarray(params["sdf_mlp"]["layers"][0]["w"]))
    assert not np.allclose(np.asarray(new["hashgrid"][0]),
                           np.asarray(params["hashgrid"][0]))


def test_lazy_nonmatrix_rows_untouched():
    """Hash-table rows with exactly-zero gradient keep weights, moments AND
    step counters (sparse Adam, adam.h:109-112, 148-150)."""
    cfg = OptimConfig()
    tx = make_optimizer(cfg)
    params = _params()
    state = tx.init(params)
    g = _grads(params, 0.0)
    g["hashgrid"] = (g["hashgrid"][0].at[3].set(1.0),)
    updates, state = tx.update(g, state, params)
    upd_tbl = np.asarray(updates["hashgrid"][0])
    assert np.all(upd_tbl[3] != 0.0)
    others = np.delete(upd_tbl, 3, axis=0)
    np.testing.assert_array_equal(others, 0.0)
    steps = np.asarray(state["steps"]["hashgrid"][0])
    assert np.all(steps[3] == 1)
    assert np.all(np.delete(steps, 3, axis=0) == 0)
    # Matrix params always step (L2 makes their gradient nonzero anyway).
    assert np.all(np.asarray(state["steps"]["sdf_mlp"]["layers"][0]["w"]) == 1)


def test_per_param_debias():
    """A row first touched at global step 100 debiases as if at step 1."""
    cfg = OptimConfig()
    tx = make_optimizer(cfg)
    params = _params()
    state = tx.init(params)
    zero = _grads(params, 0.0)
    for _ in range(5):
        _, state = tx.update(zero, state, params)
    g = _grads(params, 0.0)
    g["hashgrid"] = (g["hashgrid"][0].at[0].set(0.5),)
    updates, state = tx.update(g, state, params)
    # First step for that row: tcnn debias sqrt(1-b2)/(1-b1) with m=(1-b1)g,
    # v=(1-b2)g^2 => delta = -lr * sign(g) (up to epsilon).
    got = float(np.asarray(updates["hashgrid"][0])[0, 0])
    np.testing.assert_allclose(got, -cfg.learning_rate, rtol=1e-3)


def test_adabound_clamps_rate():
    cfg = OptimConfig(adabound=True, learning_rate=1.0)
    tx = make_optimizer(cfg)
    params = {"hashgrid": (jnp.ones((4, 2)),)}
    state = tx.init(params)
    g = {"hashgrid": (jnp.full((4, 2), 1e-6),)}  # tiny grad -> huge raw rate
    updates, _ = tx.update(g, state, params)
    # Rate clamped to upper bound ~ 0.1 + 0.1/(1-b2) at t=1; |m| ~ (1-b1)|g|.
    t = 1.0
    upper = 0.1 + 0.1 / ((1 - cfg.beta2) * t)
    m = (1 - cfg.beta1) * 1e-6
    np.testing.assert_allclose(
        np.asarray(updates["hashgrid"][0]), -upper * m, rtol=1e-4
    )


def test_matrix_l2_applied():
    cfg = OptimConfig(l2_reg=1e-2)
    tx = make_optimizer(cfg)
    params = _params()
    state = tx.init(params)
    g = _grads(params, 0.0)
    updates, _ = tx.update(g, state, params)
    # Zero gradient + L2 on weights: matrices still move, biases do not.
    assert np.all(np.asarray(updates["sdf_mlp"]["layers"][0]["w"]) != 0.0)
    np.testing.assert_array_equal(
        np.asarray(updates["sdf_mlp"]["layers"][0]["b"]), 0.0
    )
