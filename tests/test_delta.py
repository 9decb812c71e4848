import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.models.delta import (
    accumulate_delta,
    apply_accumulated_to_rays,
    apply_delta,
    init_accumulated,
    init_delta,
)
from neus2_tpu.ops.rotation import rotation_6d_to_matrix


def test_identity_delta_is_noop():
    delta = init_delta()
    pos = jax.random.uniform(jax.random.PRNGKey(0), (5, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(1), (5, 3))
    p, d = apply_delta(delta, pos, dirs)
    np.testing.assert_allclose(p, pos, atol=1e-6)
    np.testing.assert_allclose(d, dirs, atol=1e-6)


def test_accumulation_matches_sequential_application():
    """Folding delta into acc must equal applying delta after acc to rays."""
    key = jax.random.PRNGKey(2)
    d6 = jnp.array([1.0, 0.1, -0.05, 0.02, 1.0, 0.08])
    delta = {"rotation6d": d6, "transition": jnp.array([0.01, -0.02, 0.03])}
    acc = {
        "rotation": rotation_6d_to_matrix(jnp.array([0.9, 0.2, 0.0, -0.1, 1.0, 0.05])),
        "transition": jnp.array([0.05, 0.0, -0.04]),
    }
    o = jax.random.uniform(key, (7, 3))
    d = jax.random.normal(jax.random.PRNGKey(3), (7, 3))

    # Path A: acc ray map, then delta map (R_d(x + t_d)).
    o1, d1 = apply_accumulated_to_rays(acc, o, d)
    rd = rotation_6d_to_matrix(delta["rotation6d"])
    o1 = (rd @ (o1 + delta["transition"]).T).T
    d1 = (rd @ d1.T).T

    # Path B: folded transform applied once.
    acc2 = accumulate_delta(acc, delta)
    o2, d2 = apply_accumulated_to_rays(acc2, o, d)
    np.testing.assert_allclose(o1, o2, atol=1e-5)
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_delta_gradients_flow():
    pos = jax.random.uniform(jax.random.PRNGKey(4), (16, 3))
    dirs = jax.random.uniform(jax.random.PRNGKey(5), (16, 3))

    def loss(delta):
        p, d = apply_delta(delta, pos, dirs)
        return jnp.sum(p**2) + jnp.sum(d**2)

    g = jax.grad(loss)(init_delta())
    assert np.isfinite(np.asarray(g["rotation6d"])).all()
    assert np.abs(np.asarray(g["rotation6d"])).sum() > 0
    assert np.abs(np.asarray(g["transition"])).sum() > 0


def test_accumulated_identity():
    acc = init_accumulated()
    o = jnp.ones((2, 3))
    d = jnp.ones((2, 3))
    o2, d2 = apply_accumulated_to_rays(acc, o, d)
    np.testing.assert_allclose(o2, o, atol=1e-7)
    np.testing.assert_allclose(d2, d, atol=1e-7)
