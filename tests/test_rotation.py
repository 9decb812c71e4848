import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.ops.rotation import (
    apply_rigid,
    identity_6d,
    matrix_to_rotation_6d,
    rotation_6d_to_matrix,
)


def test_identity():
    r = rotation_6d_to_matrix(identity_6d())
    np.testing.assert_allclose(r, np.eye(3), atol=1e-6)


def test_orthonormal():
    key = jax.random.PRNGKey(0)
    d6 = jax.random.normal(key, (32, 6))
    r = rotation_6d_to_matrix(d6)
    rtr = jnp.einsum("bij,bkj->bik", r, r)
    np.testing.assert_allclose(rtr, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
    det = jnp.linalg.det(r)
    np.testing.assert_allclose(det, np.ones(32), atol=1e-5)


def test_roundtrip():
    key = jax.random.PRNGKey(1)
    d6 = jax.random.normal(key, (8, 6))
    r = rotation_6d_to_matrix(d6)
    d6_back = matrix_to_rotation_6d(r)
    r2 = rotation_6d_to_matrix(d6_back)
    np.testing.assert_allclose(r, r2, atol=1e-5)


def test_apply_rigid():
    r = rotation_6d_to_matrix(jnp.array([0.0, 1, 0, -1, 0, 0]))  # 90deg about z
    p = jnp.array([1.0, 0, 0])
    t = jnp.array([0.0, 0, 1])
    out = apply_rigid(r, t, p)
    np.testing.assert_allclose(out, [0, -1, 1], atol=1e-6)


def test_differentiable():
    def f(d6):
        r = rotation_6d_to_matrix(d6)
        return jnp.sum(r @ jnp.array([1.0, 2.0, 3.0]))

    g = jax.grad(f)(identity_6d() + 0.1)
    assert np.all(np.isfinite(g))
