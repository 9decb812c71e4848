import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.ops.losses import (
    eikonal_loss,
    huber_loss,
    linear_to_srgb,
    mask_bce_loss,
    rgb_loss,
    srgb_to_linear,
)
from neus2_tpu.ops.sh import sh_encode, sh_output_dim


def test_huber_regions():
    t = jnp.zeros(3)
    small = huber_loss(t, jnp.full(3, 0.05), alpha=0.1)
    np.testing.assert_allclose(small, 0.5 * 0.05**2, rtol=1e-6)
    large = huber_loss(t, jnp.full(3, 1.0), alpha=0.1)
    np.testing.assert_allclose(large, 0.1 * (1.0 - 0.05), rtol=1e-6)


def test_rgb_loss_menu():
    t = jnp.array([0.2, 0.5, 0.9])
    p = jnp.array([0.3, 0.4, 0.8])
    for name in ["L2", "L1", "Huber", "LogL1", "RelativeL2", "Mape", "Smape"]:
        out = rgb_loss(t, p, name)
        assert out.shape == (3,)
        assert np.all(np.asarray(out) >= 0)


def test_eikonal_unit_normals_zero():
    normals = jnp.ones((2, 4, 3)) / np.sqrt(3.0)
    mask = jnp.ones((2, 4), bool)
    np.testing.assert_allclose(eikonal_loss(normals, mask), 0.0, atol=1e-5)


def test_eikonal_masking():
    normals = jnp.concatenate(
        [jnp.ones((1, 2, 3)), jnp.zeros((1, 2, 3))], axis=1
    )  # second half invalid
    mask = jnp.array([[True, True, False, False]])
    got = eikonal_loss(normals, mask)
    want = (np.sqrt(3.0 + 1e-6) - 1) ** 2
    np.testing.assert_allclose(got, [want], rtol=1e-5)


def test_mask_bce():
    # Opaque ray with mask=1 -> tiny loss; transparent ray with mask=1 -> big.
    assert mask_bce_loss(jnp.asarray(0.999), jnp.asarray(1.0)) < 0.01
    assert mask_bce_loss(jnp.asarray(0.001), jnp.asarray(1.0)) > 5.0
    g = jax.grad(lambda w: mask_bce_loss(w, jnp.asarray(1.0)))(jnp.asarray(0.5))
    assert np.isfinite(g)


def test_srgb_roundtrip():
    x = jnp.linspace(0.0, 1.0, 64)
    np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x, atol=1e-5)


def test_sh_dims_and_constant():
    d = jnp.array([[0.5, 0.5, 1.0]])  # warped +z
    for deg in range(1, 9):
        out = sh_encode(d, deg)
        assert out.shape == (1, sh_output_dim(deg))
    np.testing.assert_allclose(out[0, 0], 0.28209479177387814, rtol=1e-6)


def test_sh_orthonormality():
    """Monte-Carlo check that the basis is orthonormal over the sphere."""
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (50000, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    basis = sh_encode((v + 1.0) * 0.5, 4)  # unwarp convention
    gram = (basis.T @ basis) / v.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.1)
