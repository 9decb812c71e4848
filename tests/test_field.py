import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.models.field import (
    FieldConfig,
    field_forward,
    init_field,
    sdf_fn,
    sdf_normal_features,
)
from neus2_tpu.ops.hashgrid import HashGridConfig

CFG = FieldConfig(
    grid=HashGridConfig(
        n_levels=4, n_features_per_level=2, log2_hashmap_size=10,
        base_resolution=4, per_level_scale=1.6,
    ),
    sdf_hidden_dim=32,
    rgb_hidden_dim=32,
    sh_degree=4,
)


@pytest.fixture(scope="module")
def params():
    return init_field(jax.random.PRNGKey(0), CFG)


def test_geometric_init_is_sphere(params):
    """Initial SDF must approximate |x - 0.5| - radius (SURVEY §7.3 item 5)."""
    center = jnp.full((1, 3), 0.5)
    sdf_c, _ = sdf_fn(params, center, CFG)
    assert sdf_c[0] < -0.2  # well inside

    corner = jnp.full((1, 3), 0.95)
    sdf_corner, _ = sdf_fn(params, corner, CFG)
    assert sdf_corner[0] > 0.1  # outside

    # Near the expected surface |x-c| = 0.5 the sdf should be near zero.
    key = jax.random.PRNGKey(1)
    d = jax.random.normal(key, (64, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    surf = 0.5 + 0.5 * d * 0.99  # stay in the unit cube
    sdf_s, _ = sdf_fn(params, surf, CFG)
    assert float(jnp.abs(sdf_s).mean()) < 0.15


def test_normals_match_finite_differences(params):
    x = jnp.array([[0.4, 0.55, 0.62], [0.7, 0.3, 0.5]])
    _, normal, _ = sdf_normal_features(params, x, CFG)
    eps = 1e-3
    for d in range(3):
        dx = jnp.zeros(3).at[d].set(eps)
        plus, _ = sdf_fn(params, x + dx, CFG)
        minus, _ = sdf_fn(params, x - dx, CFG)
        fd = (plus - minus) / (2 * eps)
        np.testing.assert_allclose(normal[:, d], fd, atol=2e-2, rtol=1e-2)


def test_init_normals_near_unit(params):
    """Geometric init should give roughly eikonal-satisfying normals."""
    key = jax.random.PRNGKey(2)
    x = 0.5 + (jax.random.uniform(key, (256, 3)) - 0.5) * 0.8
    _, normal, _ = sdf_normal_features(params, x, CFG)
    norms = jnp.linalg.norm(normal, axis=-1)
    assert 0.5 < float(norms.mean()) < 2.0


def test_field_forward_shapes(params):
    x = jax.random.uniform(jax.random.PRNGKey(3), (10, 3))
    d = jax.random.uniform(jax.random.PRNGKey(4), (10, 3))
    out = field_forward(params, x, d, CFG)
    assert out.rgb.shape == (10, 3)
    assert out.sdf.shape == (10,)
    assert out.normal.shape == (10, 3)
    assert np.all(np.asarray(out.rgb) >= 0) and np.all(np.asarray(out.rgb) <= 1)
    np.testing.assert_allclose(out.inv_s, np.exp(3.0), rtol=1e-5)


def test_second_order_through_field(params):
    """The eikonal path: d/dparams of a loss on dSDF/dx must be finite/nonzero."""
    x = jax.random.uniform(jax.random.PRNGKey(5), (8, 3)) * 0.5 + 0.25

    def eikonal(p):
        _, normal, _ = sdf_normal_features(p, x, CFG)
        return jnp.mean((jnp.linalg.norm(normal, axis=-1) - 1.0) ** 2)

    g = jax.grad(eikonal)(params)
    for t in jax.tree_util.tree_leaves(g["hashgrid"]):
        assert np.isfinite(np.asarray(t)).all()
    mlp_g = np.asarray(g["sdf_mlp"]["layers"][0]["w"])
    assert np.isfinite(mlp_g).all()
    assert np.abs(mlp_g).sum() > 0


def test_valid_level_still_differentiable(params):
    x = jax.random.uniform(jax.random.PRNGKey(6), (4, 3))

    def f(p):
        s, n, _ = sdf_normal_features(p, x, CFG, valid_level=jnp.asarray(1))
        return jnp.sum(s) + jnp.sum(n)

    g = jax.grad(f)(params)
    for t in jax.tree_util.tree_leaves(g["hashgrid"]):
        assert np.isfinite(np.asarray(t)).all()
