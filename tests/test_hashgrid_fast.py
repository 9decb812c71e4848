"""hashgrid_fast vs the naive oracle: values, jacobian, and custom VJP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.ops.hashgrid import HashGridConfig, hashgrid_encode
from neus2_tpu.ops.hashgrid_fast import (
    encode_jac_reference,
    init_hashgrid_tables,
    make_encode_jac,
)

CFG = HashGridConfig(
    n_levels=5, n_features_per_level=2, log2_hashmap_size=11,
    base_resolution=4, per_level_scale=1.7,
)


@pytest.fixture(scope="module")
def setup():
    tables = init_hashgrid_tables(jax.random.PRNGKey(0), CFG)
    # Larger values so gradients are non-trivial.
    tables = tuple(t * 1e4 for t in tables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=0.05, maxval=0.95)
    return tables, x


def test_features_match_oracle(setup):
    tables, x = setup
    fast = make_encode_jac(CFG)
    feat, jac = fast(tables, x)
    table_cat = jnp.concatenate(tables, axis=0)
    feat_ref = hashgrid_encode(table_cat, x, CFG)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(feat_ref), rtol=1e-5, atol=1e-6)


def test_jacobian_matches_oracle(setup):
    tables, x = setup
    fast = make_encode_jac(CFG)
    _, jac = fast(tables, x)
    _, jac_ref = encode_jac_reference(tables, x, CFG)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref), rtol=1e-4, atol=1e-4)


def test_valid_level_gating(setup):
    tables, x = setup
    fast = make_encode_jac(CFG)
    feat, jac = fast(tables, x, valid_level=1)
    F = CFG.n_features_per_level
    assert np.abs(np.asarray(feat[:, 2 * F:])).max() == 0
    assert np.abs(np.asarray(jac[:, :, 2 * F:])).max() == 0
    assert np.abs(np.asarray(feat[:, : 2 * F])).max() > 0


def test_vjp_matches_autodiff_oracle(setup):
    tables, x = setup
    fast = make_encode_jac(CFG)
    ct_feat = jax.random.normal(jax.random.PRNGKey(2), (64, CFG.output_dim))
    ct_jac = jax.random.normal(jax.random.PRNGKey(3), (64, 3, CFG.output_dim))

    def loss_fast(tabs, xx):
        f, j = fast(tabs, xx)
        return jnp.sum(f * ct_feat) + jnp.sum(j * ct_jac)

    def loss_ref(tabs, xx):
        f, j = encode_jac_reference(tabs, xx, CFG)
        return jnp.sum(f * ct_feat) + jnp.sum(j * ct_jac)

    gt_fast, gx_fast = jax.grad(loss_fast, argnums=(0, 1))(tables, x)
    gt_ref, gx_ref = jax.grad(loss_ref, argnums=(0, 1))(tables, x)
    for a, b in zip(gt_fast, gt_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(np.asarray(gx_fast), np.asarray(gx_ref), rtol=1e-3, atol=1e-2)
