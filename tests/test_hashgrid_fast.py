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


def test_max_level_per_sample_matches_oracle():
    """Per-sample max_level masking (m_max_level_rand_training,
    grid.h:217-240) now works in the production encoder (VERDICT item 7)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neus2_tpu.ops.hashgrid import hashgrid_encode
    from neus2_tpu.ops.hashgrid_fast import make_encode_jac

    cfg = CFG
    tables = init_hashgrid_tables(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (33, 3))
    ml = jax.random.uniform(jax.random.PRNGKey(5), (33,)) * 2.0
    feat, jac = make_encode_jac(cfg)(tables, x, max_level=ml)
    table_cat = jnp.concatenate(tables, axis=0)
    ref = hashgrid_encode(table_cat, x, cfg, max_level=ml)
    np.testing.assert_allclose(np.asarray(feat), np.asarray(ref), atol=1e-5)
    # Masked levels contribute no jacobian either.
    L, F = cfg.n_levels, cfg.n_features_per_level
    for lvl in range(L):
        masked = np.asarray(ml * L + 1e-3 <= lvl)
        j = np.asarray(jac[:, :, lvl * F : (lvl + 1) * F])
        assert np.all(j[masked] == 0.0)


def test_max_level_gradients_flow():
    import jax
    import jax.numpy as jnp
    import numpy as np

    cfg = CFG
    tables = init_hashgrid_tables(jax.random.PRNGKey(3), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(4), (17, 3))
    ml = jnp.full((17,), 0.6)
    enc = make_encode_jac(cfg)

    def loss(t):
        f, j = enc(t, x, max_level=ml)
        return (f ** 2).sum() + (j ** 2).sum()

    g = jax.grad(loss)(tables)
    total = sum(float(jnp.abs(t).sum()) for t in g)
    assert np.isfinite(total) and total > 0.0


def test_bf16_backward_close_to_fp32():
    """compute_dtype=bf16 backward (bf16 contraction operands, fp32
    accumulation — the reference's fp16 dy_dx precision) stays within bf16
    tolerance of the fp32 path."""
    cfg = HashGridConfig(
        n_levels=4, log2_hashmap_size=12, base_resolution=8, per_level_scale=1.5
    )
    tables = init_hashgrid_tables(jax.random.PRNGKey(0), cfg)
    # Scale up table magnitudes so gradients are O(1).
    tables = tuple(t * 1e4 for t in tables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))

    def loss(fn, tb, xx):
        f, j = fn(tb, xx)
        return jnp.sum(f**2) + jnp.sum(j**2)

    f32 = make_encode_jac(cfg)
    b16 = make_encode_jac(cfg, compute_dtype=jnp.bfloat16)
    g32 = jax.grad(lambda tb, xx: loss(f32, tb, xx), argnums=(0, 1))(tables, x)
    g16 = jax.grad(lambda tb, xx: loss(b16, tb, xx), argnums=(0, 1))(tables, x)
    for a, b in zip(jax.tree_util.tree_leaves(g32), jax.tree_util.tree_leaves(g16)):
        denom = jnp.abs(a).max() + 1e-6
        assert float(jnp.abs(a - b).max() / denom) < 2e-2


def test_f8_wide_rows_match_oracle():
    """F=8 rows (the wider-row L4F8 candidate): forward, jacobian, and the
    custom-VJP gradient all match the oracle."""
    cfg = HashGridConfig(
        n_levels=3, n_features_per_level=8, log2_hashmap_size=11,
        base_resolution=4, per_level_scale=2.0,
    )
    tables = init_hashgrid_tables(jax.random.PRNGKey(0), cfg)
    tables = tuple(t * 1e3 for t in tables)
    x = jax.random.uniform(jax.random.PRNGKey(1), (48, 3),
                           minval=0.05, maxval=0.95)
    fast = make_encode_jac(cfg)
    feat, jac = fast(tables, x)
    table_cat = jnp.concatenate(tables, axis=0)
    np.testing.assert_allclose(
        np.asarray(feat), np.asarray(hashgrid_encode(table_cat, x, cfg)),
        rtol=1e-5, atol=1e-6,
    )
    _, jac_ref = encode_jac_reference(tables, x, cfg)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_ref),
                               rtol=1e-4, atol=1e-4)

    def loss_fast(t):
        f, j = fast(t, x)
        return (f ** 2).sum() + (j * 0.1).sum()

    def loss_ref(t):
        f, j = encode_jac_reference(t, x, cfg)
        return (f ** 2).sum() + (j * 0.1).sum()

    g_fast = jax.grad(loss_fast)(tables)
    g_ref = jax.grad(loss_ref)(tables)
    for a, b in zip(g_fast, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
