import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.ops.hashgrid import (
    HashGridConfig,
    hashgrid_encode,
    init_hashgrid,
)

SMALL = HashGridConfig(
    n_levels=4,
    n_features_per_level=2,
    log2_hashmap_size=9,
    base_resolution=4,
    per_level_scale=2.0,
)


def _numpy_oracle(table, positions, config):
    """Straight NumPy transcription of the interpolation contract."""
    resolutions, scales, offsets, sizes, use_hash = config.level_tables()
    B = positions.shape[0]
    out = np.zeros((B, config.n_levels * config.n_features_per_level), np.float32)
    primes = np.array([1, 2654435761, 805459861], np.uint64)
    for lvl in range(config.n_levels):
        pos = positions * scales[lvl] + 0.5
        grid = np.floor(pos).astype(np.int64)
        frac = pos - np.floor(pos)
        feat = np.zeros((B, config.n_features_per_level), np.float32)
        for corner in range(8):
            off = np.array([(corner >> d) & 1 for d in range(3)])
            w = np.prod(np.where(off == 1, frac, 1 - frac), axis=-1)
            pg = grid + off
            if use_hash[lvl]:
                h = np.zeros(B, np.uint64)
                for d in range(3):
                    h ^= (pg[:, d].astype(np.uint64) * primes[d]) & 0xFFFFFFFF
                idx = (h & 0xFFFFFFFF) % sizes[lvl]
            else:
                idx = (
                    pg[:, 0]
                    + pg[:, 1] * resolutions[lvl]
                    + pg[:, 2] * resolutions[lvl] ** 2
                ) % sizes[lvl]
            feat += w[:, None] * table[offsets[lvl] + idx.astype(np.int64)]
        out[:, lvl * 2 : lvl * 2 + 2] = feat
    return out


def test_matches_numpy_oracle():
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (SMALL.n_table_entries, 2), jnp.float32)
    pos = jax.random.uniform(jax.random.PRNGKey(1), (128, 3))
    got = hashgrid_encode(table, pos, SMALL)
    want = _numpy_oracle(np.asarray(table), np.asarray(pos), SMALL)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_level_tables_match_reference_shapes():
    # base.json config: L=14, F=2, T=2^19, Nmin=16, top 2048.
    pls = HashGridConfig.per_level_scale_from_top(16, 2048, 14)
    cfg = HashGridConfig(
        n_levels=14, n_features_per_level=2, log2_hashmap_size=19,
        base_resolution=16, per_level_scale=pls,
    )
    resolutions, scales, offsets, sizes, use_hash = cfg.level_tables()
    assert resolutions[0] == 16
    # Float rounding in the exp2 chain can land on 2048 or 2049 (the
    # reference computes this in fp32 and has the same sensitivity).
    assert resolutions[-1] in (2048, 2049)
    # Coarse levels are dense (no hashing), fine ones hashed.
    assert not use_hash[0]
    assert use_hash[-1]
    assert all(s <= 1 << 19 for s in sizes)
    # NeuS2 quirk: lookup scale is resolution-1.
    assert scales[0] == 15.0


def test_interpolation_continuity():
    """Encoding must be continuous across cell boundaries."""
    key = jax.random.PRNGKey(2)
    table = init_hashgrid(key, SMALL) * 1e4  # boost amplitude
    base = jnp.array([[0.37, 0.52, 0.11]])
    eps = 1e-6
    a = hashgrid_encode(table, base, SMALL)
    b = hashgrid_encode(table, base + eps, SMALL)
    np.testing.assert_allclose(a, b, atol=1e-3)


def test_gradient_flows_to_table():
    key = jax.random.PRNGKey(3)
    table = init_hashgrid(key, SMALL)
    pos = jax.random.uniform(jax.random.PRNGKey(4), (16, 3))

    def loss(t):
        return jnp.sum(hashgrid_encode(t, pos, SMALL) ** 2)

    g = jax.grad(loss)(table)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0


def test_second_order_grad():
    """grad-of-grad through the interpolation (the eikonal path)."""
    key = jax.random.PRNGKey(5)
    table = init_hashgrid(key, SMALL)
    pos = jnp.array([[0.3, 0.4, 0.5]])

    def sdf(t, p):
        return jnp.sum(hashgrid_encode(t, p, SMALL))

    def eikonal(t):
        grad_x = jax.grad(sdf, argnums=1)(t, pos)
        return jnp.sum((jnp.linalg.norm(grad_x) - 1.0) ** 2)

    g = jax.grad(eikonal)(table)
    assert np.isfinite(np.asarray(g)).all()


def test_valid_level_masking():
    key = jax.random.PRNGKey(6)
    table = jax.random.normal(key, (SMALL.n_table_entries, 2))
    pos = jax.random.uniform(jax.random.PRNGKey(7), (8, 3))
    out = hashgrid_encode(table, pos, SMALL, valid_level=1)
    # Levels 0 and 1 active (level > valid_level zeroed), 2..3 zero.
    assert np.abs(np.asarray(out[:, :4])).sum() > 0
    np.testing.assert_allclose(out[:, 4:], 0.0)


def test_valid_level_schedule():
    cfg = HashGridConfig(
        n_levels=14, valid_level_scale=0.02, base_valid_level_scale=0.2,
        base_training_step=100,
    )
    # step <= 0: everything unlocked (predicting global movement).
    assert int(cfg.valid_level(jnp.asarray(0))) == 14
    assert int(cfg.valid_level(jnp.asarray(-5))) == 14
    # ceil(0.2*14) = 3 levels at step 1.
    assert int(cfg.valid_level(jnp.asarray(1))) == 3
    # +0.02/step after step 100.
    assert int(cfg.valid_level(jnp.asarray(100))) == 3
    assert int(cfg.valid_level(jnp.asarray(200))) == int(np.ceil(0.2 * 14 + 0.02 * 100))
    assert int(cfg.valid_level(jnp.asarray(10000))) == 14


def test_max_level_per_sample():
    key = jax.random.PRNGKey(8)
    table = jax.random.normal(key, (SMALL.n_table_entries, 2))
    pos = jax.random.uniform(jax.random.PRNGKey(9), (2, 3))
    ml = jnp.array([0.5, 1.0])
    out = hashgrid_encode(table, pos, SMALL, max_level=ml)
    # Reference gate: zero when lvl >= ml*L + 1e-3 (grid.h:217-240); with
    # ml=0.5, L=4 levels 0..2 stay, level 3 is zeroed.
    assert np.abs(np.asarray(out[0, 4:6])).sum() > 0
    np.testing.assert_allclose(out[0, 6:], 0.0)
    assert np.abs(np.asarray(out[1, 6:])).sum() > 0
