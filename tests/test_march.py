"""Tests for the inverse-CDF occupancy-guided ray marcher."""

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.engine.march import coarse_intervals, march_rays
from neus2_tpu.engine.occupancy import (
    init_occupancy,
    merge_probes,
    update_bitfield,
)
from neus2_tpu.ops.warp import unit_aabb


def _rays_toward_center(n=8):
    key = jax.random.PRNGKey(0)
    d = jax.random.normal(key, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    origins = 0.5 + 1.3 * d
    return origins, -d


def test_full_chord_coverage_no_occupancy():
    """Without a grid, samples must span the whole AABB chord."""
    o, d = _rays_toward_center()
    s = march_rays(jax.random.PRNGKey(1), o, d, unit_aabb(), None, 128, 32)
    assert bool(s.mask.all())
    tmin, tmax = unit_aabb().ray_intersect(o, d)
    # First sample near entry, last near exit.
    np.testing.assert_allclose(s.t[:, 0], tmin, atol=0.08)
    np.testing.assert_allclose(s.t[:, -1], tmax, atol=0.08)
    # Monotone front-to-back.
    assert bool(jnp.all(jnp.diff(s.t, axis=-1) >= 0))


def test_samples_concentrate_in_occupied_cells():
    """With a tight occupancy shell, every sample lands inside it and dt adapts."""
    grid = init_occupancy(n_cascades=1, grid_size=32)
    # Mark a ball of cells around the center as occupied.
    g = 32
    idx = jnp.arange(g**3)
    xyz = jnp.stack([idx % g, (idx // g) % g, idx // (g * g)], -1)
    center = (xyz + 0.5) / g
    occ_cells = jnp.linalg.norm(center - 0.5, axis=-1) < 0.2
    grid = merge_probes(grid, idx, jnp.where(occ_cells, 1.0, 0.0))
    grid = update_bitfield(grid)

    o, d = _rays_toward_center()
    s = march_rays(jax.random.PRNGKey(2), o, d, unit_aabb(), grid, 256, 32)
    assert bool(s.mask.all())  # every ray crosses the ball
    r = jnp.linalg.norm(s.positions - 0.5, axis=-1)
    # All samples inside the occupied ball (+1 cell slack for cell quantization)
    assert float(r.max()) < 0.2 + 2.0 / 32
    # dt adapted to the occupied span (~2*0.2 chord / 32 samples)
    assert float(s.dt.mean()) < 0.03


def test_missing_rays_masked():
    o = jnp.array([[0.5, 0.5, 2.0]])
    d = jnp.array([[0.0, 0.0, 1.0]])  # points away from the box
    s = march_rays(jax.random.PRNGKey(3), o, d, unit_aabb(), None, 64, 16)
    assert not bool(s.mask.any())


def test_cone_angle_intervals_grow():
    tmin = jnp.array([0.1])
    tmax = jnp.array([10.0])
    t0, dt = coarse_intervals(tmin, tmax, 64, cone_angle=1.0 / 64.0)
    assert float(dt[0, -1]) > float(dt[0, 0])
    assert bool(jnp.all(jnp.diff(t0[0]) > 0))


def test_packed_bitfield_lookup_matches_bool_indexing():
    """occupancy_at's packed-word gather == direct bool-grid indexing, single
    and multi-cascade, including out-of-box points (round-3 march perf path)."""
    import jax
    import jax.numpy as jnp

    from neus2_tpu.engine import occupancy as occ

    key = jax.random.PRNGKey(3)
    for n_casc in (1, 3):
        g = 32
        bits = jax.random.bernoulli(
            jax.random.fold_in(key, n_casc), 0.3, (n_casc, g, g, g)
        )
        state = occ.init_occupancy(n_casc, g)._replace(bitfield=bits)
        span = float(2 ** (n_casc - 1))
        pos = (
            jax.random.uniform(key, (4096, 3)) * (span + 0.4) - (span - 0.6) / 2
        )
        got = occ.occupancy_at(state, pos)

        mip = (
            jnp.zeros(pos.shape[:-1], jnp.int32)
            if n_casc == 1
            else occ.mip_from_pos(pos, n_casc - 1)
        )
        scale = jnp.exp2(-mip.astype(jnp.float32))[..., None]
        rel = (pos - 0.5) * scale + 0.5
        cell = jnp.floor(rel * g).astype(jnp.int32)
        inside = jnp.all((cell >= 0) & (cell < g), axis=-1)
        cellc = jnp.clip(cell, 0, g - 1)
        want = bits[mip, cellc[..., 2], cellc[..., 1], cellc[..., 0]] & inside
        assert bool(jnp.all(got == want))
