"""Multi-cascade occupancy: aabb_scale > 1 scenes can occupy (and train)
space outside the unit cube (reference derives cascades from aabb_scale,
src/testbed_nerf.cu:3293+; cascade geometry nerf.h:24 / common_device.cuh)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_multi_sphere_dataset
from neus2_tpu.engine import occupancy as occ
from neus2_tpu.engine.train import TrainConfig
from neus2_tpu.models.field import FieldConfig, sdf_fn
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.ops.warp import scene_aabb, warp_position

OUTER_CENTER = np.array([1.25, 0.5, 0.5], np.float32)
OUTER_RADIUS = 0.3


def test_mip_from_pos():
    pos = jnp.array(
        [
            [0.5, 0.5, 0.5],  # center -> cascade 0
            [0.9, 0.5, 0.5],  # inside unit cube -> 0
            [1.3, 0.5, 0.5],  # |x-0.5|=0.8 -> cascade 1 (box side 2)
            [2.2, 0.5, 0.5],  # |x-0.5|=1.7 -> cascade 2 (box side 4)
        ]
    )
    mips = occ.mip_from_pos(pos, max_cascade=3)
    np.testing.assert_array_equal(np.asarray(mips), [0, 0, 1, 2])


def test_multicascade_occupancy_at():
    grid = occ.init_occupancy(n_cascades=3)
    g = grid.grid_size
    # Mark the cell containing (1.4, 0.5, 0.5) in cascade 1 occupied.
    pos = jnp.array([[1.4, 0.5, 0.5]])
    rel = (pos - 0.5) * 0.5 + 0.5
    cell = jnp.floor(rel * g).astype(int)[0]
    bits = grid.bitfield.at[1, cell[2], cell[1], cell[0]].set(True)
    grid = grid._replace(bitfield=bits)
    assert bool(occ.occupancy_at(grid, pos)[0])
    assert not bool(occ.occupancy_at(grid, jnp.array([[1.4, 0.5, 0.9]]))[0])
    # A position outside every cascade box is never occupied.
    assert not bool(occ.occupancy_at(grid, jnp.array([[9.0, 0.5, 0.5]]))[0])


def test_maxpool_inheritance():
    """Coarser cascades inherit finer occupancy in their central half."""
    grid = occ.init_occupancy(n_cascades=2)
    g = grid.grid_size
    density = grid.density.at[0, g // 2, g // 2, g // 2].set(1.0)
    grid = occ.update_bitfield(grid._replace(density=density))
    # The same world position must read occupied through cascade 1 lookup too.
    pos = jnp.array([[0.5 + 0.5 / g, 0.5 + 0.5 / g, 0.5 + 0.5 / g]])
    rel = (pos - 0.5) * 0.5 + 0.5
    cell = jnp.floor(rel * g).astype(int)[0]
    assert bool(grid.bitfield[1, cell[2], cell[1], cell[0]])


def test_testbed_derives_cascades():
    ds = make_multi_sphere_dataset(
        spheres=[(np.array([0.5, 0.5, 0.5], np.float32), 0.25)],
        n_views=4,
        resolution=24,
        aabb_scale=4,
    )
    tb = Testbed(config=_tiny_cfg())
    tb.load_training_data_from_datasets([ds])
    assert tb.config.aabb_scale == 4
    assert tb.config.occ_cascades == 3
    assert tb.state.occupancy.n_cascades == 3


def _tiny_cfg(**kw):
    return TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=6, log2_hashmap_size=14, base_resolution=16,
                per_level_scale=1.45,
            ),
            sdf_hidden_dim=32,
            rgb_hidden_dim=32,
        ),
        n_rays=512,
        samples_per_ray=48,
        n_candidates=128,
        ek_loss_weight=0.1,
        mask_loss_weight=0.1,
        occ_n_probe=1 << 13,
        **kw,
    )


@pytest.mark.slow
def test_aabb_scale4_scene_trains():
    """An aabb_scale=4 scene with a sphere OUTSIDE the unit cube keeps its
    out-of-cube geometry occupied, marched and supervised end-to-end:
    round-1 gap — single-cascade occupancy culled everything outside
    [0,1]^3 so the outer geometry could never train (VERDICT.md round 1)."""
    ds = make_multi_sphere_dataset(
        spheres=[
            (np.array([0.5, 0.5, 0.5], np.float32), 0.25),
            (OUTER_CENTER, OUTER_RADIUS),
        ],
        n_views=14,
        resolution=64,
        cam_distance=2.6,
        aabb_scale=4,
    )
    # Geometric init sized to the scene envelope: the outer sphere sits
    # ~0.19 warp units from the scene center, so init_radius=0.2 puts the
    # sphere prior's zero set within reach of BOTH spheres (for scenes
    # spanning multiple cascades the init radius is the documented knob).
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, field=dataclasses.replace(cfg.field, init_radius=0.2)
    )
    tb = Testbed(
        config=cfg,
        hyper=Hyperparams(first_frame_max_training_step=300),
    )
    tb.load_training_data_from_datasets([ds])

    # The init prior sweep must mark the outer sphere BEFORE training
    # (reference step-0 whole-grid probe analog, occupancy_prior_sweep).
    theta_s = np.linspace(0, 2 * np.pi, 24, endpoint=False)
    surf = OUTER_CENTER + 1.0 * OUTER_RADIUS * np.stack(
        [np.cos(theta_s), np.zeros_like(theta_s), np.sin(theta_s)], -1
    ).astype(np.float32)
    frac0 = float(
        jnp.mean(
            occ.occupancy_at(tb.state.occupancy, jnp.asarray(surf)).astype(
                jnp.float32
            )
        )
    )
    assert frac0 > 0.5, f"prior sweep left outer surface unoccupied ({frac0:.2f})"

    while tb.frame():
        pass

    # After training the outer surface region must STILL be occupied
    # (marched + supervised — no silent cull of out-of-cube geometry).
    occ_hits = occ.occupancy_at(tb.state.occupancy, jnp.asarray(surf))
    frac = float(jnp.mean(occ_hits.astype(jnp.float32)))
    assert frac > 0.5, f"outer-sphere region mostly unoccupied ({frac:.2f})"

    # And the SDF must not have collapsed: the contested-geometry failure
    # mode (background rays carving unsampled regions) drove |sdf| to ~1.0+
    # here before the occupancy sweep redesign; with the region marched the
    # field stays anchored near the surface.
    theta = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    pts = OUTER_CENTER + OUTER_RADIUS * np.stack(
        [np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1
    )
    aabb = scene_aabb(tb.config.aabb_scale)
    sdf, _ = sdf_fn(
        tb.state.ema_params,
        warp_position(jnp.asarray(pts, jnp.float32), aabb),
        tb.config.field,
    )
    err = float(jnp.mean(jnp.abs(sdf)))
    assert err < 0.2, f"outer sphere SDF collapsed ({err})"


@pytest.mark.slow
def test_aabb_scale4_outer_sphere_converges():
    """Full SDF convergence of the out-of-cube sphere.

    This was impossible before the warp-metric dt fix in neus_alpha
    (engine/train.py): the reference's formula plugs WORLD dt into a
    warp-metric sdf extrapolation — a latent bug invisible upstream (its
    scenes are normalized to aabb_scale 1) that inflates alpha 4x at scale
    4 and bulldozes all geometry."""
    ds = make_multi_sphere_dataset(
        spheres=[
            (np.array([0.5, 0.5, 0.5], np.float32), 0.25),
            (OUTER_CENTER, OUTER_RADIUS),
        ],
        n_views=14,
        resolution=64,
        cam_distance=2.6,
        aabb_scale=4,
    )
    cfg = _tiny_cfg()
    cfg = dataclasses.replace(
        cfg, field=dataclasses.replace(cfg.field, init_radius=0.2)
    )
    tb = Testbed(
        config=cfg, hyper=Hyperparams(first_frame_max_training_step=900)
    )
    tb.load_training_data_from_datasets([ds])
    while tb.frame():
        pass
    theta = np.linspace(0, 2 * np.pi, 32, endpoint=False)
    pts = OUTER_CENTER + OUTER_RADIUS * np.stack(
        [np.cos(theta), np.sin(theta), np.zeros_like(theta)], -1
    )
    aabb = scene_aabb(tb.config.aabb_scale)
    sdf, _ = sdf_fn(
        tb.state.ema_params,
        warp_position(jnp.asarray(pts, jnp.float32), aabb),
        tb.config.field,
    )
    err = float(jnp.mean(jnp.abs(sdf)))
    assert err < 0.022, f"outer sphere SDF error {err}"


def test_probe_sweep_is_permutation_nonpow2_cascades():
    """One full round-robin sweep probes EVERY cell exactly once — including
    cascade counts whose cell total does not divide 2^32 (3/5/6/7-cascade
    scenes).  The EMA-max decay in occupancy_update is calibrated to this
    guarantee; regression for the uint32-wrapped (i*PRIME) % n_cells scheme
    that silently skipped ~14% of cells per sweep at 3 cascades."""
    import jax

    for c in (3, 2):
        grid = occ.init_occupancy(n_cascades=c, grid_size=16)
        n_cells = c * 16**3
        n_probe = 512
        start = 7  # mid-stream window: must not depend on starting at step 0
        seen = []
        for k in range(n_cells // n_probe):
            g2 = grid._replace(ema_step=jnp.asarray(start + k, jnp.int32))
            flat, cascade, _ = occ.probe_cells(
                g2, jax.random.PRNGKey(0), n_probe
            )
            assert (np.asarray(cascade) == np.asarray(flat) // 16**3).all()
            seen.append(np.asarray(flat))
        seen = np.concatenate(seen)
        np.testing.assert_array_equal(np.sort(seen), np.arange(n_cells))
