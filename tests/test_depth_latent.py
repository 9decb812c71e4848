"""Depth supervision and per-image latent codes."""

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.data.synthetic import make_sphere_dataset, ray_sphere, SPHERE_CENTER, SPHERE_RADIUS
from neus2_tpu.engine.train import (
    TrainConfig,
    init_train_state,
    occupancy_update,
    train_step,
)
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig


def _cfg(**kw):
    return TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=4, log2_hashmap_size=12, base_resolution=8,
                per_level_scale=1.6,
            ),
            sdf_hidden_dim=32,
            rgb_hidden_dim=32,
            **kw.pop("field_kw", {}),
        ),
        n_rays=128,
        samples_per_ray=16,
        n_candidates=48,
        occ_n_probe=1 << 10,
        **kw,
    )


def _gt_depths(ds):
    """Analytic depth maps for the synthetic sphere dataset."""
    from neus2_tpu.engine.rays import rays_for_image

    cams = ds.cameras()
    w, h = cams.resolution
    depths = []
    for i in range(ds.n_images):
        o, d = rays_for_image(cams, i)
        hit, t = ray_sphere(np.asarray(o), np.asarray(d), SPHERE_CENTER, SPHERE_RADIUS)
        depths.append(np.where(hit, t, 0.0).reshape(h, w))
    return jnp.asarray(np.stack(depths), jnp.float32)


def test_depth_supervision_runs_and_contributes():
    ds = make_sphere_dataset(n_views=4, resolution=24)
    config = _cfg(depth_supervision_lambda=0.5)
    images, cameras = ds.images_device(), ds.cameras()
    depths = _gt_depths(ds)
    state = init_train_state(jax.random.PRNGKey(0), config, n_images=4)
    state = occupancy_update(state, config)
    losses = []
    for _ in range(5):
        state, aux = train_step(state, images, cameras, config, depths=depths)
        losses.append(float(aux.loss))
    assert all(np.isfinite(losses))
    # With lambda=0 the loss value differs (depth term really contributes).
    cfg0 = _cfg(depth_supervision_lambda=0.0)
    s0 = init_train_state(jax.random.PRNGKey(0), cfg0, n_images=4)
    s0 = occupancy_update(s0, cfg0)
    _, aux0 = train_step(s0, images, cameras, cfg0)
    assert abs(float(aux0.loss) - losses[0]) > 1e-7


def test_latent_codes_train():
    ds = make_sphere_dataset(n_views=4, resolution=24)
    config = _cfg(field_kw={"latent_dim": 4})
    images, cameras = ds.images_device(), ds.cameras()
    state = init_train_state(jax.random.PRNGKey(0), config, n_images=4)
    assert state.cam["latent"].shape == (4, 4)
    state = occupancy_update(state, config)
    for _ in range(3):
        state, aux = train_step(state, images, cameras, config)
    assert np.isfinite(float(aux.loss))
    # Latents receive gradients once geometry exists.
    assert float(jnp.abs(state.cam["latent"]).max()) > 0


def test_residual_grid_freeze():
    from neus2_tpu.models.field import (
        effective_grid_tables,
        freeze_grid_into_base,
        init_field,
        sdf_fn,
    )

    cfg = _cfg(field_kw={}).field
    import dataclasses

    cfg = dataclasses.replace(cfg, residual_grid=True)
    params = init_field(jax.random.PRNGKey(0), cfg)
    assert "hashgrid_base" in params
    x = jax.random.uniform(jax.random.PRNGKey(1), (16, 3))
    s0, _ = sdf_fn(params, x, cfg)
    # Freezing must not change the effective field.
    frozen = freeze_grid_into_base(params)
    s1, _ = sdf_fn(frozen, x, cfg)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-6)
    assert float(jnp.abs(jnp.concatenate([t.ravel() for t in frozen["hashgrid"]])).max()) == 0.0
    # Gradients flow to the residual, not the base.
    def loss(p):
        s, _ = sdf_fn(p, x, cfg)
        return jnp.sum(s**2)
    g = jax.grad(loss)(frozen)
    assert sum(float(jnp.abs(t).sum()) for t in g["hashgrid"]) > 0
    assert sum(float(jnp.abs(t).sum()) for t in g["hashgrid_base"]) == 0
