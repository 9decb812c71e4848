"""Hit-ray compaction in the renderer (engine/render.py probe_hit_rays).

The fixed-shape analog of the reference's alive-ray compaction rounds
(reference: src/testbed_nerf.cu:2479-2595): one occupancy-march probe + one
host sync picks the rays that can contribute; the field is evaluated only for
those.  Exactness contract: a ray whose probe total is zero marches
mask-all-False samples and composites to exactly zero, so skipping it cannot
change the image.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine import occupancy as occ_mod
from neus2_tpu.engine.rays import pixel_to_ray
from neus2_tpu.engine.render import (
    RenderConfig,
    probe_hit_rays,
    render_image,
    render_rays,
)
from neus2_tpu.engine.train import TrainConfig, init_train_state
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.ops.losses import linear_to_srgb


@pytest.fixture(scope="module")
def setup():
    cfg = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=4,
                log2_hashmap_size=12,
                base_resolution=16,
                per_level_scale=1.5,
            )
        ),
        n_rays=256,
        samples_per_ray=16,
        n_candidates=64,
    )
    ds = make_sphere_dataset(n_views=4, resolution=32)
    cams = ds.cameras()
    state = init_train_state(jax.random.PRNGKey(0), cfg, n_images=4)
    # Occupancy: a small off-center ball, so most view rays miss.
    occ = state.occupancy
    res = occ.density.shape[-1]
    g = (jnp.arange(res) + 0.5) / res
    X, Y, Z = jnp.meshgrid(g, g, g, indexing="ij")
    ball = (
        jnp.sqrt((X - 0.5) ** 2 + (Y - 0.52) ** 2 + (Z - 0.47) ** 2) < 0.15
    ).astype(occ.density.dtype)
    occ = occ_mod.update_bitfield(occ._replace(density=ball[None]))

    rcfg = RenderConfig(
        field=cfg.field, samples_per_ray=16, n_candidates=64, chunk=256
    )
    u = (jnp.arange(32) + 0.5) / 32
    uu, vv = jnp.meshgrid(u, u)
    uv = jnp.stack([uu.ravel(), vv.ravel()], -1)
    o, d = pixel_to_ray(cams, jnp.zeros((uv.shape[0],), jnp.int32), uv)
    return cfg, cams, state, occ, rcfg, o, d


def test_compact_render_exact(setup):
    cfg, cams, state, occ, rcfg, o, d = setup
    hit = probe_hit_rays(state.acc, occ, o, d, rcfg)
    assert 0 < hit.size < o.shape[0]  # the scene forces real misses

    key = jax.random.PRNGKey(2)
    full = render_rays(
        state.ema_params, state.acc, occ, o, d, key, rcfg, jitter=False
    )
    comp = render_rays(
        state.ema_params,
        state.acc,
        occ,
        o,
        d,
        key,
        rcfg,
        jitter=False,
        compact=True,
    )
    miss = np.setdiff1d(np.arange(o.shape[0]), hit)
    for f, c in zip(full, comp):
        # Hit rays identical; misses exactly zero in BOTH paths.
        np.testing.assert_array_equal(np.asarray(f[hit]), np.asarray(c[hit]))
        assert float(jnp.abs(jnp.asarray(f)[miss]).max()) == 0.0
        assert float(jnp.abs(jnp.asarray(c)[miss]).max()) == 0.0


def test_render_image_empty_occupancy_is_background(setup):
    cfg, cams, state, occ, rcfg, o, d = setup
    empty = occ_mod.reset_density(state.occupancy)
    img, depth, alpha = render_image(
        state.ema_params,
        state.acc,
        empty,
        cams,
        cams.poses[0],
        cams.focal[0],
        cams.principal[0],
        jax.random.PRNGKey(1),
        rcfg,
        background=0.2,
        spp=2,
    )
    assert float(jnp.abs(alpha).max()) == 0.0
    np.testing.assert_allclose(
        np.asarray(img), float(linear_to_srgb(jnp.asarray(0.2))), atol=1e-6
    )


def test_compact_render_exact_with_jitter(setup):
    """The exactness contract must hold for jittered (multi-spp) renders
    too: candidate probes are deterministic (probe_jitter=False) even when
    sample placement is jittered, so a probe-miss ray composites to exactly
    zero no matter the key."""
    cfg, cams, state, occ, rcfg, o, d = setup
    hit = probe_hit_rays(state.acc, occ, o, d, rcfg)
    miss = np.setdiff1d(np.arange(o.shape[0]), hit)
    for k in range(3):
        full = render_rays(
            state.ema_params, state.acc, occ, o, d,
            jax.random.PRNGKey(100 + k), rcfg, jitter=True,
        )
        for f in full:
            assert float(jnp.abs(jnp.asarray(f)[miss]).max()) == 0.0
        # and hit rays render nonzero somewhere (the probe is not vacuous)
        assert float(jnp.abs(jnp.asarray(full[2])[hit]).max()) > 0.0


def test_render_image_envmap_background(setup):
    """An envmap-trained model's eval render must reproduce the learned
    background (reference init_rays_from_camera backgrounds render rays with
    the envmap, testbed_nerf.cu:2298-2299) — both on probe-miss rays (the
    compaction fill) and behind semi-transparent hits."""
    cfg, cams, state, occ, rcfg, o, d = setup
    # Opaque constant-color envmap: background' = env.rgb everywhere.
    env = jnp.zeros((8, 16, 4)).at[..., 0].set(0.5).at[..., 3].set(1.0)
    img, depth, alpha = render_image(
        state.ema_params,
        state.acc,
        occ_mod.reset_density(state.occupancy),  # all rays miss
        cams,
        cams.poses[0],
        cams.focal[0],
        cams.principal[0],
        jax.random.PRNGKey(1),
        rcfg,
        background=0.2,
        spp=2,
        envmap=env,
    )
    assert float(jnp.abs(alpha).max()) == 0.0
    expect = np.array([float(linear_to_srgb(jnp.asarray(0.5))), 0.0, 0.0])
    np.testing.assert_allclose(
        np.asarray(img), np.broadcast_to(expect, img.shape), atol=1e-6
    )
    # With the occupied ball: hit rays composite the envmap behind the
    # field exactly like the training loss does (bg' per ray).
    img2, _, alpha2 = render_image(
        state.ema_params, state.acc, occ, cams,
        cams.poses[0], cams.focal[0], cams.principal[0],
        jax.random.PRNGKey(1), rcfg, background=0.2, spp=1, envmap=env,
    )
    a2 = np.asarray(alpha2).ravel()
    i2 = np.asarray(img2).reshape(-1, 3)
    miss = a2 == 0.0
    np.testing.assert_allclose(
        i2[miss], np.broadcast_to(expect, i2[miss].shape), atol=1e-6
    )


def test_render_image_learned_distortion(setup):
    """The learned distortion grid must warp render-time ray generation
    exactly as training ray-gen does (testbed_nerf.cu:2208-2331): a zero
    grid is a no-op, a nonzero grid moves the silhouette."""
    from neus2_tpu.ops.envmap import init_distortion

    cfg, cams, state, occ, rcfg, o, d = setup

    def alpha_img(dist):
        _, _, a = render_image(
            state.ema_params, state.acc, occ, cams,
            cams.poses[0], cams.focal[0], cams.principal[0],
            jax.random.PRNGKey(0), rcfg, spp=1, distortion=dist,
        )
        return np.asarray(a)

    base = alpha_img(None)
    zero = alpha_img(init_distortion((8, 8)))
    np.testing.assert_array_equal(base, zero)
    shifted = alpha_img(init_distortion((8, 8)) + jnp.array([0.06, 0.0]))
    assert not np.allclose(base, shifted)


def test_render_image_exposure_tonemap(setup):
    """Render-buffer output controls (render_buffer.cu:313-332): exposure
    scales linear radiance before the curve; identity+0 is a no-op."""
    cfg, cams, state, occ, rcfg, o, d = setup
    common = dict(background=0.1, spp=1)
    args = (
        state.ema_params, state.acc, occ, cams,
        cams.poses[0], cams.focal[0], cams.principal[0],
        jax.random.PRNGKey(2), rcfg,
    )
    base, _, _ = render_image(*args, **common)
    same, _, _ = render_image(*args, **common, exposure=0.0, tonemap="identity")
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    brighter, _, _ = render_image(*args, **common, exposure=1.0)
    b0, b1 = np.asarray(base), np.asarray(brighter)
    assert (b1 >= b0 - 1e-6).all() and b1.mean() > b0.mean()
    for curve in ("aces", "hable", "reinhard"):
        t, _, _ = render_image(*args, **common, tonemap=curve)
        t = np.asarray(t)
        assert np.isfinite(t).all() and t.min() >= 0.0 and t.max() <= 1.0
