"""Error-map importance sampling and camera-optimization subsystems."""

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine import error_map as emap
from neus2_tpu.engine.train import (
    TrainConfig,
    adjusted_cameras,
    init_train_state,
    rebuild_error_cdf,
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
        ),
        n_rays=128,
        samples_per_ray=16,
        n_candidates=48,
        occ_n_probe=1 << 10,
        **kw,
    )


def test_error_map_sampling_follows_loss():
    st = emap.init_error_map(2, res=8)
    # Put all error mass in image 1, cell (3, 5).
    st = emap.deposit(
        st,
        jnp.array([1] * 64),
        jnp.tile(jnp.array([[5.4 / 8, 3.5 / 8]]), (64, 1)),
        jnp.ones((64,)) * 10.0,
    )
    st = emap.rebuild_cdf(st)
    img, uv = emap.sample_pixels(st, jax.random.PRNGKey(0), 512, 2)
    frac_img1 = float(jnp.mean((img == 1).astype(jnp.float32)))
    assert frac_img1 > 0.7  # mass concentrated on image 1
    in_cell = (jnp.abs(uv[:, 0] * 8 - 5.9) < 1.0) & (jnp.abs(uv[:, 1] * 8 - 3.9) < 1.0)
    assert float(jnp.mean(in_cell[img == 1].astype(jnp.float32))) > 0.5


def test_error_map_rebuild_schedule():
    assert not emap.should_rebuild(64)
    assert emap.should_rebuild(128)
    assert emap.should_rebuild(192)  # 128 * 1.5
    assert not emap.should_rebuild(200)
    assert emap.should_rebuild(288)  # 192 * 1.5


def test_train_step_with_error_map_and_cam_opt():
    ds = make_sphere_dataset(n_views=4, resolution=24)
    config = _cfg(
        use_error_map=True, optimize_extrinsics=True, optimize_exposure=True
    )
    images, cameras = ds.images_device(), ds.cameras()
    state = init_train_state(jax.random.PRNGKey(0), config, n_images=4)
    from neus2_tpu.engine.train import occupancy_update

    state = occupancy_update(state, config)  # pose grads need geometry
    for _ in range(3):
        state, aux = train_step(state, images, cameras, config)
    state = rebuild_error_cdf(state)
    state, aux = train_step(state, images, cameras, config)
    assert np.isfinite(float(aux.loss))
    # error map accumulated something
    assert float(jnp.sum(state.error_map.error_map)) > 0
    # cam params moved (gradients flow through pose adjustment)
    assert float(jnp.abs(state.cam["trans"]).max()) > 0


def test_adjusted_cameras_identity_at_init():
    ds = make_sphere_dataset(n_views=3, resolution=16)
    cams = ds.cameras()
    from neus2_tpu.engine.train import init_cam_params

    cam = init_cam_params(3)
    out = adjusted_cameras(cam, cams, _cfg(optimize_extrinsics=True))
    np.testing.assert_allclose(
        np.asarray(out.poses), np.asarray(cams.poses), atol=1e-6
    )


def test_blocked_cumsum_matches_jnp():
    """blocked_cumsum == jnp.cumsum (the TPU-safe two-level CDF prefix sum),
    including non-multiple-of-block lengths."""
    import numpy as np

    from neus2_tpu.engine.error_map import blocked_cumsum

    rng = np.random.default_rng(0)
    for n in (5, 4096, 4097, 100_000):
        x = jnp.asarray(rng.random(n).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(blocked_cumsum(x, block=4096)),
            np.cumsum(np.asarray(x, np.float64)).astype(np.float32),
            rtol=2e-5,
        )


def test_focal_length_optimization():
    """Shared focal-length correction (reference optimize_focal_length,
    testbed_nerf.cu:3679-3692): identity at init, and gradients flow into
    cam['focal_ln'] when cameras carry a miscalibrated focal."""
    from neus2_tpu.engine.train import init_cam_params, occupancy_update

    ds = make_sphere_dataset(n_views=4, resolution=24)
    cams = ds.cameras()

    # exp(0) = 1: no focal change at init.
    cam0 = init_cam_params(4)
    cfg = _cfg(optimize_focal_length=True)
    out = adjusted_cameras(cam0, cams, cfg)
    np.testing.assert_allclose(np.asarray(out.focal), np.asarray(cams.focal),
                               rtol=1e-7)

    # Miscalibrate the focal by +10% and train: focal_ln must receive
    # gradient (move off zero), unlike with the flag disabled.
    bad = cams._replace(focal=cams.focal * 1.1)
    state = init_train_state(jax.random.PRNGKey(0), cfg, n_images=4)
    state = occupancy_update(state, cfg)
    images = ds.images_device()
    for _ in range(3):
        state, aux = train_step(state, images, bad, cfg)
    assert np.isfinite(float(aux.loss))
    assert float(jnp.abs(state.cam["focal_ln"]).max()) > 0

    cfg_off = _cfg()
    state2 = init_train_state(jax.random.PRNGKey(0), cfg_off, n_images=4)
    state2 = occupancy_update(state2, cfg_off)
    for _ in range(2):
        state2, _ = train_step(state2, images, bad, cfg_off)
    assert float(jnp.abs(state2.cam["focal_ln"]).max()) == 0.0
