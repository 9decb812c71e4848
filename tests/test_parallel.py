"""Data-parallel training on the virtual 8-device CPU mesh (SURVEY §4.4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine.train import TrainConfig, init_train_state, occupancy_update
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.parallel.train import make_mesh, parallel_train_step, replicate_state


def _setup(n_rays_per_device=64):
    config = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=4, log2_hashmap_size=12, base_resolution=8,
                per_level_scale=1.6,
            ),
            sdf_hidden_dim=32,
            rgb_hidden_dim=32,
        ),
        n_rays=n_rays_per_device,
        samples_per_ray=16,
        n_candidates=48,
        occ_n_probe=1 << 12,
        mask_loss_weight=0.1,
    )
    ds = make_sphere_dataset(n_views=6, resolution=32)
    return config, ds.images_device(), ds.cameras()


@pytest.fixture(scope="module")
def mesh8():
    devices = jax.devices("cpu")
    if len(devices) < 8:
        pytest.skip("needs 8 virtual CPU devices")
    return make_mesh(devices[:8])


def test_parallel_training_decreases_loss(mesh8):
    config, images, cameras = _setup()
    state = init_train_state(jax.random.PRNGKey(0), config, n_images=6)
    state = replicate_state(state, mesh8)
    losses = []
    for _ in range(60):
        state = occupancy_update(state, config)
        state, aux = parallel_train_step(state, images, cameras, config, mesh8)
        losses.append(float(aux.loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < 0.6 * np.mean(losses[:5])


def test_parallel_state_stays_replicated(mesh8):
    config, images, cameras = _setup()
    state = init_train_state(jax.random.PRNGKey(1), config, n_images=6)
    state = replicate_state(state, mesh8)
    state, _ = parallel_train_step(state, images, cameras, config, mesh8)
    # Params must remain identical across devices after an update (psum'd
    # grads + replicated optimizer math).
    table0 = state.params["hashgrid"][0]
    shards = [np.asarray(s.data) for s in table0.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_parallel_delta_phase(mesh8):
    config, images, cameras = _setup()
    state = init_train_state(jax.random.PRNGKey(2), config, n_images=6)
    state = replicate_state(state, mesh8)
    state = occupancy_update(state, config)
    state, aux = parallel_train_step(
        state, images, cameras, config, mesh8,
        train_canonical=False, train_delta=True, use_delta=True,
    )
    assert np.isfinite(float(aux.loss))
    # delta moved, canonical params did not.
    assert float(jnp.abs(state.delta["transition"]).max()) > 0


def test_testbed_multichip_static(mesh8):
    """Product integration (VERDICT round 1): Testbed.enable_multichip drives
    parallel_train_step and converges like the single-device path."""
    from neus2_tpu.api.testbed import Hyperparams, Testbed
    from neus2_tpu.data.synthetic import make_sphere_dataset as mk

    config, _, _ = _setup(n_rays_per_device=64)
    config = __import__("dataclasses").replace(config, n_rays=512)
    tb = Testbed(config=config, hyper=Hyperparams(first_frame_max_training_step=60))
    n = tb.enable_multichip(jax.devices("cpu")[:8])
    assert n == 8
    tb.load_training_data_from_datasets([mk(n_views=6, resolution=32)])
    first = None
    while tb.frame():
        if first is None and tb.loss_scalar == tb.loss_scalar:
            first = tb.loss_scalar
    assert np.isfinite(tb.loss_scalar)
    assert tb.loss_scalar < first


def test_testbed_multichip_dynamic(mesh8):
    """Dynamic state machine (pose refinement + finetune) on the mesh."""
    from neus2_tpu.api.testbed import Hyperparams, Testbed
    from neus2_tpu.data.synthetic import make_moving_sphere_frames

    config, _, _ = _setup(n_rays_per_device=48)
    config = __import__("dataclasses").replace(config, n_rays=384, delta_n_rays=256)
    tb = Testbed(
        config=config,
        hyper=Hyperparams(
            first_frame_max_training_step=40,
            next_frame_max_training_step=30,
            predict_global_movement=True,
            predict_global_movement_training_step=10,
        ),
    )
    tb.enable_multichip(jax.devices("cpu")[:8])
    tb.load_training_data_from_datasets(
        make_moving_sphere_frames(n_frames=2, n_views=6, resolution=32)
    )
    while tb.frame():
        pass
    assert tb.current_training_time_frame == 1
    assert np.isfinite(tb.loss_scalar)
