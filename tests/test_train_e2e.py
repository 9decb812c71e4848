"""End-to-end training smoke test on the synthetic sphere scene (CPU).

This is the test-pyramid tier the reference lacks entirely (SURVEY.md §4):
train the full pipeline for a short budget and assert the loss decreases and
the SDF approaches the known ground-truth sphere.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine.train import (
    TrainConfig,
    init_train_state,
    occupancy_update,
    should_update_occupancy,
    train_step,
)
from neus2_tpu.models.field import FieldConfig, sdf_fn
from neus2_tpu.ops.hashgrid import HashGridConfig


@pytest.fixture(scope="module")
def tiny_setup():
    ds = make_sphere_dataset(n_views=8, resolution=32)
    config = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=6, log2_hashmap_size=13, base_resolution=16,
                per_level_scale=1.61,
            ),
            sdf_hidden_dim=32,
            rgb_hidden_dim=32,
        ),
        n_rays=256,
        samples_per_ray=24,
        n_candidates=64,
        ek_loss_weight=0.1,
        mask_loss_weight=0.1,
        occ_n_probe=1 << 12,
    )
    return ds, config


def test_training_converges_on_sphere(tiny_setup):
    ds, config = tiny_setup
    images = ds.images_device()
    cameras = ds.cameras()
    state = init_train_state(jax.random.PRNGKey(0), config)

    first_losses, last_losses = [], []
    n_steps = 150
    for i in range(n_steps):
        if should_update_occupancy(int(state.step)):
            state = occupancy_update(state, config)
        state, aux = train_step(state, images, cameras, config)
        if i < 10:
            first_losses.append(float(aux.loss))
        if i >= n_steps - 10:
            last_losses.append(float(aux.loss))

    # Total loss (dominated by the mask term early) must drop substantially.
    assert np.mean(last_losses) < 0.5 * np.mean(first_losses)

    # The SDF zero level set should be near the GT sphere of radius 0.25.
    d = np.random.default_rng(0).normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    shell = jnp.asarray(0.5 + 0.25 * d, jnp.float32)
    sdf, _ = sdf_fn(state.ema_params, shell, config.field)
    assert float(jnp.abs(sdf).mean()) < 0.06

    # Occupancy grid has become selective but not empty.
    frac = float(state.occupancy.bitfield.mean())
    assert 0.001 < frac < 0.5


def test_train_step_is_deterministic(tiny_setup):
    ds, config = tiny_setup
    images = ds.images_device()
    cameras = ds.cameras()
    s0 = init_train_state(jax.random.PRNGKey(0), config)
    s1 = init_train_state(jax.random.PRNGKey(0), config)
    # Donation invalidates inputs; run two fresh chains two steps each.
    for _ in range(2):
        s0, a0 = train_step(s0, images, cameras, config)
        s1, a1 = train_step(s1, images, cameras, config)
    assert float(a0.loss) == float(a1.loss)
    np.testing.assert_array_equal(
        np.asarray(s0.params["variance"]), np.asarray(s1.params["variance"])
    )
