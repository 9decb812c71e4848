"""End-to-end training smoke test on the synthetic sphere scene (CPU).

This is the test-pyramid tier the reference lacks entirely (SURVEY.md §4):
train the full pipeline and assert the recovered SDF approaches the known
ground-truth sphere and a held-out view renders with decent PSNR.
"""

import sys
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine.train import (
    TrainConfig,
    init_train_state,
    train_step,
)
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig


@pytest.mark.slow
def test_training_converges_on_sphere():
    from e2e_drive import main

    psnr, sdf_err = main(n_steps=400, n_views=12, resolution=48)
    # e2e_drive reference run: PSNR ~28.3, sdf_err ~0.0034.
    assert psnr > 24.0
    assert sdf_err < 0.02


def test_train_step_is_deterministic():
    ds = make_sphere_dataset(n_views=4, resolution=24)
    config = TrainConfig(
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
    )
    images = ds.images_device()
    cameras = ds.cameras()
    s0 = init_train_state(jax.random.PRNGKey(0), config, n_images=4)
    s1 = init_train_state(jax.random.PRNGKey(0), config, n_images=4)
    for _ in range(2):
        s0, a0 = train_step(s0, images, cameras, config)
        s1, a1 = train_step(s1, images, cameras, config)
    assert float(a0.loss) == float(a1.loss)
    np.testing.assert_array_equal(
        np.asarray(s0.params["variance"]), np.asarray(s1.params["variance"])
    )


@pytest.mark.slow
def test_bf16_compute_quality_parity():
    """bf16 MLP compute (fp32 master params, no loss scaling — the
    reference's fp16 scheme, trainer.h:79-88): held-out PSNR within 0.3 dB
    of fp32 (VERDICT round 1, item 4)."""
    import jax.numpy as jnp

    from e2e_drive import main

    p32, sdf32 = main(n_steps=300)
    p16, sdf16 = main(n_steps=300, compute_dtype=jnp.bfloat16)
    assert np.isfinite(p16)
    assert p16 > p32 - 0.3, (p16, p32)
    assert sdf16 < 2.0 * sdf32 + 1e-3, (sdf16, sdf32)
