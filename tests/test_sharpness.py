"""Sharpness-weighted error-map deposits (include_sharpness_in_error).

Reference: compute_sharpness at dataset load (nerf_loader.cu:129-178),
the 0.95/step-decayed 3-D sharpness grid + atomicMax + the
max(sharp/grid_sharp, 0.01) deposit weight (testbed_nerf.cu:1748-1756,
3448-3459); default OFF (testbed.h:638).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.engine.error_map import sharpness_weight_and_update
from neus2_tpu.ops.image import sharpness_maps


def test_weight_and_update_semantics():
    grid = jnp.asarray([1.0, 0.5, 0.0, 2.0], jnp.float32)
    cells = jnp.asarray([0, 0, 1, 2], jnp.int32)
    sharp = jnp.asarray([0.2, 3.0, 0.001, 0.4], jnp.float32)
    valid = jnp.asarray([True, True, True, False])
    w, g = sharpness_weight_and_update(grid, cells, sharp, valid, decay=0.9)
    w, g = np.asarray(w), np.asarray(g)
    # decayed grid: [0.9, 0.45, 0, 1.8]; cell 0 keeps max(0.9, 0.2, 3.0)
    # = 3.0; cell 1 keeps its decayed 0.45 (> the 0.001 observation);
    # cell 2 untouched (invalid ray), cell 3 untouched.
    np.testing.assert_allclose(g, [3.0, 0.45, 0.0, 1.8], atol=1e-7)
    # ray 0: blurry vs the grid's decayed 0.9 -> 0.2/0.9
    assert abs(w[0] - 0.2 / 0.9) < 1e-6
    # ray 1: the sharpest observation of its cell -> weight 1
    assert abs(w[1] - 1.0) < 1e-6
    # ray 2: very blurry vs the cell's decayed 0.45 -> floors at 0.01
    assert abs(w[2] - 0.01) < 1e-6
    # ray 3: invalid -> weight exactly 1, no deposit
    assert w[3] == 1.0
    # floor: very blurry against a sharp grid clamps at 0.01
    w2, _ = sharpness_weight_and_update(
        jnp.asarray([100.0]), jnp.asarray([0]), jnp.asarray([1e-4]),
        jnp.asarray([True]), decay=1.0,
    )
    assert abs(float(w2[0]) - 0.01) < 1e-9


def test_sharpness_maps_match_reference_rule():
    """Integral-image implementation == direct per-cell loop of the
    reference's variance-of-Laplacian rule (nerf_loader.cu:144-169)."""
    rng = np.random.default_rng(0)
    img = rng.uniform(size=(1, 21, 33, 4)).astype(np.float32)
    rw, rh = 5, 3
    got = sharpness_maps(img, (rw, rh))
    lum = (
        img[0, ..., 0] * 0.2126
        + img[0, ..., 1] * 0.7152
        + img[0, ..., 2] * 0.0722
    )
    h, w = lum.shape
    for y in range(rh):
        for x in range(rw):
            x1, x2 = max(x * w // rw, 1), min((x + 1) * w // rw, w - 2)
            y1, y2 = max(y * h // rh, 1), min((y + 1) * h // rh, h - 2)
            laps = [
                4 * lum[yy, xx] - lum[yy - 1, xx] - lum[yy + 1, xx]
                - lum[yy, xx - 1] - lum[yy, xx + 1]
                for yy in range(y1, y2) for xx in range(x1, x2)
            ]
            want = float(np.var(np.asarray(laps))) if laps else 0.0
            assert abs(float(got[0, y, x]) - want) < 1e-5


def test_testbed_integration_smoke():
    """The flag trains end-to-end: sharpness maps attach to cameras, the
    grid fills at hit cells, and deposits still flow to the error map."""
    from neus2_tpu.api.testbed import Hyperparams, Testbed
    from neus2_tpu.data.synthetic import make_sphere_dataset
    from neus2_tpu.engine.train import TrainConfig
    from neus2_tpu.models.field import FieldConfig
    from neus2_tpu.ops.hashgrid import HashGridConfig

    cfg = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(n_levels=3, log2_hashmap_size=10,
                                base_resolution=8, per_level_scale=1.5),
            sdf_hidden_dim=16, rgb_hidden_dim=16,
        ),
        n_rays=128, samples_per_ray=8, n_candidates=16, occ_n_probe=1 << 10,
        use_error_map=True,
        include_sharpness_in_error=True,
        mask_loss_weight=0.1,
    )
    tb = Testbed(config=cfg, hyper=Hyperparams(first_frame_max_training_step=20))
    tb.load_training_data_from_datasets(
        [make_sphere_dataset(n_views=3, resolution=32)]
    )
    assert tb.cameras.sharpness is not None
    assert tb.cameras.sharpness.shape[0] == 3
    for _ in range(12):
        tb.train()
    em = tb.state.error_map
    assert em.sharpness_grid is not None
    assert float(jnp.max(em.sharpness_grid)) > 0.0  # hit cells recorded
    assert float(jnp.sum(em.error_map)) > 0.0  # deposits still flow
    # flag OFF keeps the default pytree (None leaf — HLO unchanged claim)
    cfg_off = dataclasses.replace(cfg, include_sharpness_in_error=False)
    tb2 = Testbed(config=cfg_off,
                  hyper=Hyperparams(first_frame_max_training_step=5))
    tb2.load_training_data_from_datasets(
        [make_sphere_dataset(n_views=2, resolution=24)]
    )
    assert tb2.state.error_map.sharpness_grid is None
    assert tb2.cameras.sharpness is None


def test_multichip_sharpness_grid_updates():
    """Under shard_map the per-shard sharpness grids are pmax-combined and
    written back replicated (parallel/train.py) — not concatenated by the
    extras' P('data') spec."""
    import jax

    from neus2_tpu.api.testbed import Hyperparams, Testbed
    from neus2_tpu.data.synthetic import make_sphere_dataset
    from neus2_tpu.engine.train import TrainConfig
    from neus2_tpu.models.field import FieldConfig
    from neus2_tpu.ops.hashgrid import HashGridConfig

    cfg = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(n_levels=3, log2_hashmap_size=10,
                                base_resolution=8, per_level_scale=1.5),
            sdf_hidden_dim=16, rgb_hidden_dim=16,
        ),
        n_rays=64, samples_per_ray=8, n_candidates=16, occ_n_probe=1 << 10,
        use_error_map=True,
        include_sharpness_in_error=True,
        mask_loss_weight=0.1,
    )
    tb = Testbed(config=cfg, hyper=Hyperparams(first_frame_max_training_step=10))
    tb.load_training_data_from_datasets(
        [make_sphere_dataset(n_views=2, resolution=24)]
    )
    assert tb.enable_multichip() == len(jax.devices("cpu"))
    for _ in range(6):
        tb.train()
    sg = tb.state.error_map.sharpness_grid
    assert sg is not None
    import numpy as np

    arr = np.asarray(jax.device_get(sg))
    # grid shape preserved (no shard concatenation) and hit cells recorded
    assert arr.shape == (cfg.occ_cascades * 128**3,)
    assert np.isfinite(arr).all() and arr.max() > 0.0
