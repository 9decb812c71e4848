"""End-to-end drive: train NeuS2-TPU on the synthetic sphere scene (CPU-able).

Run: JAX_PLATFORMS=cpu python -u tests/e2e_drive.py  (from any cwd — the
repo root is inserted on sys.path below, same as tests/_mp_worker.py).
Prints the loss curve and a final held-out-view PSNR.  This is the runtime
verification surface for the training engine (see .claude/skills/verify).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon TPU-tunnel platform overrides JAX_PLATFORMS; force the platform
# list back to cpu before any backend initializes (see utils/cpuforce.py).
from neus2_tpu.utils.cpuforce import force_cpu_if_requested

force_cpu_if_requested()

import jax.numpy as jnp
import numpy as np

from neus2_tpu.data.synthetic import make_sphere_dataset, sphere_sdf
from neus2_tpu.engine.render import RenderConfig, render_image
from neus2_tpu.engine.train import (
    TrainConfig,
    init_train_state,
    occupancy_update,
    should_update_occupancy,
    train_step,
)
from neus2_tpu.models.field import FieldConfig, sdf_fn
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.ops.image import psnr


def small_config(n_rays=512, samples=32, compute_dtype=None,
                 mask_loss_weight=0.1, hit_oversample=1) -> TrainConfig:
    # E2E_LEVELS/E2E_FEATURES: level-count vs row-width quality probes at
    # fixed table capacity (PERF.md: step cost scales with n_levels on TPU;
    # L8F2 parity, L4F4 and coarser-level/wider-row variants).
    n_levels = int(os.environ.get("E2E_LEVELS", "8"))
    n_feat = int(os.environ.get("E2E_FEATURES", "2"))
    return TrainConfig(
        field=FieldConfig(
            compute_dtype=compute_dtype,
            grid=HashGridConfig(
                n_levels=n_levels,
                n_features_per_level=n_feat,
                log2_hashmap_size=15,
                base_resolution=16,
                per_level_scale=HashGridConfig.per_level_scale_from_top(
                    16, 256, n_levels
                ),
            ),
        ),
        n_rays=n_rays,
        samples_per_ray=samples,
        n_candidates=96,
        ek_loss_weight=0.1,
        mask_loss_weight=mask_loss_weight,
        hit_oversample=hit_oversample,
    )


def main(n_steps=400, n_views=12, resolution=48, compute_dtype=None,
         mask_loss_weight=0.1, hit_oversample=1):
    ds = make_sphere_dataset(n_views=n_views + 1, resolution=resolution)
    cameras_all = ds.cameras()
    images_all = ds.images_device()
    # Hold out the last view for eval.
    from neus2_tpu.engine.rays import Cameras

    cameras = Cameras(
        poses=cameras_all.poses[:-1],
        focal=cameras_all.focal[:-1],
        principal=cameras_all.principal[:-1],
        resolution=cameras_all.resolution,
    )
    images = images_all[:-1]

    config = small_config(compute_dtype=compute_dtype,
                          mask_loss_weight=mask_loss_weight,
                          hit_oversample=hit_oversample)
    state = init_train_state(jax.random.PRNGKey(0), config, n_images=n_views)

    t0 = time.time()
    for i in range(n_steps):
        if should_update_occupancy(int(state.step)):
            state = occupancy_update(state, config)
        state, aux = train_step(state, images, cameras, config)
        if i % 50 == 0 or i == n_steps - 1:
            a = jax.device_get(aux)
            print(
                f"step {i:4d}  loss={a.loss:.5f} rgb={a.rgb_loss:.5f} "
                f"ek={a.ek_loss:.5f} mask={a.mask_loss:.5f} "
                f"valid={a.n_valid_samples} psnr~{a.psnr_proxy:.2f} "
                f"[{time.time()-t0:.1f}s]",
                flush=True,
            )

    # SDF quality vs ground truth on the shell
    d = np.random.default_rng(0).normal(size=(512, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    shell = 0.5 + 0.25 * d
    sdf, _ = sdf_fn(state.ema_params, jnp.asarray(shell, jnp.float32), config.field)
    print("mean |sdf| on GT surface:", float(jnp.abs(sdf).mean()), flush=True)

    # Held-out view PSNR
    rcfg = RenderConfig(
        field=config.field, samples_per_ray=64, n_candidates=128, chunk=1 << 12
    )
    rgb, depth, alpha = render_image(
        state.ema_params,
        state.acc,
        state.occupancy,
        cameras_all,
        cameras_all.poses[-1],
        cameras_all.focal[-1],
        cameras_all.principal[-1],
        jax.random.PRNGKey(1),
        rcfg,
        background=0.0,
    )
    # Target in sRGB on black bg.
    from neus2_tpu.ops.losses import linear_to_srgb

    tex = images_all[-1]
    a = tex[..., 3:4]
    target = jnp.where(a > 0, linear_to_srgb(tex[..., :3] / jnp.where(a > 0, a, 1.0)) * a, 0.0)
    p = psnr(rgb, target)
    print(f"held-out view PSNR: {float(p):.2f} dB", flush=True)
    return float(p), float(jnp.abs(sdf).mean())


if __name__ == "__main__":
    main()
