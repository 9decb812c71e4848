"""Re-evaluate a finished CSG validation snapshot with adjustable render
settings — separates model quality from eval-time sampling error.

Usage: python tools_csg_eval.py <snapshot.msgpack> [samples_per_ray] [spp]
Env: CSG_VIEWS / CSG_EVAL_VIEWS / CSG_RES / CSG_CONFIG as in
tools_tpu_validate_csg.py (must match the training run's protocol).
"""

import os
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")

import jax.numpy as jnp
import numpy as np

from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_csg_dataset
from neus2_tpu.engine.render import RenderConfig, render_image
from neus2_tpu.ops.image import psnr, srgb_eval_target, ssim


def main():
    snap = sys.argv[1]
    samples = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_train = int(os.environ.get("CSG_VIEWS", "48"))
    n_eval = int(os.environ.get("CSG_EVAL_VIEWS", "2"))
    res = int(os.environ.get("CSG_RES", "256"))

    ds = make_csg_dataset(n_views=n_train + n_eval, resolution=res)
    cams = ds.cameras()
    imgs = jnp.asarray(ds.images)

    # Mirror the validator's config construction.
    import dataclasses

    from neus2_tpu.engine.train import TrainConfig
    from neus2_tpu.models.field import FieldConfig
    from neus2_tpu.utils.variants import flagship_grid

    grid = flagship_grid(os.environ.get("CSG_CONFIG", "") or "parity")
    config = TrainConfig(field=FieldConfig(grid=grid), n_rays=4096,
                         samples_per_ray=64, n_candidates=256,
                         ek_loss_weight=0.1, mask_loss_weight=0.1)

    tb = Testbed(config=config, hyper=Hyperparams())
    tb.load_training_data_from_datasets([
        dataclasses.replace(
            ds, images=ds.images[:n_train], poses=ds.poses[:n_train],
            focal=ds.focal[:n_train], principal=ds.principal[:n_train],
        )
    ])
    tb.load_snapshot(snap)
    print(f"snapshot at step {tb.training_step}", flush=True)

    rcfg = RenderConfig(field=config.field, samples_per_ray=samples,
                        n_candidates=max(256, samples * 2), chunk=1 << 13)
    ps, ss = [], []
    for k in range(n_train, n_train + n_eval):
        rgb, _, _ = render_image(
            tb.state.ema_params, tb.state.acc, tb.state.occupancy,
            cams, cams.poses[k], cams.focal[k], cams.principal[k],
            jax.random.PRNGKey(k), rcfg, background=0.0, spp=spp,
        )
        target = srgb_eval_target(imgs[k])
        p, s = float(psnr(jnp.asarray(rgb), target)), float(ssim(jnp.asarray(rgb), target))
        ps.append(p); ss.append(s)
        print(f"view {k}: PSNR {p:.2f} SSIM {s:.4f} "
              f"(samples={samples}, spp={spp})", flush=True)
    print(f"mean PSNR {np.mean(ps):.2f} dB  SSIM {np.mean(ss):.4f}", flush=True)


if __name__ == "__main__":
    main()
