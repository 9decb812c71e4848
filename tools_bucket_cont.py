"""Bucket-geometry continuation A/B (the decisive quality evidence for the
adaptive_samples_factor change — PERF.md round 3).

A fresh 2000-step run never reaches the sharpness where bucket 2 engages
(occ_len ~0.11 at step 2000 vs the <=0.06 gate), so a plain factor A/B
cannot exercise the 16384 x 16 regime.  Instead: branch ONE trained state
(the factor-0.75 A/B snapshot at 2000 steps) into the three bucket
geometries — (4096,64), (8192,32), (16384,16), all 2^18 samples/step —
train each +800 steps, and compare held-out PSNR / shell |SDF|.  At the
branch point occ_len ~0.09, so bucket 2's per-ray sampling (dt ~0.0056)
is ~1.6x COARSER than at the true converged point (occ ~0.054,
dt ~0.0034): if quality holds here it holds there a fortiori.

Usage: python tools_bucket_cont.py BUCKET [EXTRA=800]   (BUCKET in 0/1/2/3;
bucket 3 = 32768 x 8 is the round-4 candidate regime, VERDICT r3 task 9)
  BC_BASE overrides the branch-point snapshot (default the factor-0.75
  sphere A/B state; /tmp wipes between rounds may leave only the
  compact_ab x1 snapshot — same scene/model, factor 0.45).
Resumable; writes /tmp/bucket_cont_b{B}.json.
"""

import dataclasses
import json
import os
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import jax.numpy as jnp

from bench import flagship_config
from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.models.field import sdf_fn
from neus2_tpu.ops.image import psnr, srgb_eval_target, ssim

BUCKET = int(sys.argv[1]) if len(sys.argv) > 1 else 0
EXTRA = int(sys.argv[2]) if len(sys.argv) > 2 else 800
BASE = Path(os.environ.get("BC_BASE", "/tmp/bucket_ab_f0p75.msgpack"))  # 2000-step base
SNAP = Path(f"/tmp/bucket_cont_b{BUCKET}.msgpack")
META = Path(f"/tmp/bucket_cont_b{BUCKET}.json")


def main():
    base_cfg = flagship_config()
    config = dataclasses.replace(
        base_cfg,
        n_rays=base_cfg.n_rays << BUCKET,
        samples_per_ray=base_cfg.samples_per_ray >> BUCKET,
        adaptive_batch=False,
    )
    target = 2000 + EXTRA
    train_ds = make_sphere_dataset(n_views=16, resolution=256)
    eval_ds = make_sphere_dataset(n_views=20, resolution=256)
    eval_ids = [3, 9, 14, 17]

    tb = Testbed(
        config=config, hyper=Hyperparams(first_frame_max_training_step=target)
    )
    tb.load_training_data_from_datasets([train_ds])
    src = SNAP if SNAP.exists() else BASE
    tb.load_snapshot(src)
    print(f"resumed from {src} at step {tb.training_step}", flush=True)

    t0 = time.time()
    budget_s = float(os.environ.get("AB_BUDGET_S", "420"))
    while tb.training_step < target and time.time() - t0 < budget_s:
        tb.train()
        if tb.training_step % 200 == 0:
            print(
                f"step {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"[{time.time()-t0:.0f}s]",
                flush=True,
            )
    tb.save_snapshot(SNAP)
    print(f"paused/finished at step {tb.training_step}", flush=True)
    if tb.training_step < target:
        return

    from neus2_tpu.engine.render import RenderConfig, render_image

    cams = eval_ds.cameras()
    imgs = jnp.asarray(eval_ds.images)
    rcfg = RenderConfig(
        field=config.field, samples_per_ray=128, n_candidates=256, chunk=1 << 13
    )
    psnrs, ssims = [], []
    for k in eval_ids:
        rgb, _, _ = render_image(
            tb.state.ema_params, tb.state.acc, tb.state.occupancy,
            cams, cams.poses[k], cams.focal[k], cams.principal[k],
            jax.random.PRNGKey(k), rcfg, background=0.0, spp=8,
        )
        t = srgb_eval_target(imgs[k])
        psnrs.append(float(psnr(jnp.asarray(rgb), t)))
        ssims.append(float(ssim(jnp.asarray(rgb), t)))

    d = np.random.default_rng(0).normal(size=(2048, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    shell = jnp.asarray(
        np.float32(0.5) + np.float32(0.25) * d.astype(np.float32)
    )
    sdf, _ = sdf_fn(tb.state.ema_params, shell, config.field)
    out = {
        "bucket": BUCKET,
        "rays": config.n_rays,
        "samples": config.samples_per_ray,
        "steps": tb.training_step,
        "held_out_psnr": float(np.mean(psnrs)),
        "held_out_ssim": float(np.mean(ssims)),
        "per_view_psnr": psnrs,
        "shell_sdf_err": float(jnp.abs(sdf).mean()),
    }
    META.write_text(json.dumps(out))
    print("DONE", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
