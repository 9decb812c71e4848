"""Hit-ray batch compaction quality A/B (VERDICT r3 missing #2 / task 3).

Trains the EXACT bench flagship config (bf16 L14/F2, adaptive buckets on,
Testbed product loop) end-to-end with hit_oversample in {1, 2} and reports
held-out PSNR/SSIM, shell |SDF| error, mean contributing-sample fraction,
and WALL TIME per step (the compaction adds a candidate probe; the claim to
verify is better quality per wall-second, reference compacted-batch
semantics testbed_nerf.cu:3434-3435, 3922-3930).

Usage: python tools_compact_ab.py OVERSAMPLE [TARGET=2000]
  CAB_SCENE=csg for the hard-scene variant (24 views @256^2).
  CAB_SEED=n for seed replicates (round-5 SSIM noise-vs-systematic check).
Resumable in tunnel-window chunks (snapshot keyed by oversample+scene+seed).
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
from neus2_tpu.data.synthetic import SCENES, make_csg_dataset, make_sphere_dataset, sphere_sdf
from neus2_tpu.models.field import sdf_fn
from neus2_tpu.ops.image import psnr, srgb_eval_target, ssim

OVERSAMPLE = int(sys.argv[1]) if len(sys.argv) > 1 else 1
TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
SCENE = os.environ.get("CAB_SCENE", "sphere")
SEED = int(os.environ.get("CAB_SEED", "0"))
TAG = f"x{OVERSAMPLE}_{SCENE}" + (f"_s{SEED}" if SEED else "")
SNAP = Path(f"/tmp/compact_ab_{TAG}.msgpack")
META = Path(f"/tmp/compact_ab_{TAG}.json")


def main():
    config = dataclasses.replace(flagship_config(), hit_oversample=OVERSAMPLE)
    if SCENE == "sphere":
        train_ds = make_sphere_dataset(n_views=16, resolution=256)
        eval_ds = make_sphere_dataset(n_views=20, resolution=256)
        eval_ids = [3, 9, 14, 17]
        gt_sdf = None  # analytic sphere below
    else:
        sdf, albedo = SCENES[SCENE]
        full = make_csg_dataset(n_views=26, resolution=256, sdf=sdf, albedo=albedo)
        train_ds = full.subset(slice(0, 24))
        eval_ds = full
        eval_ids = [24, 25]
        gt_sdf = sdf
        config = dataclasses.replace(config, mask_loss_weight=0.1)

    tb = Testbed(
        config=config,
        hyper=Hyperparams(first_frame_max_training_step=TARGET),
        seed=SEED,
    )
    tb.load_training_data_from_datasets([train_ds])
    meta = {"train_s": 0.0, "steps_timed": 0, "valid_frac": []}
    if SNAP.exists():
        tb.load_snapshot(SNAP)
        if META.exists():
            meta.update(json.loads(META.read_text()))
        print(f"resumed at step {tb.training_step}", flush=True)

    t0 = time.time()
    budget_s = float(os.environ.get("AB_BUDGET_S", "420"))
    budget_cap = config.n_rays * config.samples_per_ray
    timed_from = tb.training_step
    while tb.training_step < TARGET and time.time() - t0 < budget_s:
        tb.train()
        if tb.training_step % 100 == 0 and tb.last_aux is not None:
            vf = float(tb.last_aux.n_valid_samples) / budget_cap
            meta["valid_frac"].append([tb.training_step, round(vf, 4)])
            print(
                f"step {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"bucket={tb.batch_bucket} valid_frac={vf:.3f} "
                f"[{time.time()-t0:.0f}s]",
                flush=True,
            )
    meta["train_s"] += time.time() - t0
    meta["steps_timed"] += tb.training_step - timed_from
    tb.save_snapshot(SNAP)
    META.write_text(json.dumps(meta))
    print(
        f"paused/finished at step {tb.training_step} "
        f"[{meta['train_s']:.0f}s total train]",
        flush=True,
    )
    if tb.training_step < TARGET:
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
        target = srgb_eval_target(imgs[k])
        psnrs.append(float(psnr(jnp.asarray(rgb), target)))
        ssims.append(float(ssim(jnp.asarray(rgb), target)))
        print(f"eval view {k}: PSNR {psnrs[-1]:.2f}  SSIM {ssims[-1]:.4f}",
              flush=True)

    # Shell |SDF| on the GT surface.
    if gt_sdf is None:
        d = np.random.default_rng(0).normal(size=(4096, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        pts = (0.5 + 0.25 * d).astype(np.float32)
    else:
        rng = np.random.default_rng(0)
        pts = rng.uniform(0.2, 0.8, size=(200000, 3)).astype(np.float32)
        pts = pts[np.abs(gt_sdf(pts)) < 0.01][:4096]
    sdf_v, _ = sdf_fn(tb.state.ema_params, jnp.asarray(pts), config.field)
    surf_err = float(jnp.abs(sdf_v).mean())

    out = {
        "oversample": OVERSAMPLE,
        "scene": SCENE,
        "seed": SEED,
        "steps": tb.training_step,
        "held_out_psnr": float(np.mean(psnrs)),
        "held_out_ssim": float(np.mean(ssims)),
        "surface_sdf_err": surf_err,
        "train_s": meta["train_s"],
        "ms_per_step": 1000.0 * meta["train_s"] / max(meta["steps_timed"], 1),
        "mean_valid_frac": float(
            np.mean([v for _, v in meta["valid_frac"][-10:]])
        ),
    }
    META.write_text(json.dumps({**meta, **out}))
    print("DONE", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
