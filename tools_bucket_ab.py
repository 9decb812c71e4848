"""Adaptive-bucket quality A/B on the bench scene (VERDICT r3 task 1/8).

The bench's converged operating point on the sphere scene measures
occ_len ~= 0.043 (tools_occ_char.py), for which the default bucket formula
(adaptive_samples_factor = 0.75) selects bucket 1 (8192 x 32).  Bucket 2
(16384 x 16) — the regime that crosses the 33k rays/s baseline — would
need factor <= ~0.62 at that occ_len.  A factor change is only legitimate
with quality evidence: this tool trains the EXACT bench flagship config
(bf16 L14/F2, adaptive buckets on, Testbed product loop) end-to-end at a
given factor and reports held-out PSNR/SSIM, shell |SDF| error, and the
bucket occupancy history.  Equal steps across variants; the only
difference is how early the sample budget is traded for rays.

Usage: python tools_bucket_ab.py FACTOR [TARGET=2000]
  BAB_SCENE=csg runs the hard-scene variant (24 train views @256^2, thin
  fins + hf texture — the round-3 verdict asked whether bucket 2's coarser
  dt survives hard geometry, weak #2).
Resumable in tunnel-window chunks (snapshot keyed by factor+scene).
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

FACTOR = float(sys.argv[1]) if len(sys.argv) > 1 else 0.75
TARGET = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
SCENE = os.environ.get("BAB_SCENE", "sphere")
TAG = f"f{FACTOR:g}".replace(".", "p") + ("" if SCENE == "sphere" else f"_{SCENE}")
SNAP = Path(f"/tmp/bucket_ab_{TAG}.msgpack")
META = Path(f"/tmp/bucket_ab_{TAG}.json")
HIST = Path(f"/tmp/bucket_ab_{TAG}_hist.json")


def main():
    config = dataclasses.replace(
        flagship_config(), adaptive_samples_factor=FACTOR
    )
    gt_sdf = None  # analytic sphere shell below
    if SCENE == "sphere":
        train_ds = make_sphere_dataset(n_views=16, resolution=256)
        # Held-out poses: a 20-view ring places every camera differently from
        # the 16-view training ring (cos_t spacing depends on n_views).
        eval_ds = make_sphere_dataset(n_views=20, resolution=256)
        eval_ids = [3, 9, 14, 17]
    else:
        sdf, albedo = SCENES[SCENE]
        full = make_csg_dataset(n_views=26, resolution=256, sdf=sdf, albedo=albedo)
        train_ds = full.subset(slice(0, 24))
        eval_ds = full
        eval_ids = [24, 25]
        gt_sdf = sdf
        config = dataclasses.replace(config, mask_loss_weight=0.1)

    tb = Testbed(
        config=config, hyper=Hyperparams(first_frame_max_training_step=TARGET)
    )
    tb.load_training_data_from_datasets([train_ds])
    hist = []
    if SNAP.exists():
        tb.load_snapshot(SNAP)
        hist = json.loads(HIST.read_text()) if HIST.exists() else []
        # batch_bucket is live state, not snapshotted config — restore it so
        # a resumed run does not restart in bucket 0 (it would re-vote
        # quickly, but the history would record a spurious dip).
        if hist:
            tb.batch_bucket = hist[-1][1]
            tb._occ_len_ema = hist[-1][2]
        print(f"resumed at step {tb.training_step}", flush=True)

    t0 = time.time()
    budget_s = float(os.environ.get("AB_BUDGET_S", "420"))
    last_bucket = tb.batch_bucket
    while tb.training_step < TARGET and time.time() - t0 < budget_s:
        tb.train()
        if tb.batch_bucket != last_bucket:
            hist.append(
                [tb.training_step, tb.batch_bucket, tb._occ_len_ema]
            )
            last_bucket = tb.batch_bucket
        if tb.training_step % 200 == 0:
            print(
                f"step {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"bucket={tb.batch_bucket} "
                f"occ_len={tb._occ_len_ema or 0.0:.4f} [{time.time()-t0:.0f}s]",
                flush=True,
            )
    tb.save_snapshot(SNAP)
    HIST.write_text(json.dumps(hist))
    print(
        f"paused/finished at step {tb.training_step} [{time.time()-t0:.0f}s]",
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

    if gt_sdf is None:
        d = np.random.default_rng(0).normal(size=(2048, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        shell = jnp.asarray(
            np.float32(0.5) + np.float32(0.25) * d.astype(np.float32)
        )
    else:
        rng = np.random.default_rng(0)
        pts = rng.uniform(0.2, 0.8, size=(200000, 3)).astype(np.float32)
        shell = jnp.asarray(pts[np.abs(gt_sdf(pts)) < 0.01][:4096])
    sdf, _ = sdf_fn(tb.state.ema_params, shell, config.field)
    out = {
        "factor": FACTOR,
        "scene": SCENE,
        "steps": tb.training_step,
        "held_out_psnr": float(np.mean(psnrs)),
        "held_out_ssim": float(np.mean(ssims)),
        "per_view_psnr": psnrs,
        "shell_sdf_err": float(jnp.abs(sdf).mean()),
        "bucket_history": hist,
        "final_occ_len_ema": tb._occ_len_ema,
    }
    META.write_text(json.dumps(out))
    print("DONE", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
