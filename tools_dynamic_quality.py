"""Dynamic-scene quality protocol (BASELINE tracked configs 4-5 analog).

The reference's dynamic acceptance surface is scripts/run_dynamic.py: train
frame 0, then each next frame (pose-refinement phase first), and log
per-frame PSNR on eval renders (run_dynamic.py:183-201 via cal_psnr) plus
the accumulated transform (save_transform).  This tool runs that protocol
on the synthetic moving-sphere scene (rigid per-frame translation — the
exact setting the DeltaNetwork models) at CPU-able scale and reports:

  * per-frame held-out-view PSNR (view excluded from training),
  * per-frame pose-recovery error |t_acc - t_gt| after each fold,
  * mean PSNR across frames (the reference's dynamic_eval_log.json summary).

Run (resumable across command windows via snapshot):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python -u tools_dynamic_quality.py
Env knobs: DYN_FRAMES (4), DYN_VIEWS (12 train + 1 held out), DYN_RES (64),
DYN_BUDGET_S (3000), DYN_PREDICT (1 -> config 5; 0 -> config 4: no pose
prediction, scene must be static-per-frame aligned already).
Writes /tmp/dynamic_quality[_nopredict].json.
"""

import json
import os
import time
from pathlib import Path

from neus2_tpu.utils.cpuforce import force_cpu_if_requested

force_cpu_if_requested()

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_moving_sphere_frames
from neus2_tpu.engine.render import RenderConfig, render_image
from neus2_tpu.engine.train import TrainConfig
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.ops.image import psnr as psnr_fn, srgb_eval_target

PREDICT = os.environ.get("DYN_PREDICT", "1") == "1"
SUFFIX = "" if PREDICT else "_nopredict"
if os.environ.get("DYN_TAG"):
    SUFFIX += "_" + os.environ["DYN_TAG"]
SNAP = Path(f"/tmp/dynamic_quality{SUFFIX}.msgpack")
OUT = Path(f"/tmp/dynamic_quality{SUFFIX}.json")
RESULTS = Path(f"/tmp/dynamic_quality{SUFFIX}_partial.json")

N_FRAMES = int(os.environ.get("DYN_FRAMES", "4"))
N_VIEWS = int(os.environ.get("DYN_VIEWS", "12"))
RES = int(os.environ.get("DYN_RES", "64"))
BUDGET_S = float(os.environ.get("DYN_BUDGET_S", "3000"))
NEXT_STEPS = int(os.environ.get("DYN_NEXT_STEPS", "300"))
REFINE_STEPS = int(os.environ.get("DYN_REFINE_STEPS", "100"))
FRAME0_STEPS = int(os.environ.get("DYN_FRAME0_STEPS", "800"))
DELTA_LR = float(os.environ.get("DYN_DELTA_LR", "5e-3"))
MOTION_PRIOR = os.environ.get("DYN_MOTION_PRIOR", "0") == "1"
# DYN_FULL=1: the static-protocol model scale (flagship bf16 grid,
# 4096 x 64 batch) for the on-chip 48-view @256^2 run (VERDICT r4 task 6);
# default stays the CPU-able small model.
FULL = os.environ.get("DYN_FULL", "0") == "1"
SHIFT = (0.035, 0.0, 0.0)


def make_config() -> TrainConfig:
    if FULL:
        from bench import flagship_config
        import dataclasses

        return dataclasses.replace(
            flagship_config(os.environ.get("DYN_CONFIG", "parity")),
            delta_lr=DELTA_LR,
        )
    return TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=8,
                log2_hashmap_size=15,
                base_resolution=16,
                per_level_scale=HashGridConfig.per_level_scale_from_top(16, 256, 8),
            ),
        ),
        n_rays=1024,
        samples_per_ray=32,
        n_candidates=96,
        ek_loss_weight=0.1,
        mask_loss_weight=0.1,
        delta_lr=DELTA_LR,
    )


def eval_frame(tb: Testbed, heldout_ds) -> float:
    """Held-out-view PSNR for the CURRENT frame, eval protocol of
    scripts/run.py:264-271 (black bg, sRGB) at spp 2."""
    cams = heldout_ds.cameras()
    cfg = RenderConfig(
        field=tb.config.field,
        aabb_scale=tb.config.aabb_scale,
        samples_per_ray=64,
        n_candidates=128,
        min_transmittance=1e-4,
    )
    i = heldout_ds.n_images - 1  # the view excluded from training
    rgb, _, _ = render_image(
        tb.state.ema_params, tb.effective_acc, tb.state.occupancy, cams,
        cams.poses[i], cams.focal[i], cams.principal[i],
        jax.random.PRNGKey(0), cfg, background=0.0, spp=2,
    )
    target = srgb_eval_target(heldout_ds.images_device()[i])
    return float(psnr_fn(rgb, target))


def main():
    t_start = time.time()
    # N_VIEWS + 1 cameras; the last view of each frame is held out from
    # training but shares poses across frames (same rig, moving object).
    frames_full = make_moving_sphere_frames(
        n_frames=N_FRAMES, translation_per_frame=SHIFT,
        n_views=N_VIEWS + 1, resolution=RES,
    )

    # Training datasets exclude the held-out view.
    def drop_last(ds):
        import dataclasses as dc

        return dc.replace(
            ds,
            images=ds.images[:-1],
            poses=ds.poses[:-1],
            focal=ds.focal[:-1],
            principal=ds.principal[:-1],
        )

    train_frames = [drop_last(ds) for ds in frames_full]

    hyper = Hyperparams(
        # DYN_C2F=1: coarse-to-fine pose refinement (round-5 full-scale
        # finding — see Hyperparams.refine_coarse_to_fine).
        refine_coarse_to_fine=os.environ.get("DYN_C2F", "0") == "1",
        first_frame_max_training_step=FRAME0_STEPS,
        next_frame_max_training_step=NEXT_STEPS,
        predict_global_movement=PREDICT,
        predict_global_movement_training_step=REFINE_STEPS,
        # Shipped-config setting (base.json:127): the delta keeps refining
        # during the canonical phase, so residual pose error keeps shrinking.
        finetune_global_movement=True,
        delta_motion_prior=MOTION_PRIOR,
        mask_loss_weight=0.1,
        ek_loss_weight=0.1,
    )
    tb = Testbed(config=make_config(), hyper=hyper)
    tb.load_training_data_from_datasets(train_frames)

    results = {"per_frame_psnr": [], "pose_err": [], "predict": PREDICT,
           "motion_prior": MOTION_PRIOR}
    if RESULTS.exists():
        results = json.loads(RESULTS.read_text())
    if SNAP.exists():
        # load_snapshot replays the dynamic phase flags + frame dataset
        # (Testbed._restore_phase_flags).
        tb.load_snapshot(SNAP)
        print(
            f"resumed frame {tb.current_training_time_frame} "
            f"step {tb.training_step}", flush=True,
        )

    def on_complete(tb_, k):
        p = eval_frame(tb_, frames_full[k])
        # Pose error: learned composite translation vs GT object motion.
        # The canonical field models frame 0; frame k's samples are pulled
        # back by (acc o delta), so the recovered translation ~ -k * SHIFT.
        acc = jax.device_get(tb_.effective_acc)
        t_err = float(
            np.linalg.norm(np.asarray(acc["transition"]) + k * np.asarray(SHIFT))
        )
        while len(results["per_frame_psnr"]) <= k:
            results["per_frame_psnr"].append(None)
            results["pose_err"].append(None)
        results["per_frame_psnr"][k] = p
        results["pose_err"][k] = t_err
        RESULTS.write_text(json.dumps(results))
        print(f"frame {k}: held-out PSNR {p:.2f} dB, |t err| {t_err:.4f}",
              flush=True)

    tb.on_frame_complete = on_complete

    step = 0
    while tb.frame():
        step += 1
        if step % 100 == 0:
            print(
                f"frame {tb.current_training_time_frame} "
                f"local {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"[{time.time()-t_start:.0f}s]", flush=True,
            )
        if time.time() - t_start > BUDGET_S:
            tb.save_snapshot(SNAP)
            print(
                f"budget reached; snapshot at frame "
                f"{tb.current_training_time_frame} step {tb.training_step} — "
                f"re-run to resume", flush=True,
            )
            return

    done = [p for p in results["per_frame_psnr"] if p is not None]
    results["mean_psnr"] = float(np.mean(done)) if done else None
    OUT.write_text(json.dumps(results, indent=1))
    print("DONE", json.dumps(results), flush=True)
    SNAP.unlink(missing_ok=True)
    RESULTS.unlink(missing_ok=True)


if __name__ == "__main__":
    main()
