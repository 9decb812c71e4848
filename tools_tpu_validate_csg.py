"""Hard-scene TPU validation: flagship config on the CSG scene, held-out eval.

The CSG scene (neus2_tpu/data/synthetic.py::make_csg_dataset) is non-convex
with thin features and a high-frequency procedural texture — geometry the
sphere-prior init cannot trivially solve.  This is the stand-in for the
reference's DTU evaluation protocol (reference scripts/run.py:264-344; no DTU
data exists in this environment).

Protocol: 24 train views + 2 held-out views at 256^2, flagship L14/F2 model
(BASELINE config-2 model scale), 2000 steps (the reference's
first_frame_max_training_step default).  Reports: held-out PSNR (mean over
the 2 eval views, sRGB on black), mean |SDF| on ground-truth surface points,
and Chamfer distance between the extracted mesh and a densely-sampled
ground-truth surface cloud.

Resumable in <10-minute chunks (snapshot between invocations); uses the
persistent JAX compilation cache.  Run repeatedly until it prints DONE:
  python tools_tpu_validate_csg.py [target_steps]
"""

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import jax.numpy as jnp

from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import SCENES, make_csg_dataset
from neus2_tpu.engine.rays import Cameras
from neus2_tpu.engine.train import TrainConfig
from neus2_tpu.models.field import FieldConfig, sdf_fn
from neus2_tpu.ops.image import psnr, srgb_eval_target, ssim

import os

TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
# Protocol scale (reference DTU runs use 49-64 views, scripts/run.py):
# CSG_VIEWS=48 CSG_RES=256 for the full-protocol run.
N_TRAIN = int(os.environ.get("CSG_VIEWS", "24"))
N_EVAL = int(os.environ.get("CSG_EVAL_VIEWS", "2"))
RES = int(os.environ.get("CSG_RES", "256"))
# Reference default: error-map sampling OFF (testbed.h:636-637); opt in
# with CSG_ERROR_MAP=1.
USE_EMAP = os.environ.get("CSG_ERROR_MAP", "0") != "0"
# CSG_SCENE: which analytic scene (SCENES registry) — the multi-scene
# sweep is the BASELINE config-3 (multi-scan DTU Chamfer) analog.
SCENE = os.environ.get("CSG_SCENE", "csg")
SCENE_SDF, SCENE_ALBEDO = SCENES[SCENE]
_tag = f"_{N_TRAIN}v_{RES}" if (N_TRAIN, RES) != (24, 256) else ""
if SCENE != "csg":
    _tag += f"_{SCENE}"
if os.environ.get("CSG_CONFIG", ""):
    _tag += f"_{os.environ['CSG_CONFIG']}"
SNAP = Path(f"/tmp/tpu_validate_csg{_tag}.msgpack")
META = Path(f"/tmp/tpu_validate_csg{_tag}.json")


def gt_surface_points(n: int, seed: int = 0) -> np.ndarray:
    """Sample ground-truth CSG surface points: start from a dense box grid of
    candidates near the zero set and Newton-project along the FD normal."""
    rng = np.random.default_rng(seed)
    pts = rng.uniform(0.2, 0.8, size=(n * 40, 3)).astype(np.float32)
    pts = pts[np.abs(SCENE_SDF(pts)) < 0.08][: n * 4]
    eps = 1e-4
    for _ in range(12):
        d = SCENE_SDF(pts)[..., None]
        g = np.stack(
            [
                SCENE_SDF(pts + np.array([eps, 0, 0], np.float32))
                - SCENE_SDF(pts - np.array([eps, 0, 0], np.float32)),
                SCENE_SDF(pts + np.array([0, eps, 0], np.float32))
                - SCENE_SDF(pts - np.array([0, eps, 0], np.float32)),
                SCENE_SDF(pts + np.array([0, 0, eps], np.float32))
                - SCENE_SDF(pts - np.array([0, 0, eps], np.float32)),
            ],
            axis=-1,
        ) / (2 * eps)
        g /= np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
        pts = pts - d * g
    pts = pts[np.abs(SCENE_SDF(pts)) < 1e-4]
    return pts[:n].astype(np.float32)


def main():
    # CSG_CONFIG selects the flagship grid variant (parity L14/F2,
    # tpu_opt L7/F4, l4f8 L4/F8 — configs/*.json, utils/variants.py).
    from neus2_tpu.utils.variants import flagship_grid

    grid = flagship_grid(os.environ.get("CSG_CONFIG", "") or "parity")
    config = TrainConfig(
        # CSG_BF16=1: bf16 MLP/backward compute (fp32 master params), the
        # bench precision; quality parity gate-tested at <=0.3 dB
        # (test_train_e2e.py::test_bf16_compute_quality_parity).  Needed
        # on-chip for l4f8: the fp32 l4f8 backward's F=8 unpacked
        # segment-sum payload crashes the v5e worker (round-5 bisect).
        field=FieldConfig(
            grid=grid,
            compute_dtype=jnp.bfloat16 if os.environ.get("CSG_BF16") else None,
        ),
        n_rays=4096,
        samples_per_ray=64,
        n_candidates=256,
        ek_loss_weight=0.1,
        mask_loss_weight=0.1,
        use_error_map=USE_EMAP,
        # Hit-ray batch compaction (reference compacted-batch semantics;
        # quality evidence in PERF.md round 4).  Default 2 == the round-5
        # TrainConfig default; CSG_OVERSAMPLE=1 reproduces old protocols.
        hit_oversample=int(os.environ.get("CSG_OVERSAMPLE", "2")),
    )
    # Dataset cache: at >=1024^2 the numpy sphere-traced GT render takes
    # minutes — a resumable chip chunk must not pay it on every resume.
    cache = Path(f"/tmp/csg_ds_{SCENE}_{N_TRAIN + N_EVAL}v_{RES}.npz")
    if cache.exists():
        z = np.load(cache)
        ds = make_csg_dataset(n_views=1, resolution=RES, sdf=SCENE_SDF,
                              albedo=SCENE_ALBEDO)
        import dataclasses as _dc

        ds = _dc.replace(ds, images=z["images"], poses=z["poses"],
                         focal=z["focal"], principal=z["principal"])
        print(f"dataset from cache {cache}", flush=True)
    else:
        ds = make_csg_dataset(n_views=N_TRAIN + N_EVAL, resolution=RES,
                              sdf=SCENE_SDF, albedo=SCENE_ALBEDO)
        if RES >= 512:
            np.savez(cache, images=ds.images, poses=ds.poses,
                     focal=ds.focal, principal=ds.principal)
    cams_all = ds.cameras()
    imgs_all = jnp.asarray(ds.images)
    train_ds = ds.subset(slice(0, N_TRAIN)) if hasattr(ds, "subset") else None

    # CSG_FP16=1: half-precision texel storage (reference __half4 images,
    # nerf_loader.cu) — halves HBM for the >=1024^2 at-scale protocol.
    tb = Testbed(
        config=config,
        hyper=Hyperparams(first_frame_max_training_step=TARGET),
        image_dtype=jnp.float16 if os.environ.get("CSG_FP16") else None,
    )
    if train_ds is not None:
        tb.load_training_data_from_datasets([train_ds])
    else:
        import dataclasses

        tb.load_training_data_from_datasets(
            [
                dataclasses.replace(
                    ds,
                    images=ds.images[:N_TRAIN],
                    poses=ds.poses[:N_TRAIN],
                    focal=ds.focal[:N_TRAIN],
                    principal=ds.principal[:N_TRAIN],
                )
            ]
        )
    if SNAP.exists():
        tb.load_snapshot(SNAP)
        print(f"resumed at step {tb.training_step}", flush=True)

    t0 = time.time()
    # Leave generous headroom after the loop: fetching the full train state
    # over the axon tunnel for the snapshot can take tens of seconds.
    # (CSG_BUDGET_S: long-budget override for CPU runs, where there is no
    # 10-minute command window to fit inside.)
    budget_s = float(os.environ.get("CSG_BUDGET_S", "330"))
    while tb.training_step < TARGET and time.time() - t0 < budget_s:
        tb.train()
        if tb.training_step % 100 == 0:
            print(
                f"step {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"[{time.time()-t0:.0f}s]",
                flush=True,
            )
    tb.save_snapshot(SNAP)
    print(f"paused/finished at step {tb.training_step} [{time.time()-t0:.0f}s]", flush=True)
    if tb.training_step < TARGET:
        return

    # --- held-out PSNR over the eval views (sRGB on black, eval protocol of
    # reference scripts/run.py:299-320: linear->srgb, premultiplied alpha) ---
    from neus2_tpu.engine.render import RenderConfig, render_image

    rcfg = RenderConfig(
        field=config.field, samples_per_ray=128, n_candidates=256, chunk=1 << 13
    )
    psnrs, ssims = [], []
    for k in range(N_TRAIN, N_TRAIN + N_EVAL):
        rgb, depth, alpha = render_image(
            tb.state.ema_params, tb.state.acc, tb.state.occupancy,
            cams_all, cams_all.poses[k], cams_all.focal[k], cams_all.principal[k],
            jax.random.PRNGKey(k), rcfg, background=0.0, spp=8,
        )
        target = srgb_eval_target(imgs_all[k])
        p = float(psnr(jnp.asarray(rgb), target))
        s = float(ssim(jnp.asarray(rgb), target))
        psnrs.append(p)
        ssims.append(s)
        print(f"eval view {k}: PSNR {p:.2f} dB  SSIM {s:.4f}", flush=True)

    # --- geometry: |SDF| on GT surface + Chamfer mesh<->GT cloud ---
    gt_pts = gt_surface_points(16384)
    sdf, _ = sdf_fn(tb.state.ema_params, jnp.asarray(gt_pts), config.field)
    surf_err = float(jnp.abs(sdf).mean())

    chamfer = None
    try:
        from neus2_tpu.engine.mesh import extract_mesh, largest_component

        from neus2_tpu.ops.warp import AABB as _AABB

        verts, faces = extract_mesh(
            tb.state.ema_params, config.field, resolution=256,
            box=_AABB(jnp.full((3,), 0.15), jnp.full((3,), 0.85)),
        )
        # Drop interior/unobserved floater blobs (mask-free analog of the
        # reference DTU protocol's object-mask cropping).
        verts, faces = largest_component(np.asarray(verts), np.asarray(faces))
        v = jnp.asarray(np.asarray(verts, np.float32))
        g = jnp.asarray(gt_pts)
        # symmetric Chamfer (mean of two directed mean NN distances), chunked
        def directed(a, b):
            def one(chunk):
                d = jnp.linalg.norm(chunk[:, None, :] - b[None, :, :], axis=-1)
                return d.min(axis=1)
            outs = [one(a[i : i + 1024]) for i in range(0, a.shape[0], 1024)]
            return float(jnp.concatenate(outs).mean())

        sub = v[:: max(1, v.shape[0] // 16384)]
        chamfer = 0.5 * (directed(sub, g) + directed(g, sub))
    except Exception as e:  # mesh extraction is secondary; report and move on
        print("mesh/chamfer skipped:", e, flush=True)

    out = {
        "steps": tb.training_step,
        "held_out_psnr": float(np.mean(psnrs)),
        "held_out_ssim": float(np.mean(ssims)),
        "per_view_psnr": psnrs,
        "surface_sdf_err": surf_err,
        "chamfer": chamfer,
    }
    META.write_text(json.dumps(out))
    print("DONE", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
