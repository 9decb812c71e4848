"""CLI runner: train / eval / mesh-export for static and dynamic scenes.

Mirrors the reference driver scripts (reference: scripts/run.py — tqdm train
loop over testbed.frame() at 207, TensorBoard loss logging at 230-233,
PSNR/SSIM eval vs a held-out transforms_test.json at 251-344, marching-cubes
export at 241-243 — and scripts/run_dynamic.py for per-frame dynamic scenes),
plus the CLI surface of src/main.cu:30-120.

Usage:
  python -m neus2_tpu.run --scene data/scan24/transforms.json \
      --network configs/base.json --n_steps 2000 --name exp1 \
      --save_mesh --test_transforms data/scan24/transforms_test.json
  python -m neus2_tpu.run --scene data/dynamic_scene_dir/ --name dyn1
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scene", required=True,
                   help="transforms.json (static) or a directory of per-frame jsons (dynamic)")
    p.add_argument("--network", default=None, help="network config json (reference format)")
    p.add_argument("--name", default="exp", help="experiment name -> output/<name>/")
    p.add_argument("--output_dir", default="output")
    p.add_argument("--n_steps", type=int, default=None,
                   help="override first_frame_max_training_step")
    p.add_argument("--next_frame_steps", type=int, default=None,
                   help="dynamic scenes: override next_frame_max_training_step "
                        "(reference run_dynamic.py per-frame step budget)")
    p.add_argument("--snapshot", default=None, help="load snapshot before training")
    p.add_argument("--save_snapshot_every", type=int, default=0)
    p.add_argument("--save_mesh", action="store_true")
    p.add_argument("--dynamic_save_mesh", action="store_true",
                   help="dynamic scenes: export a canonical-space mesh when "
                        "each frame finishes (reference run_dynamic.py "
                        "--dynamic_save_mesh)")
    p.add_argument("--mesh_resolution", type=int, default=256)
    p.add_argument("--save_density_png", action="store_true",
                   help="save a Z-slice mosaic PNG of the SDF grid "
                        "(reference save_density_grid_to_png diagnostic)")
    p.add_argument("--mesh_largest_component", action="store_true",
                   help="drop disconnected floater blobs from the exported "
                        "mesh (mask-free analog of the DTU protocol's "
                        "object-mask cropping)")
    p.add_argument("--test_transforms", default=None,
                   help="held-out transforms json for PSNR/SSIM eval")
    p.add_argument("--eval_per_frame", action="store_true",
                   help="dynamic scenes: log view-0 PSNR when each frame finishes")
    p.add_argument("--ref_mesh", default=None,
                   help="reference mesh (.obj) for Chamfer-distance eval")
    p.add_argument("--eval_spp", type=int, default=8)
    p.add_argument("--screenshot_transforms", default=None,
                   help="render the views of this transforms json to PNGs "
                        "(reference run.py --screenshot_transforms)")
    p.add_argument("--screenshot_dir", default=None,
                   help="output dir for --screenshot_transforms (default "
                        "output/<name>/screenshots)")
    p.add_argument("--screenshot_spp", type=int, default=16)
    p.add_argument("--screenshot_frames", nargs="*", type=int, default=None,
                   help="subset of view indices to render")
    p.add_argument("--shaded_mesh", action="store_true",
                   help="with --save_eval_images: also rasterize the "
                        "extracted mesh per eval view, Lambertian-shaded "
                        "(reference run.py --shaded_mesh / render_utils "
                        "render_mesh); with --save_mesh alone a normal-map "
                        "render is written instead")
    p.add_argument("--save_eval_images", action="store_true",
                   help="write each eval view's render and |render-GT| "
                        "difference as PNGs (reference cal_psnr writes "
                        "side-by-side images, scripts/render_utils.py)")
    p.add_argument("--render_path", default=None,
                   help="render a PNG frame sequence along a camera path: "
                        "a CameraPath json, or 'orbit' for an auto orbit")
    p.add_argument("--render_n_frames", type=int, default=60)
    p.add_argument("--n_rays", type=int, default=None)
    p.add_argument("--samples_per_ray", type=int, default=None)
    p.add_argument("--hit_oversample", type=int, default=None,
                   help="probe N*n_rays candidate pixels and fill the batch "
                        "with occupancy-hitting rays (reference compacted-"
                        "batch semantics, testbed_nerf.cu:3434); 1 = off")
    p.add_argument("--bf16", action="store_true",
                   help="bf16 MLP compute (fp32 accumulation + master params)")
    p.add_argument("--near_distance", type=float, default=None,
                   help="training rays start this far from the camera "
                        "(reference run.py --near_distance; <0/unset = "
                        "config default)")
    p.add_argument("--depth_supervision_lambda", type=float, default=None,
                   help="L2 depth-supervision weight; depth maps load from "
                        "per-frame depth_path + integer_depth_scale")
    p.add_argument("--tensorboard", action="store_true")
    p.add_argument("--grid_stats", action="store_true",
                   help="log per-level hashgrid weight stats after training "
                        "(reference gather_histograms, testbed.cu:3056)")
    p.add_argument("--no_train", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--fp16-images", action="store_true",
                   help="store training images on device as fp16 (the "
                        "reference's texel precision; halves image HBM)")
    p.add_argument("--multichip", choices=("auto", "on", "off"), default="auto",
                   help="data-parallel training over all devices (auto: on "
                        "when more than one device is visible)")
    p.add_argument("--zero1", action="store_true",
                   help="multichip: shard the hash-table gradient reduction "
                        "and optimizer state over the mesh (ZeRO-1)")
    p.add_argument("--multihost", action="store_true",
                   help="initialize jax.distributed (one process per host of "
                        "a pod slice; the mesh spans every host's chips). "
                        "Logs/snapshots/meshes are written by process 0 only.")
    p.add_argument("--coordinator", default=None,
                   help="multihost coordinator address host:port "
                        "(auto-detected on Cloud TPU VMs)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # SDF-from-mesh mode (reference testbed_sdf.cu; engine/sdf_mode.py):
    # --mode sdf treats --scene as an OBJ mesh path, fits a neural SDF to
    # the native-BVH ground truth, reports IoU, and optionally writes a
    # sphere-traced normal-map render + an extracted mesh.
    p.add_argument("--mode", choices=("nerf", "sdf", "image"),
                   default="nerf",
                   help="testbed mode: nerf (NeuS2 reconstruction, "
                        "default), sdf (fit a mesh's SDF), or image "
                        "(2-D image regression)")
    p.add_argument("--sdf_render_res", type=int, default=512)
    return p.parse_args(argv)


def main_image(args, out: "Path") -> None:
    """Image-fit mode driver (reference testbed_image.cu:220)."""
    import imageio.v2 as imageio
    import numpy as np

    from neus2_tpu.engine import image_mode

    img = np.asarray(imageio.imread(args.scene), np.float32)
    if img.max() > 1.5:
        img = img / 255.0
    steps = args.n_steps or 1000
    params, psnr = image_mode.fit_image(img, n_steps=steps, seed=args.seed)
    print(f"image mode: {steps} steps, reconstruction PSNR {psnr:.2f} dB",
          flush=True)
    (out / "logs").mkdir(parents=True, exist_ok=True)
    (out / "logs" / "image_eval.json").write_text(
        json.dumps({"steps": steps, "psnr": psnr})
    )
    cfg = image_mode.Image2DConfig()
    recon = image_mode.render_image_fit(
        params, cfg, (img.shape[1], img.shape[0])
    )
    imageio.imwrite(
        out / "image_recon.png",
        (np.clip(np.asarray(recon), 0, 1) * 255).astype(np.uint8),
    )


def main_sdf(args, out: "Path") -> None:
    """SDF-from-mesh mode driver (reference main.cu mode dispatch ->
    testbed_sdf.cu)."""
    import imageio.v2 as imageio
    import numpy as np

    from neus2_tpu.engine import sdf_mode

    steps = args.n_steps or 2000
    params, cfg, bvh, (verts, faces) = sdf_mode.fit_mesh_sdf(
        args.scene, n_steps=steps, seed=args.seed
    )
    iou = sdf_mode.eval_iou(params, cfg, bvh)
    print(f"sdf mode: {steps} steps, IoU {iou:.4f}", flush=True)
    (out / "logs").mkdir(parents=True, exist_ok=True)
    (out / "logs" / "sdf_eval.json").write_text(
        json.dumps({"steps": steps, "iou": iou})
    )

    import jax.numpy as jnp

    from neus2_tpu.data.synthetic import _look_at

    eye = np.array([0.5, -1.1, 1.0], np.float32)
    pose = _look_at(eye, np.full(3, 0.5, np.float32),
                    np.array([0.0, 0.0, 1.0], np.float32))
    res = args.sdf_render_res
    focal = jnp.full((2,), 0.5 * res / np.tan(0.35), jnp.float32)
    rgb, _, _ = sdf_mode.render_sdf_sphere_traced(
        params, jnp.asarray(pose), focal, cfg, resolution=(res, res)
    )
    imageio.imwrite(
        out / "sdf_render.png",
        (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8),
    )
    if args.save_mesh:
        from neus2_tpu.engine.mesh import extract_mesh, save_mesh_obj

        v, f = extract_mesh(params, cfg.field,
                            resolution=args.mesh_resolution)
        (out / "mesh").mkdir(parents=True, exist_ok=True)
        save_mesh_obj(out / "mesh" / "sdf_mesh.obj", np.asarray(v),
                      np.asarray(f))
        print(f"mesh saved ({np.asarray(v).shape[0]} verts)", flush=True)


def main(argv=None):
    args = parse_args(argv)
    import dataclasses
    import os

    import jax

    # The axon TPU-tunnel platform overrides JAX_PLATFORMS; force the platform
    # list back to cpu BEFORE anything (including distributed.is_primary)
    # can initialize a backend (see utils/cpuforce.py).
    from neus2_tpu.utils.cpuforce import force_cpu_if_requested

    force_cpu_if_requested()

    primary = True
    if args.multihost:
        # Must run before any other jax call (SURVEY §5.8; the reference is
        # single-process — this is the TPU framework's multi-host layer).
        from neus2_tpu.parallel import distributed

        distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        primary = distributed.is_primary()

    from neus2_tpu.api.testbed import Hyperparams, Testbed, config_from_json
    from neus2_tpu.engine.train import TrainConfig

    out = Path(args.output_dir) / args.name
    if args.mode == "sdf":
        out.mkdir(parents=True, exist_ok=True)
        main_sdf(args, out)
        return
    if args.mode == "image":
        out.mkdir(parents=True, exist_ok=True)
        main_image(args, out)
        return
    if primary:
        for sub in ("checkpoints", "mesh", "logs"):
            (out / sub).mkdir(parents=True, exist_ok=True)
    log_path = out / "log.txt"

    def log(msg: str):
        # Non-primary hosts train silently (identical replicated math);
        # process 0 owns all file IO (SURVEY §5.8 primary-process gating).
        if not primary:
            return
        print(msg, flush=True)
        with open(log_path, "a") as f:
            f.write(msg + "\n")

    if args.network:
        config, hyper = config_from_json(args.network)
    else:
        config, hyper = TrainConfig(), Hyperparams()
    changes = {}
    if args.n_rays:
        changes["n_rays"] = args.n_rays
    if args.samples_per_ray:
        changes["samples_per_ray"] = args.samples_per_ray
    if args.hit_oversample:
        changes["hit_oversample"] = args.hit_oversample
    if args.depth_supervision_lambda is not None:
        changes["depth_supervision_lambda"] = args.depth_supervision_lambda
    if args.near_distance is not None and args.near_distance >= 0:
        changes["near"] = args.near_distance
    if args.bf16:
        import jax.numpy as jnp

        changes["field"] = dataclasses.replace(
            config.field, compute_dtype=jnp.bfloat16
        )
    if changes:
        config = dataclasses.replace(config, **changes)
    if args.n_steps:
        hyper.first_frame_max_training_step = args.n_steps
    if args.next_frame_steps:
        hyper.next_frame_max_training_step = args.next_frame_steps

    import jax.numpy as jnp

    tb = Testbed(
        config=config,
        hyper=hyper,
        seed=args.seed,
        image_dtype=jnp.float16 if args.fp16_images else None,
    )
    if args.multichip == "on" or (
        args.multichip == "auto" and len(jax.devices()) > 1
    ):
        n = tb.enable_multichip(zero1=args.zero1)
        log(f"multichip: data-parallel over {n} devices "
            f"({config.n_rays} rays/batch global"
            + (", zero1 table sharding" if args.zero1 else "") + ")")
    log(f"loading scene {args.scene}")
    try:
        tb.load_training_data(args.scene)
    except FileNotFoundError as e:
        print(f"error: scene not found: {e}", file=sys.stderr)
        sys.exit(2)
    log(
        f"{tb.dataset.n_images} images @ {tb.dataset.resolution}, "
        f"{tb.all_training_time_frame} time frame(s), devices={jax.devices()}"
    )
    if args.snapshot:
        tb.load_snapshot(args.snapshot)
        log(f"restored snapshot {args.snapshot}")

    writer = None
    if args.tensorboard:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(log_dir=str(out / "logs"))
    frame_writers = {}

    if args.eval_per_frame:
        from neus2_tpu.run import _make_per_frame_eval

        tb.on_frame_complete = _make_per_frame_eval(log)

    if not args.no_train:
        t0 = time.time()
        step = 0
        last_frame = 0
        while tb.frame():
            step += 1
            if tb.current_training_time_frame != last_frame:
                last_frame = tb.current_training_time_frame
                log(f"-> time frame {last_frame} at step {step} [{time.time()-t0:.1f}s]")
                if primary:
                    tb.save_snapshot(
                        out / "checkpoints" / f"frame_{last_frame - 1}.msgpack",
                        incremental=True,
                    )
                    # Per-frame accumulated R|t export (reference
                    # run_dynamic.py saves transforms each frame via
                    # testbed.cu:3118 save_transform).
                    tb.save_transform(
                        out / "checkpoints" / f"transform_{last_frame - 1}.txt"
                    )
                    if args.dynamic_save_mesh:
                        mp = (out / "mesh"
                              / f"frame_{last_frame - 1:04d}.obj")
                        tb.compute_and_save_marching_cubes_mesh(
                            mp, resolution=args.mesh_resolution
                        )
                        log(f"  per-frame mesh -> {mp}")
            if step % 100 == 0:
                log(
                    f"step {step} (frame {tb.current_training_time_frame} "
                    f"local {tb.training_step}) loss={tb.loss_scalar:.5f} "
                    f"ek={tb.ek_loss_scalar:.5f} mask={tb.mask_loss_scalar:.5f} "
                    f"[{time.time()-t0:.1f}s]"
                )
                if writer:
                    writer.add_scalar("loss/rgb", tb.loss_scalar, step)
                    writer.add_scalar("loss/ek", tb.ek_loss_scalar, step)
                    writer.add_scalar("loss/mask", tb.mask_loss_scalar, step)
                    if tb.is_dynamic:
                        # Per-frame writer alongside the global one
                        # (reference run_dynamic.py:296-305 logs both).
                        k = tb.current_training_time_frame
                        if frame_writers.get(k) is None:
                            frame_writers[k] = SummaryWriter(
                                log_dir=str(out / "logs" / f"frame_{k}")
                            )
                        frame_writers[k].add_scalar(
                            "loss/rgb", tb.loss_scalar, tb.training_step
                        )
            if (
                primary
                and args.save_snapshot_every
                and step % args.save_snapshot_every == 0
            ):
                tb.save_snapshot(out / "checkpoints" / f"{step}.msgpack")
        log(f"training done: {step} steps in {time.time()-t0:.1f}s")
        if primary:
            tb.save_snapshot(out / "checkpoints" / "final.msgpack")
            if tb.is_dynamic:
                # The final frame's delta is never folded (next_frame returns
                # False); save_transform exports effective_acc so the last
                # frame's pose is on disk like every other frame's.
                tb.save_transform(
                    out / "checkpoints"
                    / f"transform_{tb.current_training_time_frame}.txt"
                )
        if args.multihost:
            from neus2_tpu.parallel import distributed

            distributed.barrier("final-snapshot")

    tb.prepare_for_test()

    if args.grid_stats and primary:
        from neus2_tpu.utils.introspect import (
            format_level_stats,
            hashgrid_level_stats,
        )

        log("hashgrid level stats:\n"
            + format_level_stats(hashgrid_level_stats(tb.state.params)))

    if not primary:
        # Replicated training is done; eval artifacts come from process 0.
        return tb

    if args.save_mesh:
        mesh_path = out / "mesh" / "mesh.obj"
        log(f"extracting mesh @ {args.mesh_resolution}^3 -> {mesh_path}")
        verts, tris = tb.compute_and_save_marching_cubes_mesh(
            mesh_path, resolution=args.mesh_resolution,
            keep_largest_component=args.mesh_largest_component,
        )
        log(f"mesh: {len(verts)} vertices, {len(tris)} triangles")

    if args.save_density_png and primary:
        from neus2_tpu.engine.mesh import save_density_grid_png

        png_path = out / "mesh" / "density_grid.png"
        png_path.parent.mkdir(parents=True, exist_ok=True)
        from neus2_tpu.ops.warp import scene_aabb

        nvox, nnear = save_density_grid_png(
            tb.state.ema_params, tb.config.field, png_path,
            resolution=min(args.mesh_resolution, 128),
            aabb=scene_aabb(tb.config.aabb_scale),
        )
        log(f"density grid png -> {png_path} "
            f"({nvox} surface voxels, {nnear} near-crossing lattice points)")

    if args.ref_mesh:
        from neus2_tpu.engine.mesh import chamfer_distance, extract_mesh
        from neus2_tpu.ops.warp import scene_aabb

        verts, _ = tb.compute_and_save_marching_cubes_mesh(
            out / "mesh" / "eval_mesh.obj", resolution=args.mesh_resolution
        ) if not args.save_mesh else (verts, tris)
        ref_v = _load_obj_vertices(args.ref_mesh)
        # OBJ exports live in dataset space ((v - offset) / scale); compare
        # both meshes there.
        off = np.asarray(tb.dataset.offset, np.float32)
        verts_ds = (verts - off) / tb.dataset.scale
        cd = chamfer_distance(verts_ds, ref_v)
        log(f"chamfer vs {args.ref_mesh}: {cd:.6f}")

    if args.render_path and primary:
        log(f"rendering {args.render_n_frames} frames along {args.render_path}")
        render_camera_path(
            tb, args.render_path, args.render_n_frames,
            out / "frames", args.eval_spp, log,
        )

    if args.screenshot_transforms:
        shot_dir = Path(args.screenshot_dir) if args.screenshot_dir else (
            out / "screenshots"
        )
        screenshot(tb, args.screenshot_transforms, shot_dir,
                   args.screenshot_spp, args.screenshot_frames, log)

    if args.test_transforms:
        # Eval-time mesh visualization (reference render_img_training_view
        # writes frame_XXXXXX_mesh.png via its pytorch3d rasterizer;
        # scripts/render_utils.py:418-421): rasterize the extracted mesh
        # from each eval view — normal map, or Lambertian w/ --shaded_mesh.
        eval_mesh = None
        if args.save_eval_images and (args.save_mesh or args.shaded_mesh):
            if args.save_mesh:
                eval_mesh = (verts, tris)
            else:
                from neus2_tpu.engine.mesh import extract_mesh
                from neus2_tpu.ops.warp import scene_aabb

                eval_mesh = extract_mesh(
                    tb.state.ema_params, tb.config.field,
                    resolution=args.mesh_resolution,
                    box=scene_aabb(tb.config.aabb_scale),
                )
        psnrs, ssims = evaluate(
            tb, args.test_transforms, args.eval_spp, log,
            save_dir=(out / "evaluation") if args.save_eval_images else None,
            mesh=eval_mesh, mesh_shaded=args.shaded_mesh,
        )
        metrics = {
            "psnr_mean": float(np.mean(psnrs)),
            "ssim_mean": float(np.mean(ssims)),
            "psnr": [float(p) for p in psnrs],
        }
        with open(out / "metrics.json", "w") as f:
            json.dump(metrics, f, indent=2)
        log(f"eval: PSNR {metrics['psnr_mean']:.2f} dB  SSIM {metrics['ssim_mean']:.4f}")

    if writer:
        writer.close()
    for w in frame_writers.values():
        w.close()
    return tb


def screenshot(tb, transforms: str, out_dir, spp: int, frames, log):
    """Render the views of a transforms json to PNGs (reference run.py
    screenshot mode, scripts/run.py:46-49, 345-377)."""
    import imageio.v2 as imageio
    import jax

    from neus2_tpu.data.dataset import load_dataset
    from neus2_tpu.engine.render import RenderConfig, render_image

    ds = load_dataset(transforms)
    cams = ds.cameras()
    cfg = RenderConfig(
        field=tb.config.field, aabb_scale=tb.config.aabb_scale,
        min_transmittance=1e-4,
    )
    out_dir.mkdir(parents=True, exist_ok=True)
    idxs = frames if frames else range(ds.n_images)
    for i in idxs:
        rgb, _, _ = render_image(
            tb.state.ema_params, tb.effective_acc, tb.state.occupancy, cams,
            cams.poses[i], cams.focal[i], cams.principal[i],
            jax.random.PRNGKey(i), cfg, background=0.0, spp=spp,
            **tb._render_extras(),
        )
        fp = out_dir / f"{i:04d}.png"
        imageio.imwrite(
            fp, (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        )
        log(f"  screenshot {fp}")


def evaluate(
    tb, test_transforms: str, spp: int, log, save_dir=None,
    mesh=None, mesh_shaded=False,
) -> tuple[list, list]:
    """PSNR/SSIM on held-out views (reference run.py:251-344 protocol:
    black background, spp=8, min transmittance 1e-4, sRGB space)."""
    import jax
    import jax.numpy as jnp

    from neus2_tpu.data.dataset import load_dataset
    from neus2_tpu.engine.render import RenderConfig, render_image
    from neus2_tpu.ops.image import psnr as psnr_fn
    from neus2_tpu.ops.image import srgb_eval_target
    from neus2_tpu.ops.image import ssim as ssim_fn

    ds = load_dataset(test_transforms)
    cams = ds.cameras()
    images = ds.images_device()
    cfg = RenderConfig(
        field=tb.config.field,
        aabb_scale=tb.config.aabb_scale,
        min_transmittance=1e-4,
    )
    psnrs, ssims = [], []
    for i in range(ds.n_images):
        # Mixed-resolution datasets: render at the image's TRUE size and
        # crop the GT to it — the loader zero-pads images to the common max
        # resolution, and scoring over the padding region corrupts both
        # PSNR and SSIM.
        if ds.sizes is not None:
            w_i, h_i = (int(v) for v in ds.sizes[i])
        else:
            w_i, h_i = ds.resolution
        rgb, _, _ = render_image(
            tb.state.ema_params,
            tb.effective_acc,
            tb.state.occupancy,
            cams,
            cams.poses[i],
            cams.focal[i],
            cams.principal[i],
            jax.random.PRNGKey(i),
            cfg,
            background=0.0,
            spp=spp,
            resolution=(w_i, h_i),
            **tb._render_extras(),
        )
        target = srgb_eval_target(images[i][:h_i, :w_i])
        p = float(psnr_fn(rgb, target))
        s = float(ssim_fn(rgb, target))
        psnrs.append(p)
        ssims.append(s)
        log(f"  view {i}: PSNR {p:.2f}  SSIM {s:.4f}")
        if save_dir is not None:
            # Render / GT / |diff| panels (reference cal_psnr image dumps).
            import imageio.v2 as imageio

            save_dir.mkdir(parents=True, exist_ok=True)
            r8 = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
            t8 = (np.clip(np.asarray(target), 0, 1) * 255).astype(np.uint8)
            d8 = (np.clip(
                np.abs(np.asarray(rgb) - np.asarray(target)) * 4, 0, 1
            ) * 255).astype(np.uint8)
            imageio.imwrite(save_dir / f"view_{i:03d}.png",
                            np.concatenate([r8, t8, d8], axis=1))
            if mesh is not None:
                # reference frame_XXXXXX_mesh.png (render_utils.py:420)
                from neus2_tpu.native import render_mesh_image

                mrgb, _ = render_mesh_image(
                    np.asarray(mesh[0]), np.asarray(mesh[1]),
                    np.asarray(cams.poses[i]), np.asarray(cams.focal[i]),
                    np.asarray(cams.principal[i]), (w_i, h_i),
                    shaded=mesh_shaded,
                )
                imageio.imwrite(
                    save_dir / f"view_{i:03d}_mesh.png",
                    (np.clip(mrgb, 0, 1) * 255).astype(np.uint8),
                )
    return psnrs, ssims


def render_camera_path(
    tb, path_spec: str, n_frames: int, out_dir, spp: int, log,
    resolution=None,
):
    """Render a PNG frame sequence along a camera path (reference
    camera_path.cu spline + the GUI's path renderer; headless here).

    ``path_spec``: a CameraPath json (utils/camera_path.py format) or
    "orbit" for an automatic circular orbit around the scene center."""
    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp

    from neus2_tpu.engine.rays import Cameras
    from neus2_tpu.engine.render import RenderConfig, render_image
    from neus2_tpu.utils.camera_path import CameraPath, orbit_path

    if path_spec == "orbit":
        path = orbit_path()
    else:
        path = CameraPath.load(path_spec)
    if resolution is None:
        resolution = tb.dataset.resolution if tb.dataset else (800, 800)
    w, h = resolution
    cfg = RenderConfig(
        field=tb.config.field,
        aabb_scale=tb.config.aabb_scale,
        min_transmittance=1e-4,
    )
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    denom = n_frames if path.loop else max(n_frames - 1, 1)
    for k in range(n_frames):
        kf = path.eval(k / denom)
        focal = 0.5 * h / np.tan(0.5 * np.deg2rad(kf.fov_deg))
        pose = jnp.asarray(kf.pose, jnp.float32)
        cams = Cameras(
            poses=pose[None],
            focal=jnp.full((1, 2), focal, jnp.float32),
            principal=jnp.full((1, 2), 0.5, jnp.float32),
            resolution=(w, h),
        )
        rgb, _, _ = render_image(
            tb.state.ema_params, tb.effective_acc, tb.state.occupancy,
            cams, cams.poses[0], cams.focal[0], cams.principal[0],
            jax.random.PRNGKey(k), cfg, background=0.0, spp=spp,
            **tb._render_extras(),
        )
        frame = (np.clip(np.asarray(rgb), 0, 1) * 255).astype(np.uint8)
        fp = out_dir / f"frame_{k:04d}.png"
        imageio.imwrite(fp, frame)
        log(f"  rendered {fp}")
    return out_dir


def _load_obj_vertices(path):
    """Minimal OBJ vertex reader for Chamfer eval against reference meshes."""
    import numpy as np

    verts = []
    with open(path) as f:
        for line in f:
            if line.startswith("v "):
                parts = line.split()
                verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
    return np.asarray(verts, np.float32)


if __name__ == "__main__":
    main(sys.argv[1:])


def _make_per_frame_eval(log):
    """Per-frame PSNR on view 0 (reference run_dynamic.py:183-201)."""
    import jax
    import jax.numpy as jnp

    from neus2_tpu.engine.render import RenderConfig, render_image
    from neus2_tpu.ops.image import psnr as psnr_fn
    from neus2_tpu.ops.image import srgb_eval_target

    def hook(tb, frame_idx):
        cfg = RenderConfig(
            field=tb.config.field, aabb_scale=tb.config.aabb_scale,
            samples_per_ray=64, n_candidates=192,
        )
        cams = tb.cameras
        rgb, _, _ = render_image(
            tb.state.ema_params, tb.effective_acc, tb.state.occupancy, cams,
            cams.poses[0], cams.focal[0], cams.principal[0],
            jax.random.PRNGKey(0), cfg, background=0.0, spp=1,
            **tb._render_extras(),
        )
        target = srgb_eval_target(tb.images[0])
        log(f"frame {frame_idx} view-0 PSNR: {float(psnr_fn(rgb, target)):.2f} dB")

    return hook
