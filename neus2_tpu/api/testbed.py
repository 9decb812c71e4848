"""The Testbed API: the user-facing orchestrator (static + dynamic scenes).

Mirrors the surface the reference exposes through pybind11 (reference:
src/python_api.cu:317-616 — load_training_data, frame, train, render,
save/load_snapshot, compute_and_save_marching_cubes_mesh,
training_network_next_frame, loss scalars) and the dynamic-scene state machine
of Testbed::frame/train/training_network_next_frame (src/testbed.cu:1722,
2640-2712, 2001-2080; SURVEY.md §3.4).

Unlike the reference's GPU god-object, this is a thin host-side driver over
pure jitted functions: all state lives in a `TrainState` pytree; phase flags
(train_canonical / train_delta / use_delta) are static jit arguments that
change only at frame boundaries.
"""

from __future__ import annotations

import dataclasses
import json
import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from neus2_tpu.data.dataset import NerfDataset, list_frame_jsons, load_dataset
from neus2_tpu.engine import occupancy as occ_mod
from neus2_tpu.engine.render import RenderConfig, render_image
from neus2_tpu.engine import error_map as emap_mod
from neus2_tpu.engine.train import (
    TrainConfig,
    TrainState,
    init_cam_params,
    init_train_state,
    make_cam_optimizer,
    make_delta_optimizer,
    occupancy_update,
    rebuild_error_cdf,
    should_update_occupancy,
    train_step,
)
from neus2_tpu.models import delta as delta_mod
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.utils.meters import Meters
from neus2_tpu.utils.optim import make_optimizer


@dataclasses.dataclass
class Hyperparams:
    """Dynamic-scene hyperparameters (reference configs/nerf/base.json:121-134,
    defaults src/testbed.cu:2117-2139 / testbed.h:466-471)."""

    first_frame_max_training_step: int = 2000
    next_frame_max_training_step: int = 2000
    predict_global_movement: bool = True
    predict_global_movement_training_step: int = 50
    finetune_global_movement: bool = True
    # Coarse-to-fine pose refinement: run the delta phase under the natural
    # progressive-unlock schedule (coarse levels first) instead of the
    # reference's all-levels refinement — the identity-init attraction
    # basin at full flagship sharpness is ~cells-of-the-finest-level wide,
    # far smaller than realistic per-frame motion.  Default ON since
    # round 5: measured +4.4 dB mean / 2-3x smaller pose error on the
    # full-scale 48-view dynamic protocol AND +0.9 dB on the toy protocol
    # (PERF.md round-5 close); False restores reference behavior
    # (testbed.cu:2652-2657).
    refine_coarse_to_fine: bool = True
    mask_loss_weight: float = 0.0
    ek_loss_weight: float = 0.1
    # Reference default TRUE (testbed.h:474): re-seed the occupancy grid
    # after the pose-refinement phase moves the scene under it.
    reset_density_grid_after_global_movement: bool = True
    incremental_reinit_sdf_mlp: bool = False
    incremental_reinit_sdf_mlp_iters: int = 10
    anneal_end: int = 0
    # Constant-velocity motion prior (ours; not in the reference): start each
    # new frame's delta at the previous frame's converged delta instead of
    # identity.  For smoothly-moving scenes the pose-refinement phase then
    # starts ~one frame-motion closer to the optimum, cutting accumulated
    # drift.  The reference re-inits to identity every frame
    # (training_network_next_frame, testbed.cu:2001-2080).
    delta_motion_prior: bool = False


def config_from_json(path: str | Path) -> tuple[TrainConfig, Hyperparams]:
    """Build configs from a reference-style network config JSON
    (supports the ``parent`` inheritance of load_network_config,
    src/testbed.cu:139-162)."""
    path = Path(path)
    with open(path) as f:
        text = f.read()
    # Strip // comments (the reference's json parser allows them).
    text = "\n".join(l.split("//")[0] for l in text.splitlines())
    cfg = json.loads(text)
    while "parent" in cfg:
        with open(path.parent / cfg.pop("parent")) as f:
            parent = json.loads("\n".join(l.split("//")[0] for l in f.read().splitlines()))
        parent.update(cfg)
        cfg = parent

    enc = cfg.get("encoding", {})
    n_levels = int(enc.get("n_levels", 14))
    base_res = int(enc.get("base_resolution", 16))
    top_res = int(enc.get("top_resolution", 2048))
    grid = HashGridConfig(
        n_levels=n_levels,
        n_features_per_level=int(enc.get("n_features_per_level", 2)),
        log2_hashmap_size=int(enc.get("log2_hashmap_size", 19)),
        base_resolution=base_res,
        per_level_scale=enc.get(
            "per_level_scale",
            HashGridConfig.per_level_scale_from_top(base_res, top_res, n_levels),
        ),
        valid_level_scale=float(enc.get("valid_level_scale", 0.02)),
        base_valid_level_scale=float(enc.get("base_valid_level_scale", 0.2)),
        base_training_step=int(enc.get("base_training_step", 100)),
    )
    net = cfg.get("network", {})
    rgb_net = cfg.get("rgb_network", {})
    field = FieldConfig(
        grid=grid,
        sdf_hidden_dim=int(net.get("n_neurons", 64)),
        sdf_n_hidden=int(net.get("n_hidden_layers", 1)),
        rgb_hidden_dim=int(rgb_net.get("n_neurons", 64)),
        rgb_n_hidden=int(rgb_net.get("n_hidden_layers", 2)),
    )
    hp = cfg.get("hyperparams", {})
    hyper = Hyperparams(
        first_frame_max_training_step=int(hp.get("first_frame_max_training_step", 2000)),
        next_frame_max_training_step=int(hp.get("next_frame_max_training_step", 2000)),
        predict_global_movement=bool(hp.get("predict_global_movement", False)),
        predict_global_movement_training_step=int(
            hp.get("predict_global_movement_training_step", 50)
        ),
        # Unspecified-key defaults follow the reference's json parsing
        # (testbed.cu:2123-2131): finetune + reset-grid default TRUE.
        finetune_global_movement=bool(hp.get("finetune_global_movement", True)),
        mask_loss_weight=float(hp.get("mask_loss_weight", 0.0)),
        ek_loss_weight=float(hp.get("ek_loss_weight", 0.1)),
        reset_density_grid_after_global_movement=bool(
            hp.get("reset_density_grid_after_global_movement", True)
        ),
        incremental_reinit_sdf_mlp=bool(hp.get("incremental_reinit_sdf_mlp", False)),
        incremental_reinit_sdf_mlp_iters=int(hp.get("incremental_reinit_sdf_mlp_iters", 10)),
        anneal_end=int(hp.get("m_anneal_end", 0)),
    )
    loss_type = cfg.get("loss", {}).get("otype", "Huber")
    opt = cfg.get("optimizer", {})
    # Walk the Ema(ExponentialDecay(Adam)) nesting: each wrapper level
    # carries its own keys (reference create_optimizer, src/optimizer.cu).
    ema_decay = 0.95
    decay_start, decay_interval, decay_base = 20000, 10000, 0.33
    leaf = opt
    while True:
        otype = str(leaf.get("otype", "")).lower()
        if otype == "ema":
            ema_decay = float(leaf.get("decay", ema_decay))
        elif otype == "exponentialdecay":
            decay_start = int(leaf.get("decay_start", decay_start))
            decay_interval = int(leaf.get("decay_interval", decay_interval))
            decay_base = float(leaf.get("decay_base", decay_base))
        if "nested" not in leaf:
            break
        leaf = leaf["nested"]
    # Global-movement (delta) optimizer learning rate (base.json "globalmove").
    gm_leaf = cfg.get("globalmove", {}).get("optimizer", {})
    while "nested" in gm_leaf:
        gm_leaf = gm_leaf["nested"]
    delta_lr = float(gm_leaf.get("learning_rate", 1e-4))
    from neus2_tpu.utils.optim import OptimConfig

    train_cfg = TrainConfig(
        field=field,
        optim=OptimConfig(
            learning_rate=float(leaf.get("learning_rate", 1e-3)),
            after_learning_rate=float(
                leaf.get("after_learning_rate", leaf.get("learning_rate", 1e-3))
            ),
            beta1=float(leaf.get("beta1", 0.9)),
            beta2=float(leaf.get("beta2", 0.99)),
            epsilon=float(leaf.get("epsilon", 1e-15)),
            l2_reg=float(leaf.get("l2_reg", 1e-6)),
            # Per-component freeze map (reference adam.h:119-180); keys use
            # the reference component vocabulary, e.g. {"rgb_network": false}.
            components=tuple(
                sorted(
                    (str(k), bool(v))
                    for k, v in leaf.get(
                        "optimize_params_components", {}
                    ).items()
                )
            ),
            adabound=bool(leaf.get("adabound", False)),
            non_matrix_lr_factor=float(
                leaf.get("non_matrix_learning_rate_factor", 1.0)
            ),
            ema_decay=ema_decay,
            decay_start=decay_start,
            decay_interval=decay_interval,
            decay_base=decay_base,
        ),
        rgb_loss_type=loss_type,
        ek_loss_weight=hyper.ek_loss_weight,
        mask_loss_weight=hyper.mask_loss_weight,
        anneal_end=hyper.anneal_end,
        ema_decay=ema_decay,
        delta_lr=delta_lr,
        distortion_res=tuple(
            int(v) for v in cfg.get("distortion_map", {}).get(
                "resolution", (32, 32)
            )
        ),
    )
    return train_cfg, hyper


class Testbed:
    """Static & dynamic NeuS2 training driver."""

    def __init__(
        self,
        config: TrainConfig | None = None,
        hyper: Hyperparams | None = None,
        seed: int = 0,
        image_dtype=None,
    ):
        self.config = config or TrainConfig()
        self.hyper = hyper or Hyperparams()
        self.seed = seed
        # Device storage dtype for training images (None = fp32).  The
        # reference stores fp16 texels (nerf_loader.cu __half4 images);
        # jnp.float16 halves image HBM at the reference's own texel
        # precision — texels are cast to fp32 right after the gather
        # (engine/rays.py rays_from_pixels).
        self.image_dtype = image_dtype
        self.mesh = None  # set by enable_multichip()
        self.zero1 = False
        self.state: TrainState | None = None
        self.dataset: NerfDataset | None = None
        self.images = None
        self.cameras = None
        self.frame_jsons: list[Path] = []
        self.current_training_time_frame = 0
        self.training_step = 0  # step within current frame (m_training_step)
        self.train_canonical = True
        self.train_delta = False
        self.use_delta = False
        self.m_train = True
        self.loss_scalar = float("nan")
        self.ek_loss_scalar = float("nan")
        self.mask_loss_scalar = float("nan")
        self.last_aux = None  # most recent host-fetched StepAux (16-step cadence)
        # Adaptive (rays, samples) bucket state (testbed_nerf.cu:3434-3435
        # analog): bucket b trains with (n_rays*2^b, samples/2^b).
        self.batch_bucket = 0
        self._occ_len_ema = None
        self._bucket_votes = 0
        self._bucket_vote_target = None
        self.meters = Meters()
        # Called with the finished frame index just before a dynamic frame
        # switch (per-frame eval hook; reference run_dynamic.py:183-201).
        self.on_frame_complete = None
        self._frame_start_time = time.time()
        # -- pyngp-compatible scripting surface (python_api.cu:317-616) ----
        from neus2_tpu.api.compat import NerfView

        self.nerf = NerfView(self)
        # RGBA used when compositing eval renders (reference
        # m_background_color; scripts set [0,0,0,1] for the eval protocol —
        # that protocol value is the default here).
        self.background_color = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        self.rendering_min_transmittance = 1e-4
        self.render_with_camera_distortion = True
        self._sharpen = 0.0
        # Virtual render camera (reference m_camera / fov / screen_center):
        # None = render through training view 0's camera.
        self._render_pose = None  # (3, 4) camera-to-world, ngp convention
        self._fov_deg = None  # (fov_x, fov_y) degrees; None = dataset focal
        self.fov_axis = 1  # reference m_fov_axis default (y)
        self._screen_center = (0.5, 0.5)
        # Output controls (reference m_exposure / m_tonemap_curve,
        # render_buffer.cu:313-332): applied to every shade-mode render.
        self.exposure = 0.0
        self.tonemap_curve = "Identity"
        # Stored-only display knobs the scripts set (no display stack here):
        # accepted so ported scripts run unmodified.
        self.color_space = "sRGB"
        self.snap_to_pixel_centers = False

    # -- data ---------------------------------------------------------------

    def load_training_data(self, scene_path: str | Path, n_frames_cap=None):
        """Static scene (one json) or dynamic scene (dir of per-frame jsons)."""
        self.frame_jsons = list_frame_jsons(scene_path)
        self._datasets = None
        self._finish_load(n_frames_cap)

    def load_training_data_from_datasets(self, datasets: list[NerfDataset]):
        """In-memory datasets (synthetic scenes, tests); one per time frame."""
        self._datasets = list(datasets)
        self.frame_jsons = [Path(f"<memory:{i}>") for i in range(len(datasets))]
        self._finish_load(None)

    def _finish_load(self, n_frames_cap):
        self._load_frame(0, n_frames_cap)
        self._derive_config_and_init_state()

    def _derive_config_and_init_state(self):
        """Derive dataset-dependent config (cascades, candidates, probe
        budget, error-map resolution) and initialize a fresh TrainState."""
        if self.dataset.aabb_scale != self.config.aabb_scale:
            self.config = dataclasses.replace(
                self.config, aabb_scale=self.dataset.aabb_scale
            )
        # Occupancy cascades derive from aabb_scale: cascade k covers the
        # box of side 2^k, so a scale-S scene needs 1 + ceil(log2(S)) grids
        # (reference m_nerf.max_cascade from aabb_scale, testbed_nerf.cu:3293+
        # and NERF_CASCADES=8, nerf.h:24).
        import math

        want = 1 + max(0, math.ceil(math.log2(max(1, self.config.aabb_scale))))
        want = min(want, 8)
        if want > self.config.occ_cascades:
            self.config = dataclasses.replace(self.config, occ_cascades=want)
        # Marching candidates scale with the chord: exponential candidate
        # spacing ~ t*ln(tmax/tmin)/C must stay near the occupancy cell
        # size (the reference's cone constant 1/256 gives cell-sized steps,
        # engine/march.py) — a scale-S scene needs ~log2(S) more intervals
        # or occupied length is overestimated and samples dilute.
        if self.config.aabb_scale > 1:
            cand = min(
                512,
                self.config.n_candidates
                * (1 + math.ceil(math.log2(self.config.aabb_scale))),
            )
            if cand > self.config.n_candidates:
                self.config = dataclasses.replace(
                    self.config, n_candidates=cand
                )
        # Probe budget must cover the grid: the reference probes ALL
        # 128^3*cascades cells every step for the first 256 steps
        # (testbed_nerf.cu:4003-4016); our permutation sweep advances the
        # FULL n_probe per update (engine/occupancy.py probe_cells), so the
        # grid is swept in n_cells/n_probe updates — size it to finish one
        # full sweep within those 256 early updates.
        from neus2_tpu.constants import NERF_GRIDSIZE

        n_cells = self.config.occ_cascades * NERF_GRIDSIZE**3
        need = 1 << max(0, (n_cells // 256 - 1)).bit_length()
        if need > self.config.occ_n_probe:
            self.config = dataclasses.replace(self.config, occ_n_probe=need)
        # Error-map resolution from the first accumulation window's sample
        # budget (reference sizing, testbed_nerf.cu:3479-3482) — static here,
        # computed once at load (fixed shapes under jit).
        if self.config.use_error_map:
            res = emap_mod.resolution_for(
                self.config.n_rays,
                self.dataset.n_images,
                min(self.dataset.resolution),
            )
            if res != self.config.error_map_res:
                self.config = dataclasses.replace(
                    self.config, error_map_res=res
                )
        # Dataset-provided environment map (json "envmap" image, reference
        # nerf_loader.cu:498-511): enable the envmap subsystem at the
        # image's resolution; the map stays trainable (reference m_envmap
        # trainer) but starts from the data instead of near-zero.
        env = getattr(self.dataset, "envmap", None)
        if env is not None:
            self.config = dataclasses.replace(
                self.config,
                use_envmap=True,
                envmap_res=tuple(int(s) for s in env.shape[:2]),
            )
        self.state = init_train_state(
            jax.random.PRNGKey(self.seed), self.config, self.dataset.n_images
        )
        if env is not None:
            cam = dict(self.state.cam)
            cam["envmap"] = jnp.asarray(env, jnp.float32)
            self.state = self.state._replace(cam=cam)
        # Step-0 whole-grid probe sweep (reference training_prep_nerf
        # analog): mark the geometric init's reachable shell before the
        # first training step.
        from neus2_tpu.engine.train import occupancy_prior_sweep

        self.state = occupancy_prior_sweep(self.state, self.config)
        if self.mesh is not None:
            self.state = self._place_state(self.state)
        self._frame_start_time = time.time()

    def _load_frame(self, idx: int, n_frames_cap=None):
        if getattr(self, "_datasets", None) is not None:
            self.dataset = self._datasets[idx]
        else:
            self.dataset = load_dataset(self.frame_jsons[idx], n_frames_cap)
        self.cameras = self.dataset.cameras()
        if self.config.include_sharpness_in_error:
            # Load-time per-image sharpness grids (reference
            # compute_sharpness at dataset load, nerf_loader.cu:129-178;
            # 128x72 cells).
            from neus2_tpu.ops.image import sharpness_maps

            self.cameras = self.cameras._replace(
                sharpness=jnp.asarray(sharpness_maps(self.dataset.images))
            )
        self.depths = self.dataset.depths_device()
        self._refresh_images()

    def _refresh_images(self):
        """(Re)build the device image array from the dataset's pristine host
        copy, applying the load-time sharpen filter if set (reference
        nerf_loader.cu:808-825 via testbed.nerf.sharpen)."""
        if self.dataset is None:
            return
        if self._sharpen > 0.0:
            from neus2_tpu.api.compat import sharpen_images

            imgs = sharpen_images(
                np.asarray(self.dataset.images, np.float32), self._sharpen
            )
            self.images = jnp.asarray(imgs, self.image_dtype or jnp.float32)
        else:
            self.images = self.dataset.images_device(self.image_dtype)
        self._place_batch_data()

    def _place_batch_data(self):
        """Replicate images/cameras/depths over the mesh.  Required for
        multi-HOST meshes (every process holds the full array; jit needs
        explicitly-sharded global arrays), harmless single-process."""
        if self.mesh is None or self.images is None:
            return
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(self.mesh, PartitionSpec())
        put = lambda t: jax.tree_util.tree_map(
            lambda x: jax.device_put(x, rep), t
        )
        self.images = put(self.images)
        self.cameras = put(self.cameras)
        if self.depths is not None:
            self.depths = put(self.depths)

    def enable_multichip(self, devices=None, zero1: bool = False) -> int:
        """Turn on data-parallel training over all (or the given) devices.

        Rays are sharded across the mesh (``config.n_rays`` stays the GLOBAL
        batch; each chip draws n_rays/n_devices), params are replicated and
        gradients psum over ICI (parallel/train.py — the reference is
        single-GPU, SURVEY §2.4; this is the TPU framework's north star).

        ``zero1``: additionally shard the hash-table gradient reduction +
        optimizer state over the mesh (psum_scatter / sharded Adam /
        all_gather — parallel/train.py _train_step_zero1).
        Returns the device count in use.
        """
        from neus2_tpu.parallel.train import make_mesh

        devices = devices if devices is not None else jax.devices()
        if len(devices) <= 1:
            self.mesh = None
            self.zero1 = False
            return 1
        self.mesh = make_mesh(devices)
        self.zero1 = zero1
        if self.state is not None:
            self.state = self._place_state(self.state)
        self._place_batch_data()
        return len(devices)

    def _place_state(self, state):
        """Mesh placement for the current parallel mode."""
        from neus2_tpu.parallel.train import replicate_state, shard_state_zero1

        if getattr(self, "zero1", False):
            return shard_state_zero1(state, self.mesh)
        return replicate_state(state, self.mesh)

    @property
    def n_devices(self) -> int:
        return self.mesh.devices.size if self.mesh is not None else 1

    @property
    def all_training_time_frame(self) -> int:
        return len(self.frame_jsons)

    @property
    def is_dynamic(self) -> bool:
        return len(self.frame_jsons) > 1

    # -- pyngp-compatible scripting surface (python_api.cu:317-616) ---------

    @property
    def shall_train(self) -> bool:
        """Training enable toggle (reference m_train / shall_train)."""
        return self.m_train

    @shall_train.setter
    def shall_train(self, v: bool):
        self.m_train = bool(v)

    @property
    def loss(self) -> float:
        return self.loss_scalar

    @property
    def ek_loss(self) -> float:
        return self.ek_loss_scalar

    @property
    def mask_loss(self) -> float:
        return self.mask_loss_scalar

    @property
    def n_params(self) -> int:
        """Trainable parameter count (reference python_api n_params)."""
        return sum(
            int(np.prod(l.shape))
            for l in jax.tree_util.tree_leaves(self.state.params)
        )

    @property
    def n_encoding_params(self) -> int:
        """Hash-encoding parameter count (reference n_encoding_params)."""
        tables = {
            k: v for k, v in self.state.params.items()
            if k.startswith("hashgrid")
        }
        return sum(
            int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(tables)
        )

    @property
    def first_frame_max_training_step(self) -> int:
        return self.hyper.first_frame_max_training_step

    @first_frame_max_training_step.setter
    def first_frame_max_training_step(self, v: int):
        self.hyper.first_frame_max_training_step = int(v)

    @property
    def next_frame_max_training_step(self) -> int:
        return self.hyper.next_frame_max_training_step

    @next_frame_max_training_step.setter
    def next_frame_max_training_step(self, v: int):
        self.hyper.next_frame_max_training_step = int(v)

    # -- virtual render camera (reference m_camera / fov / screen_center) --

    def set_nerf_camera_matrix(self, mat):
        """Set the render camera from a nerf-convention 3x4 (or 4x4) matrix,
        e.g. a row of a transforms.json (reference set_nerf_camera_matrix,
        python_api.cu — applies nerf_matrix_to_ngp with the dataset's
        scale/offset)."""
        from neus2_tpu.data.dataset import nerf_matrix_to_ngp

        mat = np.asarray(mat, np.float32)
        self._render_pose = nerf_matrix_to_ngp(
            mat,
            self.dataset.scale,
            np.asarray(self.dataset.offset, np.float32),
            getattr(self.dataset, "from_na", False),
        )

    def set_camera_to_training_view(self, i: int):
        """Adopt training view i's pose, fov and principal point as the
        current render camera (reference set_camera_to_training_view)."""
        i = int(i)
        self._render_pose = np.asarray(self.cameras.poses[i])
        res = np.asarray(
            self.dataset.sizes[i]
            if getattr(self.dataset, "sizes", None) is not None
            else self.dataset.resolution,
            np.float32,
        )
        f = np.asarray(self.cameras.focal[i], np.float32)
        self._fov_deg = (
            "xy",
            tuple(float(v) for v in np.degrees(2.0 * np.arctan2(0.5 * res, f))),
        )
        self._screen_center = tuple(
            float(v) for v in np.asarray(self.cameras.principal[i])
        )

    @property
    def fov(self) -> float:
        """Field of view along ``fov_axis``, degrees (reference fov)."""
        return self.fov_xy[self.fov_axis]

    @fov.setter
    def fov(self, deg: float):
        # Isotropic: one focal length (square pixels) derived from the
        # fov_axis side, like the reference's relative-focal representation.
        self._fov_deg = ("iso", float(deg))

    @property
    def fov_xy(self) -> tuple:
        if self._fov_deg is not None and self._fov_deg[0] == "xy":
            return tuple(self._fov_deg[1])
        res = np.asarray(self.dataset.resolution, np.float32)
        if self._fov_deg is not None:  # iso: same focal both axes
            side = res[self.fov_axis]
            f = 0.5 * side / np.tan(np.radians(self._fov_deg[1]) / 2.0)
            focal = np.array([f, f], np.float32)
        else:
            focal = np.asarray(self.cameras.focal[0], np.float32)
        return tuple(
            float(v) for v in np.degrees(2.0 * np.arctan2(0.5 * res, focal))
        )

    @fov_xy.setter
    def fov_xy(self, xy):
        self._fov_deg = ("xy", (float(xy[0]), float(xy[1])))

    @property
    def screen_center(self) -> tuple:
        return self._screen_center

    @screen_center.setter
    def screen_center(self, c):
        self._screen_center = (float(c[0]), float(c[1]))

    def _focal_for(self, resolution) -> np.ndarray:
        """Render-camera focal length in pixels at the given (W, H)."""
        W, H = resolution
        res = np.array([W, H], np.float32)
        if self._fov_deg is None:
            # Keep the dataset view's fov: scale its pixel focal by the
            # output/dataset size ratio along fov_axis.
            base = np.asarray(self.cameras.focal[0], np.float32)
            ratio = res[self.fov_axis] / float(
                self.dataset.resolution[self.fov_axis]
            )
            return base * ratio
        if self._fov_deg[0] == "iso":
            f = 0.5 * res[self.fov_axis] / np.tan(
                np.radians(self._fov_deg[1]) / 2.0
            )
            return np.array([f, f], np.float32)
        fx, fy = self._fov_deg[1]
        return np.array(
            [
                0.5 * W / np.tan(np.radians(fx) / 2.0),
                0.5 * H / np.tan(np.radians(fy) / 2.0),
            ],
            np.float32,
        )

    def change_to_frame(self, idx: int):
        """Switch the active dynamic frame for eval rendering (reference
        change_to_frame; run_dynamic.py renders each frame after loading
        its per-frame snapshot)."""
        self.current_training_time_frame = int(idx)
        self._load_frame(int(idx))
        self.prepare_for_test()

    def reload_network_from_file(self, path: str | Path):
        """Rebuild configs from a network-config json and reinitialize the
        network, keeping the loaded training data (reference
        reload_network_from_file, python_api.cu)."""
        cfg, hyper = config_from_json(path)
        self.config, self.hyper = cfg, hyper
        if self.dataset is not None:
            self._derive_config_and_init_state()
            self.training_step = 0

    # -- training loop ------------------------------------------------------

    def _max_steps_this_frame(self) -> int:
        if self.current_training_time_frame == 0:
            return self.hyper.first_frame_max_training_step
        return self.hyper.next_frame_max_training_step

    def frame(self) -> bool:
        """One training iteration + dynamic-frame bookkeeping
        (reference Testbed::frame, testbed.cu:1722-1766). Returns False when
        training is finished."""
        if not self.m_train or self.state is None:
            return False
        if self.training_step >= self._max_steps_this_frame():
            if self.on_frame_complete is not None:
                self.on_frame_complete(self, self.current_training_time_frame)
            if not self.training_network_next_frame():
                return False
        self.train()
        return True

    def train(self):
        """One optimization step (reference Testbed::train, testbed.cu:2640)."""
        state = self.state
        cfg = self._frame_config()

        # Phase switch at the global-movement boundary (testbed.cu:2659-2667).
        if (
            self.current_training_time_frame >= 1
            and self.training_step == self.hyper.predict_global_movement_training_step
        ):
            self.train_canonical = True
            if not self.hyper.finetune_global_movement:
                self.train_delta = False
            if self.hyper.reset_density_grid_after_global_movement:
                state = state._replace(
                    occupancy=occ_mod.reset_density(state.occupancy)
                )

        with self.meters.scope("training_prep"):
            if should_update_occupancy(self.training_step):
                state = occupancy_update(state, cfg)
            if cfg.use_error_map and emap_mod.should_rebuild(self.training_step):
                state = rebuild_error_cdf(state)

        with self.meters.scope("training"):
            if self.mesh is not None:
                from neus2_tpu.parallel.train import parallel_train_step

                per_dev = max(1, cfg.n_rays // self.n_devices)
                state, aux = parallel_train_step(
                    state,
                    self.images,
                    self.cameras,
                    dataclasses.replace(cfg, n_rays=per_dev),
                    self.mesh,
                    train_canonical=self.train_canonical,
                    train_delta=self.train_delta,
                    use_delta=self.use_delta,
                    depths=(
                        self.depths
                        if cfg.depth_supervision_lambda > 0.0
                        else None
                    ),
                    zero1=self.zero1 and self.train_canonical,
                )
            else:
                state, aux = train_step(
                    state,
                    self.images,
                    self.cameras,
                    cfg,
                    train_canonical=self.train_canonical,
                    train_delta=self.train_delta,
                    use_delta=self.use_delta,
                    depths=(
                        self.depths
                        if cfg.depth_supervision_lambda > 0.0
                        else None
                    ),
                )
        self.state = state
        self.training_step += 1
        # 16-step fetch cadence (reference get_loss_scalar, testbed.cu:2714);
        # also fetch on the very first step after init/resume so loss_scalar
        # never reports its NaN placeholder (a resumed run's first %100 log
        # line used to print loss=nan — cosmetic but alarming).
        if self.training_step % 16 == 0 or self.last_aux is None:
            a = jax.device_get(aux)
            self.last_aux = a
            self.loss_scalar = float(a.loss)
            self.ek_loss_scalar = float(a.ek_loss)
            self.mask_loss_scalar = float(a.mask_loss)
            self._update_batch_bucket(float(a.mean_occ_len))
            # Zero-sample abort (reference train_nerf, testbed_nerf.cu:
            # 3542-3548): a batch with no marched samples means the
            # occupancy grid and the cameras disagree entirely — training
            # can only produce NaNs from here, so warn and stop.  Checked
            # on the existing 16-step fetch: no extra host sync.
            if int(a.n_valid_samples) == 0:
                print(
                    "WARNING: training generated 0 samples; the scene "
                    "geometry is outside the occupancy grid or all rays "
                    "miss the AABB. Training aborted.",
                    flush=True,
                )
                self.m_train = False

    def _update_batch_bucket(self, occ_len: float):
        """Adaptive (rays, samples) bucket: once the occupancy grid tightens,
        fewer samples/ray reach the reference's marching density
        (STEPSIZE = sqrt(3)/1024), so trade samples for rays at constant
        sample budget (reference rays/batch auto-tune analog,
        testbed_nerf.cu:3434-3435).  Hysteresis: 3 consecutive agreeing
        reads before switching buckets (each bucket is its own jit cache
        entry)."""
        if not self.config.adaptive_batch or not self.train_canonical:
            return
        if not (occ_len == occ_len) or occ_len <= 0.0:
            return
        from neus2_tpu.engine.train import desired_batch_bucket

        ema = self._occ_len_ema
        self._occ_len_ema = occ_len if ema is None else 0.8 * ema + 0.2 * occ_len
        desired = desired_batch_bucket(self._occ_len_ema, self.config)
        if desired != self.batch_bucket:
            # Votes must agree on the SAME target bucket: reset the counter
            # when the desired value changes, or 3 mixed disagreeing reads
            # near a boundary would trigger a switch (each switch costs a
            # fresh multi-minute TPU compile).
            if desired != self._bucket_vote_target:
                self._bucket_vote_target = desired
                self._bucket_votes = 0
            self._bucket_votes += 1
            if self._bucket_votes >= 3:
                b = desired
                print(
                    f"[neus2-tpu] adaptive batch bucket {self.batch_bucket}"
                    f" -> {b}: {self.config.n_rays << b} rays x "
                    f"{self.config.samples_per_ray >> b} samples "
                    f"(occ_len {self._occ_len_ema:.3f}, step "
                    f"{self.training_step})",
                    flush=True,
                )
                self.batch_bucket = desired
                self._bucket_votes = 0
        else:
            self._bucket_votes = 0

    def _frame_config(self) -> TrainConfig:
        cfg = self.config
        changes = {}
        if self.batch_bucket > 0 and self.train_canonical:
            b = self.batch_bucket
            changes["n_rays"] = cfg.n_rays << b
            changes["samples_per_ray"] = cfg.samples_per_ray >> b
        if self.hyper.anneal_end != cfg.anneal_end:
            changes["anneal_end"] = self.hyper.anneal_end
        if self.hyper.ek_loss_weight != cfg.ek_loss_weight:
            changes["ek_loss_weight"] = self.hyper.ek_loss_weight
        if self.hyper.mask_loss_weight != cfg.mask_loss_weight:
            changes["mask_loss_weight"] = self.hyper.mask_loss_weight
        if self.train_delta and not self.train_canonical:
            # Pure pose refinement: small ray batch (TrainConfig.delta_n_rays).
            changes["n_rays"] = min(cfg.n_rays, cfg.delta_n_rays)
            # No hit-ray compaction while the pose is being refined: the
            # candidate probe selects rays by occupancy hits, and during
            # refinement occupancy reflects the STALE pose — biasing the
            # batch toward where the object WAS and starving the rays
            # that would pull it to where it IS.  Measured on the r5
            # 48-view @256^2 flagship dynamic run: with compaction on in
            # this phase, frame-2 pose error blew up to 0.376 (vs ~0.03
            # expected); the toy-scale protocols that validated pose
            # recovery all ran pre-compaction-default.
            changes["hit_oversample"] = 1
        if self.current_training_time_frame > 0:
            # Frames >= 1: the progressive grid unlock runs on the offset
            # step so the pose-refinement phase sees all levels
            # (testbed.cu:2652-2657).  NOTE the rgb loss intentionally stays
            # as configured: training_network_next_frame's
            # loss_config["otype"]="L2" (testbed.cu:2038) only rebuilds the
            # tcnn Loss object, which the NeRF path BYPASSES
            # (testbed.cu:2386-2389); the loss actually used,
            # m_nerf.training.loss_type, is re-read from the unmodified
            # embedded config at the incremental snapshot reload
            # (testbed.cu:2383) and remains Huber.  Empirically an L2 switch
            # also degrades pose recovery on the moving-sphere scene.
            if self.hyper.predict_global_movement:
                if self.hyper.refine_coarse_to_fine:
                    # Coarse-to-fine pose refinement (ours; measured lever
                    # for large per-frame motion at flagship sharpness —
                    # PERF.md round-5 close): let the delta phase run the
                    # natural progressive-unlock schedule from frame_step 0
                    # (few coarse levels first, fine levels joining as the
                    # pose closes in) instead of forcing all levels.  The
                    # canonical phase after refinement sees all levels
                    # regardless (frame_step is past the unlock by then for
                    # typical next_frame budgets; the offset stays 0).
                    pass
                else:
                    # Reference behavior: the refinement phase sees every
                    # level (testbed.cu:2652-2657).
                    changes["valid_level_step_offset"] = (
                        self.hyper.predict_global_movement_training_step
                    )
        if (
            self.current_training_time_frame > 0
            and cfg.optim.after_learning_rate != cfg.optim.learning_rate
        ):
            # Next-frame lr override (reference after_learning_rate).
            changes["optim"] = dataclasses.replace(
                cfg.optim, learning_rate=cfg.optim.after_learning_rate
            )
        return dataclasses.replace(cfg, **changes) if changes else cfg

    def training_network_next_frame(self) -> bool:
        """Advance the dynamic-scene state machine
        (reference testbed.cu:2001-2080). Returns False on the last frame."""
        if self.current_training_time_frame >= self.all_training_time_frame - 1:
            return False
        self.current_training_time_frame += 1
        self._load_frame(self.current_training_time_frame)

        state = self.state
        # Fold the converged per-frame delta into the accumulated transform
        # (accumulate_global_movement, nerf_network.h:1163) and reset it —
        # to identity (reference), or to the previous frame's delta when the
        # constant-velocity motion prior is on (see Hyperparams).
        next_delta = (
            jax.tree_util.tree_map(jnp.copy, state.delta)
            if self.hyper.delta_motion_prior
            else delta_mod.init_delta()
        )
        state = state._replace(
            acc=delta_mod.accumulate_delta(state.acc, state.delta),
            delta=next_delta,
        )
        if self.config.field.residual_grid:
            # DynamicGrid: freeze this frame's grid into the base, train a
            # fresh residual for the next frame (double_hash_grid.h).
            from neus2_tpu.models.field import freeze_grid_into_base

            state = state._replace(
                params=freeze_grid_into_base(state.params),
                ema_params=freeze_grid_into_base(state.ema_params),
            )
        # Fresh optimizer state, keep params (reset_network_incremental,
        # testbed.cu:2351 via save/load_snapshot_incremental).
        tx = make_optimizer(self.config.optim)
        dtx = make_delta_optimizer(self.config)
        cam = init_cam_params(self.dataset.n_images, self.config)
        state = state._replace(
            opt_state=tx.init(state.params),
            delta_opt_state=dtx.init(delta_mod.init_delta()),
            cam=cam,
            cam_opt_state=make_cam_optimizer(self.config).init(cam),
            error_map=emap_mod.init_error_map(
                self.dataset.n_images,
                self.config.error_map_res,
                sharpness_cells=(
                    self.config.occ_cascades * occ_mod.NERF_GRIDSIZE**3
                    if self.config.include_sharpness_in_error
                    else 0
                ),
            ),
            frame_step=jnp.zeros((), jnp.int32),
        )
        if (
            self.hyper.incremental_reinit_sdf_mlp
            and self.current_training_time_frame
            % self.hyper.incremental_reinit_sdf_mlp_iters
            == 0
        ):
            from neus2_tpu.models.field import init_field

            fresh = init_field(jax.random.PRNGKey(1337), self.config.field)
            params = dict(state.params)
            params["sdf_mlp"] = fresh["sdf_mlp"]
            ema = dict(state.ema_params)
            ema["sdf_mlp"] = jax.tree_util.tree_map(jnp.copy, fresh["sdf_mlp"])
            state = state._replace(params=params, ema_params=ema)

        self.state = state
        self.training_step = 0
        # Pose-refinement phase first (testbed.cu:2074-2078).
        self.train_canonical = False
        self.train_delta = bool(self.hyper.predict_global_movement)
        self.use_delta = self.train_delta
        self._frame_start_time = time.time()
        return True

    def prepare_for_test(self):
        """Set the delta gate for test rendering (testbed.cu:1987-1999).

        Reference semantics: frame 0 (or no delta prediction) renders without
        the per-frame delta; frames >= 1 with a learned delta render WITH it
        (under the shipped config, ``finetune_global_movement=true`` keeps
        m_train_delta alive through the frame, so m_use_delta stays true at
        eval).  We key on predict_global_movement rather than train_delta:
        with finetune=false the reference silently stops applying the
        converged delta after the refinement boundary — dropping the very
        alignment it just learned — which is a latent upstream bug its
        shipped config never exercises.
        """
        self.use_delta = (
            self.current_training_time_frame > 0
            and bool(self.hyper.predict_global_movement)
        )

    # -- rendering / eval ---------------------------------------------------

    @property
    def effective_acc(self):
        """The rigid transform renders must apply: the accumulated R|t,
        composed with the live per-frame delta while it is active.

        During frame k >= 1 the converged delta has NOT yet been folded into
        ``state.acc`` (folding happens at the next frame switch,
        training_network_next_frame); the train step applies acc to rays and
        the delta to samples (engine/train.py).  Rendering with only
        ``state.acc`` would therefore be misaligned with the frame's images
        by exactly the per-frame motion.  accumulate_delta composes the two
        maps identically to the train path (models/delta.py)."""
        if self.use_delta:
            return delta_mod.accumulate_delta(self.state.acc, self.state.delta)
        return self.state.acc

    def _default_render_cfg(self) -> RenderConfig:
        return RenderConfig(
            field=self.config.field,
            aabb_scale=self.config.aabb_scale,
            min_transmittance=self.rendering_min_transmittance,
        )

    def _render_cameras(self):
        """The dataset cameras, with the lens model stripped when
        render_with_camera_distortion is off (reference
        m_nerf.render_with_camera_distortion)."""
        cams = self.cameras
        if not self.render_with_camera_distortion and cams.distortion is not None:
            cams = cams._replace(distortion=None)
        return cams

    def render(
        self,
        *args,
        img_idx: int | None = None,
        spp: int = 1,
        background: float | None = None,
        render_cfg: RenderConfig | None = None,
        use_ema: bool = True,
        linear: bool = False,
        mode: str = "shade",
    ):
        """Render.  Two call forms, disambiguated by positional arity:

        * ``render(width, height[, spp[, linear]])`` — two or more
          positional arguments: the reference pybind signature
          (python_api.cu:317).  Renders the CURRENT camera (see
          set_nerf_camera_matrix / set_camera_to_training_view / fov /
          screen_center) at the given resolution, composited over
          ``background_color``; returns one (H, W, 4) float RGBA array
          (linear=True converts the sRGB output back to linear radiance,
          matching the reference's linear framebuffer reads).
        * ``render(i)`` / ``render(img_idx=i, spp=..., ...)`` — at most one
          positional argument: render training view i at its native
          resolution; returns (rgb, depth, alpha) as before.
        """
        if len(args) >= 2:  # pyngp form: (width, height[, spp[, linear]])
            width, height = int(args[0]), int(args[1])
            ref_spp = int(args[2]) if len(args) > 2 else spp
            ref_linear = bool(args[3]) if len(args) > 3 else linear
            return self._render_current_camera(
                width, height, spp=ref_spp, linear=ref_linear,
                render_cfg=render_cfg, use_ema=use_ema, mode=mode,
            )
        if args:
            img_idx = int(args[0])
        img_idx = 0 if img_idx is None else img_idx
        cfg = render_cfg or self._default_render_cfg()
        params = self.state.ema_params if use_ema else self.state.params
        bg = (
            jnp.asarray(self.background_color[:3])
            if background is None
            else background
        )
        cams = self._render_cameras()
        rgb, depth, alpha = render_image(
            params,
            self.effective_acc,
            self.state.occupancy,
            cams,
            cams.poses[img_idx],
            cams.focal[img_idx],
            cams.principal[img_idx],
            jax.random.PRNGKey(7),
            cfg,
            background=bg,
            spp=spp,
            mode=mode,
            # Mixed-resolution datasets: render at the image's true size.
            resolution=(
                tuple(int(v) for v in self.dataset.sizes[img_idx])
                if getattr(self.dataset, "sizes", None) is not None
                else None
            ),
            **self._render_extras(),
        )
        if linear:
            from neus2_tpu.ops.losses import srgb_to_linear

            rgb = srgb_to_linear(jnp.asarray(rgb))
        return np.asarray(rgb), np.asarray(depth), np.asarray(alpha)

    def _render_extras(self) -> dict:
        """Learned render-time extras for render_image: the trained envmap
        backgrounds non-hit rays (reference init_rays_from_camera,
        testbed_nerf.cu:2298-2299), the learned distortion grid warps ray
        generation (2208-2331), and exposure/tonemap are the render-buffer
        output controls (render_buffer.cu:313-332)."""
        cam = self.state.cam
        return {
            "envmap": cam["envmap"] if self.config.use_envmap else None,
            "distortion": (
                cam["distortion"]
                if self.config.use_distortion
                and self.render_with_camera_distortion
                else None
            ),
            "exposure": float(self.exposure),
            "tonemap": str(self.tonemap_curve),
        }

    def _render_current_camera(
        self, width: int, height: int, spp: int = 1, linear: bool = False,
        render_cfg: RenderConfig | None = None, use_ema: bool = True,
        mode: str = "shade",
    ):
        """Reference-signature render: current camera, RGBA out."""
        spp = int(spp) if spp else 1
        cfg = render_cfg or self._default_render_cfg()
        params = self.state.ema_params if use_ema else self.state.params
        cams = self._render_cameras()
        pose = (
            self._render_pose
            if self._render_pose is not None
            else np.asarray(cams.poses[0])
        )
        rgb, depth, alpha = render_image(
            params,
            self.effective_acc,
            self.state.occupancy,
            cams,
            jnp.asarray(pose, jnp.float32),
            jnp.asarray(self._focal_for((width, height)), jnp.float32),
            jnp.asarray(self._screen_center, jnp.float32),
            jax.random.PRNGKey(7),
            cfg,
            background=jnp.asarray(self.background_color[:3]),
            spp=spp,
            mode=mode,
            resolution=(int(width), int(height)),
            **self._render_extras(),
        )
        if linear:
            from neus2_tpu.ops.losses import srgb_to_linear

            rgb = srgb_to_linear(jnp.asarray(rgb))
        return np.concatenate(
            [np.asarray(rgb), np.asarray(alpha)[..., None]], axis=-1
        )

    def compute_and_save_marching_cubes_mesh(
        self, path: str | Path, resolution: int = 256, thresh: float = 0.0,
        with_colors: bool = True, keep_largest_component: bool = False,
        with_normals: bool = True, aabb=None,
    ):
        """Reference python_api surface (python_api.cu:382; SURVEY §3.5).

        Exports carry 1-ring vertex normals (reference accumulate_1ring,
        marching_cubes.cu:331) and, for PLY, per-vertex sRGB colors from the
        RGB head (compute_mesh_vertex_colors, testbed_nerf.cu:4071).
        ``keep_largest_component`` drops floater blobs in never-observed
        regions (the mask-free analog of the reference DTU protocol's
        object-mask cropping)."""
        from neus2_tpu.engine.mesh import (
            extract_mesh, largest_component, save_mesh_obj, save_mesh_ply,
            vertex_colors, vertex_normals,
        )
        from neus2_tpu.ops.warp import scene_aabb

        # ``aabb``: optional crop box ((lo3), (hi3)) in warped coordinates —
        # the pyngp surface takes a BoundingBox arg (python_api.cu:382;
        # run_dynamic.py passes bbox_min/bbox_max to crop per-frame meshes).
        # The crop only limits WHERE the SDF grid is sampled (extract_mesh's
        # ``box``); the field is always queried in the scene warp frame
        # (``aabb``) — passing the crop as the warp box would evaluate the
        # SDF at wrong positions and distort the mesh.
        scene_box = scene_aabb(self.config.aabb_scale)
        if aabb is None:
            crop = scene_box
        elif not hasattr(aabb, "lo"):
            from neus2_tpu.ops.warp import AABB

            lo, hi = aabb
            crop = AABB(jnp.asarray(lo, jnp.float32),
                        jnp.asarray(hi, jnp.float32))
        else:
            crop = aabb
        verts, tris = extract_mesh(
            self.state.ema_params,
            self.config.field,
            resolution=resolution,
            box=crop,
            aabb=scene_box,
            thresh=thresh,
        )
        if keep_largest_component and len(verts):
            verts, tris = largest_component(verts, tris)
        path = Path(path)
        normals = (
            vertex_normals(verts, tris) if (with_normals and len(verts)) else None
        )
        if path.suffix == ".ply":
            colors = None
            if with_colors and len(verts):
                colors = np.asarray(
                    vertex_colors(
                        self.state.ema_params, self.config.field,
                        jnp.asarray(verts, jnp.float32),
                        scene_box.lo, scene_box.diag,
                    )
                )
            save_mesh_ply(
                path, verts, tris, scale=self.dataset.scale,
                offset=self.dataset.offset, colors=colors, normals=normals,
            )
        else:
            save_mesh_obj(
                path, verts, tris,
                scale=self.dataset.scale, offset=self.dataset.offset,
                normals=normals,
            )
        return verts, tris

    def save_transform(self, path: str | Path):
        """Export the accumulated R|t as text (testbed.cu:3118-3141).

        Uses effective_acc so a live per-frame delta (the final frame's is
        never folded — training_network_next_frame returns False there) is
        included, matching what eval renders actually apply."""
        acc = jax.device_get(self.effective_acc)
        with open(path, "w") as f:
            rot = np.asarray(acc["rotation"])
            tr = np.asarray(acc["transition"])
            for i in range(3):
                f.write(" ".join(f"{v:.8f}" for v in rot[i]) + f" {tr[i]:.8f}\n")

    # -- snapshots ----------------------------------------------------------

    def save_snapshot(self, path: str | Path, incremental: bool = False):
        """Serialize the full training state (reference save_snapshot,
        testbed.cu:3144-3196; msgpack via flax.serialization)."""
        from flax import serialization

        state = jax.device_get(self.state)
        if incremental:
            # Incremental snapshots omit optimizer state (rebuilt fresh per
            # frame — reference save_snapshot_incremental, testbed.cu:3180).
            state = state._replace(
                opt_state=(), delta_opt_state=()
            )
        # msgpack has no tuple type: store leaves keyed by their pytree path
        # so snapshots stay loadable when TrainState grows new fields.
        flat, _ = jax.tree_util.tree_flatten_with_path(state)
        leaves = {
            jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat
        }
        payload = {
            "leaves": leaves,
            "format": "pathdict-v1",
            "incremental": incremental,
            "meta": {
                "training_step": np.int32(self.training_step),
                "frame": np.int32(self.current_training_time_frame),
                "aabb_scale": np.int32(self.config.aabb_scale),
            },
        }
        # Atomic write: device_get over the tunnel can take tens of seconds
        # and a snapshot killed mid-write must not corrupt the resume point.
        path = Path(path)
        tmp = path.with_name(path.name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))
        os.replace(tmp, path)

    def load_snapshot(self, path: str | Path):
        from flax import serialization

        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        if isinstance(payload, dict) and "snapshot" in payload:
            # Reference-format (instant-ngp/NeuS2) msgpack snapshot
            # (testbed.cu:3197-3254) — route to the interop shim.
            return self.load_reference_snapshot(path)
        if self.state is None:
            self.state = init_train_state(
                jax.random.PRNGKey(self.seed), self.config,
                self.dataset.n_images if self.dataset else 1,
            )
        template = self.state
        incremental = bool(payload.get("incremental", False))
        if incremental:
            template = template._replace(opt_state=(), delta_opt_state=())
        stored = payload["leaves"]
        if payload.get("format") == "pathdict-v1":
            flat, treedef = jax.tree_util.tree_flatten_with_path(template)
            leaves = []
            missing = []
            for path, tmpl_leaf in flat:
                k = jax.tree_util.keystr(path)
                if k in stored:
                    leaves.append(jnp.asarray(stored[k]).astype(tmpl_leaf.dtype))
                else:
                    missing.append(k)
                    leaves.append(tmpl_leaf)
            if missing:
                print(
                    f"load_snapshot: {len(missing)} state fields absent from "
                    f"the snapshot kept at current values (e.g. {missing[:3]})"
                )
            restored = jax.tree_util.tree_unflatten(treedef, leaves)
        else:
            # Legacy positional-list format (pre path-keyed snapshots).
            treedef = jax.tree_util.tree_structure(template)
            leaves = [jnp.asarray(l) for l in stored]
            restored = jax.tree_util.tree_unflatten(treedef, leaves)
        if incremental:
            restored = restored._replace(
                opt_state=self.state.opt_state,
                delta_opt_state=self.state.delta_opt_state,
            )
        # Preserve exact dtypes of the template (bools etc.).
        self.state = jax.tree_util.tree_map(
            lambda t, r: r.astype(t.dtype), self.state, restored
        )
        meta = payload.get("meta", {})
        self.training_step = int(meta.get("training_step", 0))
        self.current_training_time_frame = int(meta.get("frame", 0))
        self._restore_phase_flags()

    def load_reference_snapshot(self, path: str | Path):
        """Load a reference-format msgpack snapshot (api/ngp_snapshot.py):
        params into both params and ema_params (the reference serializes the
        EMA'd inference params, trainer.h:281-292), the morton-decoded
        density grid into the occupancy state, and the accumulated global
        movement.  Optimizer state starts fresh."""
        from neus2_tpu.api.ngp_snapshot import load_reference_snapshot
        from neus2_tpu.engine import occupancy as occ_mod

        out = load_reference_snapshot(path, self.config.field)
        if self.state is None:
            self.state = init_train_state(
                jax.random.PRNGKey(self.seed), self.config,
                self.dataset.n_images if self.dataset else 1,
            )
        params = jax.tree_util.tree_map(
            lambda t, r: jnp.asarray(r).astype(t.dtype),
            self.state.params,
            out["params"],
        )
        changes = {"params": params, "ema_params": params}
        grid = out["density_grid"]
        if grid is not None:
            occ = self.state.occupancy
            if grid.shape == occ.density.shape:
                changes["occupancy"] = occ_mod.update_bitfield(
                    occ._replace(density=jnp.asarray(grid))
                )
            else:
                print(
                    f"load_reference_snapshot: density grid {grid.shape} "
                    f"does not match the configured occupancy "
                    f"{occ.density.shape}; keeping the current grid"
                )
        if out["acc"] is not None:
            changes["acc"] = jax.tree_util.tree_map(
                lambda t, r: jnp.asarray(r).astype(t.dtype),
                self.state.acc,
                out["acc"],
            )
        self.state = self.state._replace(**changes)
        self.training_step = out["training_step"]
        self.loss_scalar = out["loss"]
        self._restore_phase_flags()

    def _restore_phase_flags(self):
        """Replay the dynamic-scene phase machine for a resumed snapshot.

        The phase booleans (train_canonical / train_delta / use_delta) are
        host state the snapshot's step counters fully determine — without the
        replay, a resume into frame k >= 1 trains the canonical field against
        images misaligned by the per-frame motion with no delta applied
        (the reference reconstructs them the same way: load_snapshot restores
        counters and train() re-derives the phase each step,
        testbed.cu:2659-2667)."""
        frame = self.current_training_time_frame
        predict = bool(self.hyper.predict_global_movement)
        if frame == 0:
            self.train_canonical = True
            self.train_delta = False
            self.use_delta = False
            return
        in_refine = (
            predict
            and self.training_step < self.hyper.predict_global_movement_training_step
        )
        self.train_canonical = not in_refine
        self.train_delta = predict and (
            in_refine or bool(self.hyper.finetune_global_movement)
        )
        self.use_delta = predict
        # Rendering/eval during frames >= 1 needs the frame's dataset, not
        # the one load_training_data left in place.
        if self.dataset is not None and self.is_dynamic:
            self._load_frame(frame)
