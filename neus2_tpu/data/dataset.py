"""Dataset layer: NeRF/NA-format `transforms.json` loading, TPU-resident images.

Host-side (numpy) re-implementation of the reference data loader
(reference: src/nerf_loader.cu:197-760, include/neural-graphics-primitives/
nerf_loader.h:68-172), with the same behavior contract:

  * ``from_na`` NeuS2 format: per-frame ``intrinsic_matrix`` (fx, fy, cx, cy
    in pixels) and ``transform_matrix`` (camera-to-world), 4-channel RGBA
    images where alpha is the foreground mask (nerf_loader.cu:675-680);
  * standard instant-ngp format: ``camera_angle_x`` / ``fl_x`` etc.;
  * coordinate conversion ``nerf_matrix_to_ngp`` (nerf_loader.h:112-133):
    flip Y/Z columns, scale+offset the translation, and for non-na data cycle
    the axes xyz<-yzx; na data flips Y/Z twice (i.e. not at all) so only
    scale/offset applies;
  * default ``scale`` = 0.33 (NERF_SCALE, nerf_loader.h:31), ``offset`` =
    (0.5, 0.5, 0.5) — DTU/NA scenes override via json;
  * texels are stored premultiplied-alpha *linear* RGBA
    (common_device.cuh:529-542: rgba = srgb_to_linear(rgb) * alpha).

A dynamic scene is a directory of per-frame ``*.json`` sorted by basename
(reference src/testbed_nerf.cu:2967-2994); see ``list_frame_jsons``.

Device residency: the whole dataset (stacked images + cameras) is moved to
device once; per-step ray/pixel sampling then happens entirely on device
inside the jitted train step (no host<->device traffic in the hot loop) —
replacing the reference's GPU-resident `pixelmemory`.
"""

from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path

import numpy as np

from neus2_tpu.engine.rays import Cameras

# sRGB <-> linear on host (numpy mirror of ops/losses.py jnp versions).


def _srgb_to_linear_np(c: np.ndarray) -> np.ndarray:
    return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


@dataclasses.dataclass
class NerfDataset:
    """Host-side dataset. Arrays are numpy; `to_device` yields jnp copies."""

    images: np.ndarray  # (N, H, W, 4) float32, premultiplied-alpha linear RGBA
    poses: np.ndarray  # (N, 3, 4) camera-to-world, ngp coordinates
    focal: np.ndarray  # (N, 2) fx, fy pixels
    principal: np.ndarray  # (N, 2) cx, cy relative to resolution
    scale: float = 0.33
    offset: tuple[float, float, float] = (0.5, 0.5, 0.5)
    aabb_scale: int = 1
    from_na: bool = False
    paths: tuple[str, ...] = ()
    # Brown-Conrady (k1, k2, p1, p2) from the json root, or None
    # (reference nerf_loader.cu:397-425).
    distortion: np.ndarray | None = None
    # FTheta fisheye polynomial [p0..p4, w, h] from the json root, or None
    # (reference nerf_loader.cu:448-457; takes precedence over k1/k2 in
    # the reference because it is assigned last).
    ftheta: np.ndarray | None = None
    # Per-pixel depth in ngp units ((N, H, W) float32, 0 = no data), from
    # per-frame depth_path images scaled by integer_depth_scale * scale
    # (reference nerf_loader.cu:91-98, 218-220, 599-607, 736).
    depths: np.ndarray | None = None
    # Rolling shutter (t0, du, dv, motionblur) + end-of-exposure poses
    # (reference nerf_loader.cu:434-445, transform_matrix_end).
    rolling_shutter: np.ndarray | None = None
    poses_end: np.ndarray | None = None
    # Per-pixel ray files "rays_<stem>.dat" next to each image
    # ((N, H, W, 6) [o|d] in ngp coords; reference nerf_loader.cu:614-635).
    rays: np.ndarray | None = None
    # Per-image true (w, h) when resolutions are mixed and images are
    # zero-padded to the common max (reference nerf_loader.h:33-48).
    sizes: np.ndarray | None = None
    # Dataset-provided environment map ((H, W, 4) premultiplied-linear RGBA
    # from the json-root "envmap" image path, reference nerf_loader.cu:
    # 498-511); initializes the trainable envmap at its resolution.
    envmap: np.ndarray | None = None

    @property
    def n_images(self) -> int:
        return self.images.shape[0]

    @property
    def resolution(self) -> tuple[int, int]:
        return self.images.shape[2], self.images.shape[1]  # (W, H)

    def subset(self, sl: "slice | list[int]") -> "NerfDataset":
        """Dataset restricted to a slice/list of image indices (train/eval
        splits — the reference's n_training_images culling analog)."""
        import dataclasses

        def cut(a):
            return None if a is None else a[sl]

        return dataclasses.replace(
            self,
            images=self.images[sl],
            poses=self.poses[sl],
            focal=self.focal[sl],
            principal=self.principal[sl],
            paths=tuple(np.asarray(self.paths, object)[sl])
            if self.paths
            else (),
            depths=cut(self.depths),
            rolling_shutter=cut(self.rolling_shutter),
            poses_end=cut(self.poses_end),
            rays=cut(self.rays),
            sizes=cut(self.sizes),
        )

    def cameras(self) -> Cameras:
        import jax.numpy as jnp

        opt = lambda a, dt=jnp.float32: None if a is None else jnp.asarray(a, dt)
        return Cameras(
            poses=jnp.asarray(self.poses, jnp.float32),
            focal=jnp.asarray(self.focal, jnp.float32),
            principal=jnp.asarray(self.principal, jnp.float32),
            resolution=self.resolution,
            distortion=opt(self.distortion) if self.ftheta is None else None,
            ftheta=opt(self.ftheta),
            poses_end=opt(self.poses_end),
            rolling_shutter=opt(self.rolling_shutter),
            rays=opt(self.rays),
            image_sizes=opt(self.sizes, jnp.int32),
        )

    def images_device(self, dtype=None):
        import jax.numpy as jnp

        return jnp.asarray(self.images, dtype or jnp.float32)

    def depths_device(self, dtype=None):
        import jax.numpy as jnp

        if self.depths is None:
            return None
        return jnp.asarray(self.depths, dtype or jnp.float32)


def nerf_matrix_to_ngp(
    mat: np.ndarray, scale: float, offset: np.ndarray, from_na: bool
) -> np.ndarray:
    """Coordinate conversion (reference nerf_loader.h:112-133)."""
    result = np.array(mat[:3, :4], np.float32)
    result[:, 1] *= -1
    result[:, 2] *= -1
    result[:, 3] = result[:, 3] * scale + offset
    if from_na:
        # flip back: net effect is only the scale/offset on translation
        result[:, 1] *= -1
        result[:, 2] *= -1
    else:
        result = result[[1, 2, 0], :]
    return result


def ngp_matrix_to_nerf(
    mat: np.ndarray, scale: float, offset: np.ndarray, from_na: bool
) -> np.ndarray:
    """Inverse conversion (reference nerf_loader.h:135-155)."""
    result = np.array(mat[:3, :4], np.float32)
    if from_na:
        result[:, 1] *= -1
        result[:, 2] *= -1
    else:
        result = result[[2, 0, 1], :]
    result[:, 1] *= -1
    result[:, 2] *= -1
    result[:, 3] = (result[:, 3] - offset) / scale
    return result


def _load_image_rgba(path: Path) -> np.ndarray:
    """Load an image file -> (H, W, 4) float32 premultiplied-linear RGBA."""
    if path.suffix.lower() == ".exr":
        # EXR data is linear already (reference tinyexr path,
        # nerf_loader.cu:499-510 is_hdr).
        from neus2_tpu.data.exr import read_exr_rgba

        img = read_exr_rgba(path)
        rgb, alpha = img[..., :3], img[..., 3:4]
        return np.concatenate([rgb * alpha, alpha], axis=-1).astype(np.float32)
    import imageio.v2 as imageio

    img = np.asarray(imageio.imread(str(path)))
    if img.ndim == 2:
        img = img[..., None].repeat(3, axis=-1)
    if img.dtype == np.uint8:
        img = img.astype(np.float32) / 255.0
        srgb = True
    elif img.dtype == np.uint16:
        img = img.astype(np.float32) / 65535.0
        srgb = True
    else:  # float EXR/HDR data is already linear
        img = img.astype(np.float32)
        srgb = False
    if img.shape[-1] == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    rgb, alpha = img[..., :3], img[..., 3:4]
    if srgb:
        rgb = _srgb_to_linear_np(rgb)
    return np.concatenate([rgb * alpha, alpha], axis=-1).astype(np.float32)


def _apply_sharpen(img: np.ndarray, amount: float) -> np.ndarray:
    """4-neighbor unsharp filter (reference nerf_loader.cu:103-127, 808-830);
    single-image wrapper over the canonical batched implementation
    (ops/image.py sharpen_images, shared with the testbed.nerf.sharpen
    setter)."""
    from neus2_tpu.ops.image import sharpen_images

    return sharpen_images(img[None], amount)[0]


def _focal_from_json(
    frame: dict, meta: dict, w: int, h: int
) -> tuple[float, float, float, float]:
    """(fx, fy, cx, cy) with cx/cy relative (reference nerf_loader.cu:651-694)."""

    def fov_to_focal(res: float, deg: float) -> float:
        return 0.5 * res / np.tan(0.5 * deg * np.pi / 180.0)

    def read_fl(res: float, axis: str) -> float:
        if f"{axis}_fov" in frame:
            return fov_to_focal(res, float(frame[f"{axis}_fov"]))
        if f"fl_{axis}" in meta:
            return float(meta[f"fl_{axis}"])
        if f"camera_angle_{axis}" in meta:
            return fov_to_focal(res, float(meta[f"camera_angle_{axis}"]) * 180.0 / np.pi)
        return 0.0

    cx = float(meta.get("cx", 0.5 * w)) / w
    cy = float(meta.get("cy", 0.5 * h)) / h
    fx = read_fl(w, "x")
    fy = read_fl(h, "y")
    if fx != 0.0:
        return fx, (fy if fy != 0.0 else fx), cx, cy
    if fy != 0.0:
        return fy, fy, cx, cy
    if "intrinsic_matrix" in frame:
        k = np.asarray(frame["intrinsic_matrix"], np.float32)
        return float(k[0][0]), float(k[1][1]), float(k[0][2]) / w, float(k[1][2]) / h
    raise ValueError("couldn't read fov: no fl_x/camera_angle_x/intrinsic_matrix")


def load_dataset(json_path: str | os.PathLike, n_frames_cap: int | None = None) -> NerfDataset:
    """Load one transforms.json (static scene or one dynamic frame)."""
    json_path = Path(json_path)
    with open(json_path) as f:
        meta = json.load(f)
    basepath = json_path.parent

    from_na = "from_na" in meta
    scale = float(meta.get("scale", 0.33))
    offset = np.asarray(meta.get("offset", (0.5, 0.5, 0.5)), np.float32)
    if np.ndim(offset) == 0:
        offset = np.full((3,), float(offset), np.float32)
    aabb_scale = int(meta.get("aabb_scale", 1))

    # Camera distortion: Iterative (Brown-Conrady) mode when any of
    # k1/k2/p1/p2 is present and nonzero (reference nerf_loader.cu:397-425).
    dist = np.array(
        [float(meta.get(k, 0.0)) for k in ("k1", "k2", "p1", "p2")], np.float32
    )
    distortion = dist if np.any(dist != 0.0) else None
    # FTheta fisheye (nerf_loader.cu:448-457): ftheta_p0..4 + the
    # intrinsics' own pixel scale w/h; overrides Brown-Conrady.
    ftheta = None
    if "ftheta_p0" in meta:
        ftheta = np.array(
            [float(meta[f"ftheta_p{i}"]) for i in range(5)]
            + [float(meta["w"]), float(meta["h"])],
            np.float32,
        )
    # uint16 depth images scale by integer_depth_scale, then by the scene
    # scale (reference set_training_image call, nerf_loader.cu:736).
    depth_scale = float(meta.get("integer_depth_scale", -1.0))
    # Rolling shutter (t0, du, dv[, motionblur]) at the json root
    # (reference nerf_loader.cu:434-445).
    rolling_shutter = None
    if "rolling_shutter" in meta:
        rs = [float(v) for v in meta["rolling_shutter"]]
        rolling_shutter = np.asarray((rs + [0.0])[:4], np.float32)

    # Unsharp-mask sharpening at load time (reference nerf_loader.cu:364-365,
    # 808-830; json key "sharpen", 0 = off).
    sharpen_amount = float(meta.get("sharpen", 0.0))

    # Dataset-provided environment map: json-root "envmap" names an image
    # (EXR = linear HDR, else sRGB-decoded) that seeds the trainable
    # lat-long background (reference nerf_loader.cu:498-511).
    envmap_data = None
    if "envmap" in meta:
        envmap_path = basepath / str(meta["envmap"])
        if not envmap_path.exists():
            raise FileNotFoundError(f"Environment map path {envmap_path} does not exist.")
        envmap_data = _load_image_rgba(envmap_path)

    frames = meta["frames"]
    if n_frames_cap is not None:
        frames = frames[:n_frames_cap]
    images, poses, focals, principals, paths, depth_list = [], [], [], [], [], []
    poses_end, ray_list = [], []
    any_depth = any_end = any_rays = False

    # Resolve paths, then decode PNG/JPEG on the native thread pool
    # (native/image_loader.cpp — the reference's loader is likewise
    # multi-threaded C++, nerf_loader.cu:197-760).  Per-file failures and
    # EXR fall back to the Python decoder below.
    resolved = []
    for frame in frames:
        p = basepath / frame["file_path"]
        if not p.exists() and not p.suffix:
            p = p.with_suffix(".png")
        resolved.append(p)
    decoded = [None] * len(resolved)
    native_idx = [
        i for i, p in enumerate(resolved)
        if p.suffix.lower() in (".png", ".jpg", ".jpeg")
    ]
    if native_idx:
        try:
            from neus2_tpu.native import decode_images

            for i, img in zip(native_idx,
                              decode_images([resolved[i] for i in native_idx])):
                decoded[i] = img
        except Exception:  # missing toolchain etc. -> Python decoder
            pass

    for fi, frame in enumerate(frames):
        p = resolved[fi]
        img = decoded[fi] if decoded[fi] is not None else _load_image_rgba(p)
        if sharpen_amount > 0.0:
            img = _apply_sharpen(img, sharpen_amount)
        images.append(img)
        mat = np.asarray(
            frame.get("transform_matrix_start", frame.get("transform_matrix")),
            np.float32,
        )
        poses.append(nerf_matrix_to_ngp(mat, scale, offset, from_na))
        # End-of-exposure pose: transform_matrix_end, default = start
        # (reference nerf_loader.cu:637-639).
        if "transform_matrix_end" in frame:
            end = np.asarray(frame["transform_matrix_end"], np.float32)
            any_end = True
        else:
            end = mat
        poses_end.append(nerf_matrix_to_ngp(end, scale, offset, from_na))
        w, h = images[-1].shape[1], images[-1].shape[0]
        fx, fy, cx, cy = _focal_from_json(frame, meta, w, h)
        focals.append((fx, fy))
        principals.append((cx, cy))
        paths.append(str(p))
        d = None
        if depth_scale > 0.0 and "depth_path" in frame:
            d = _load_depth(basepath / frame["depth_path"], depth_scale * scale)
            any_depth = True
        depth_list.append(d)
        r = _load_rays_file(p, (h, w), scale, offset)
        any_rays = any_rays or r is not None
        ray_list.append(r)

    shapes = {im.shape[:2] for im in images}
    sizes = None
    if len(shapes) != 1:
        # Mixed per-image resolutions: zero-pad to the common max and keep
        # the true (w, h) per image (reference metadata is per-image,
        # nerf_loader.h:33-48; sampling clamps to the true size).
        sizes = np.asarray(
            [(im.shape[1], im.shape[0]) for im in images], np.int32
        )
        h_max = max(s[0] for s in shapes)
        w_max = max(s[1] for s in shapes)
        pad2 = lambda a: np.pad(
            a, ((0, h_max - a.shape[0]), (0, w_max - a.shape[1]))
            + ((0, 0),) * (a.ndim - 2)
        )
        images = [pad2(im) for im in images]
        depth_list = [None if d is None else pad2(d) for d in depth_list]
        ray_list = [None if r is None else pad2(r) for r in ray_list]
    h, w = images[0].shape[:2]
    depths = None
    if any_depth:
        depths = np.stack(
            [
                d if d is not None else np.zeros((h, w), np.float32)
                for d in depth_list
            ]
        )
    rays = None
    if any_rays:
        if not all(r is not None for r in ray_list):
            raise ValueError(
                "per-pixel ray files must be present for all frames or none"
            )
        rays = np.stack(ray_list)
    return NerfDataset(
        images=np.stack(images),
        poses=np.stack(poses),
        focal=np.asarray(focals, np.float32),
        principal=np.asarray(principals, np.float32),
        scale=scale,
        offset=tuple(float(o) for o in offset),
        aabb_scale=aabb_scale,
        from_na=from_na,
        paths=tuple(paths),
        distortion=distortion,
        ftheta=ftheta,
        depths=depths,
        rolling_shutter=rolling_shutter,
        poses_end=np.stack(poses_end) if (any_end or rolling_shutter is not None) else None,
        rays=rays,
        sizes=sizes,
        envmap=envmap_data,
    )


def _load_rays_file(
    img_path: Path, hw: tuple[int, int], scale: float, offset: np.ndarray
) -> np.ndarray | None:
    """Load "rays_<stem>.dat" next to an image -> (H, W, 6) ngp [o|d] or None.

    Binary layout: H*W Ray records of 6 float32 (origin, direction) in nerf
    coords, converted per nerf_ray_to_ngp (reference nerf_loader.cu:614-635,
    nerf_loader.h:157-172: o = o*scale + offset, then cycle xyz <- yzx on
    both o and d; direction left unscaled)."""
    rp = img_path.parent / f"rays_{img_path.stem}.dat"
    if not rp.exists():
        return None
    h, w = hw
    raw = np.fromfile(rp, np.float32)
    if raw.size < h * w * 6:
        raise ValueError(f"{rp}: expected {h*w*6} floats, got {raw.size}")
    r = raw[: h * w * 6].reshape(h, w, 6).copy()
    r[..., :3] = r[..., :3] * scale + np.asarray(offset, np.float32)
    r[..., 0:3] = r[..., [1, 2, 0]]
    r[..., 3:6] = r[..., [4, 5, 3]]
    return r


def _load_depth(path: Path, scale: float) -> np.ndarray:
    """Load a depth image -> (H, W) float32 in ngp units; 0 = missing.

    Pixels (uint16 or float) scale by ``integer_depth_scale * scene_scale``,
    matching the reference's copy_depth kernel which applies the same factor
    to both depth dtypes (nerf_loader.cu:91-98, 736).
    """
    if path.suffix.lower() == ".exr":
        from neus2_tpu.data.exr import read_exr_depth

        d = read_exr_depth(path)
    else:
        import imageio.v2 as imageio

        d = np.asarray(imageio.imread(str(path)))
    if d.ndim == 3:
        d = d[..., 0]
    return (d.astype(np.float32) * scale).astype(np.float32)


def list_frame_jsons(scene_path: str | os.PathLike) -> list[Path]:
    """Dynamic scene = dir of per-frame jsons sorted by basename
    (reference src/testbed_nerf.cu:2967-2994); a single json = static."""
    p = Path(scene_path)
    if p.is_dir():
        jsons = sorted(p.glob("*.json"), key=lambda q: q.name)
        if not jsons:
            raise FileNotFoundError(f"no .json files in {p}")
        return jsons
    return [p]
