"""Camera model and pixel -> ray generation.

Convention matches the reference (reference: include/neural-graphics-primitives/
common_device.cuh:246-310 pixel_to_ray): uv in [0,1]^2, camera-space direction
((u - cx)*W/fx, (v - cy)*H/fy, 1) rotated by the camera-to-world 3x3 block;
origin is column 3.  Cameras are stored stacked for the whole dataset so a
batch of (image_idx, uv) pairs turns into rays with two gathers and a matmul.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Cameras(NamedTuple):
    """Per-image pinhole cameras (N images), optionally lens-distorted."""

    poses: jnp.ndarray  # (N, 3, 4) camera-to-world
    focal: jnp.ndarray  # (N, 2) fx, fy in pixels
    principal: jnp.ndarray  # (N, 2) cx, cy relative to resolution ([0,1])
    resolution: tuple[int, int]  # (W, H), static (max over images)
    # Brown-Conrady lens distortion (k1, k2, p1, p2), shared by all images
    # as in the reference (parsed from the json root, nerf_loader.cu:397-425);
    # None = pinhole.
    distortion: jnp.ndarray | None = None
    # FTheta fisheye lens (r-to-angle polynomial): 7 params
    # [p0..p4, w, h] (common.h:172 ECameraDistortionMode::FTheta,
    # json ftheta_p0..4 + w/h, nerf_loader.cu:448-457); mutually exclusive
    # with `distortion`.  None = not an ftheta camera.
    ftheta: jnp.ndarray | None = None
    # End-of-exposure poses + rolling-shutter coefficients (t0, du, dv,
    # motionblur): the per-pixel pose is start + (end-start) * (t0 + du*u +
    # dv*v + mb*time) (reference get_xform_given_rolling_shutter,
    # common_device.cuh:226-229; parsed at nerf_loader.cu:434-445).
    poses_end: jnp.ndarray | None = None
    rolling_shutter: jnp.ndarray | None = None
    # Per-pixel ray files ("has_rays", nerf_loader.cu:614-635): (N, H, W, 6)
    # [origin | direction] in ngp coords; overrides the pinhole model for
    # training-sample generation (testbed_nerf.cu:1328).
    rays: jnp.ndarray | None = None
    # Per-image true (w, h) when images have mixed resolutions and are
    # stored zero-padded to the shared (W, H) (reference metadata is
    # per-image, nerf_loader.h:33-48); None = all images at `resolution`.
    image_sizes: jnp.ndarray | None = None
    # Per-image sharpness grids (N, sh, sw) for include_sharpness_in_error
    # (reference dataset.sharpness_data, nerf_loader.h:75-76; computed at
    # load by ops/image.py sharpness_maps); None when the feature is off.
    sharpness: jnp.ndarray | None = None

    @property
    def n_images(self) -> int:
        return self.poses.shape[0]

    def size_of(self, img_idx: jnp.ndarray) -> jnp.ndarray:
        """(B, 2) float (w, h) of each image in the batch."""
        if self.image_sizes is not None:
            return self.image_sizes[img_idx].astype(jnp.float32)
        w, h = self.resolution
        shape = jnp.shape(img_idx) + (2,)
        return jnp.broadcast_to(jnp.array([w, h], jnp.float32), shape)


def apply_camera_distortion(
    params: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Brown-Conrady forward distortion deltas (du, dv)
    (reference apply_camera_distortion, common_device.cuh:142-159)."""
    k1, k2, p1, p2 = params[0], params[1], params[2], params[3]
    u2, v2, uv = u * u, v * v, u * v
    r2 = u2 + v2
    radial = k1 * r2 + k2 * r2 * r2
    du = u * radial + 2.0 * p1 * uv + p2 * (r2 + 2.0 * u2)
    dv = v * radial + 2.0 * p2 * uv + p1 * (r2 + 2.0 * v2)
    return du, dv


def iterative_undistortion(
    params: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray, n_iters: int = 8
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert the distortion by Newton iteration, vectorized over the batch.

    The reference runs up to 100 iterations with a numerically-differentiated
    Jacobian and an early exit (iterative_camera_undistortion,
    common_device.cuh:162-201); with the ANALYTIC Jacobian of the
    Brown-Conrady model a fixed 8 iterations reaches f32 roundoff for any
    realistic distortion — fixed trip count keeps the whole thing jittable.
    """
    k1, k2, p1, p2 = params[0], params[1], params[2], params[3]
    x0, y0 = u, v

    def body(_, xy):
        x, y = xy
        x2, y2, xy_ = x * x, y * y, x * y
        r2 = x2 + y2
        radial = k1 * r2 + k2 * r2 * r2
        dradial_dr2 = k1 + 2.0 * k2 * r2
        # Residual F = distort(x, y) - (x0, y0)
        fx = x + x * radial + 2.0 * p1 * xy_ + p2 * (r2 + 2.0 * x2) - x0
        fy = y + y * radial + 2.0 * p2 * xy_ + p1 * (r2 + 2.0 * y2) - y0
        # Analytic Jacobian of the distorted coords wrt (x, y).
        j00 = 1.0 + radial + x * dradial_dr2 * 2.0 * x + 2.0 * p1 * y + 6.0 * p2 * x
        j01 = x * dradial_dr2 * 2.0 * y + 2.0 * p1 * x + 2.0 * p2 * y
        j10 = y * dradial_dr2 * 2.0 * x + 2.0 * p2 * y + 2.0 * p1 * x
        j11 = 1.0 + radial + y * dradial_dr2 * 2.0 * y + 2.0 * p2 * x + 6.0 * p1 * y
        det = j00 * j11 - j01 * j10
        det = jnp.where(jnp.abs(det) < 1e-12, 1.0, det)
        nx = x - (j11 * fx - j01 * fy) / det
        ny = y - (-j10 * fx + j00 * fy) / det
        return nx, ny

    x, y = jax.lax.fori_loop(0, n_iters, body, (u, v))
    return x, y


def ftheta_undistortion(
    params: jnp.ndarray, duv: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """FTheta fisheye: centered uv offset -> camera-space direction.

    The radius-to-angle polynomial model (reference f_theta_undistortion,
    common_device.cuh:231-243): pixel radius r (in the intrinsics'
    own w/h scale, params[5:7]) maps to the ray's polar angle
    alpha = p0 + r*(p1 + r*(p2 + r*(p3 + r*p4))); the direction is
    (sin(a)/r * xpix, sin(a)/r * ypix, cos(a)).

    Returns (dir_cam (B, 3) UNNORMALIZED, valid (B,) bool).  Invalid rays
    (cos(alpha) <= 0 or r == 0 — the reference returns an
    outside-the-aabb sentinel ray so the pixel never renders) get a
    placeholder +z direction; callers must mask them via `valid`.
    """
    xpix = duv[..., 0] * params[5]
    ypix = duv[..., 1] * params[6]
    norm = jnp.sqrt(xpix * xpix + ypix * ypix)
    alpha = params[0] + norm * (
        params[1] + norm * (params[2] + norm * (params[3] + norm * params[4]))
    )
    sin_a, cos_a = jnp.sin(alpha), jnp.cos(alpha)
    valid = (cos_a > jnp.finfo(jnp.float32).tiny) & (norm > 0.0)
    safe_norm = jnp.where(norm > 0.0, norm, 1.0)
    s = sin_a / safe_norm
    dir_cam = jnp.stack([s * xpix, s * ypix, cos_a], axis=-1)
    dir_cam = jnp.where(
        valid[..., None],
        dir_cam,
        jnp.array([0.0, 0.0, 1.0], jnp.float32),
    )
    return dir_cam, valid


def pixel_to_ray(
    cameras: Cameras,
    img_idx: jnp.ndarray,
    uv: jnp.ndarray,
    motionblur_time: jnp.ndarray | float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Rays for a batch of (image index, uv in [0,1]^2) pairs.

    Returns (origin (B, 3), direction (B, 3) normalized).
    """
    poses = cameras.poses[img_idx]  # (B, 3, 4)
    if cameras.poses_end is not None and cameras.rolling_shutter is not None:
        # Per-pixel exposure-time pose interpolation
        # (get_xform_given_rolling_shutter, common_device.cuh:226-229).
        rs = cameras.rolling_shutter
        t = (
            rs[0]
            + rs[1] * uv[..., 0]
            + rs[2] * uv[..., 1]
            + rs[3] * motionblur_time
        )
        poses = poses + (cameras.poses_end[img_idx] - poses) * t[..., None, None]
    focal = cameras.focal[img_idx]  # (B, 2)
    principal = cameras.principal[img_idx]  # (B, 2)
    if cameras.ftheta is not None:
        # Fisheye: the polynomial consumes the centered uv directly (its
        # own w/h scale lives in the params); focal is not used
        # (common_device.cuh:265-269).  Invalid pixels (angle past the
        # lens's valid field) get the reference's outside-the-aabb
        # sentinel origin so they march to nothing and composite as
        # background — the fixed-shape analog of "pixel is not rendered".
        dir_cam, ft_valid = ftheta_undistortion(
            cameras.ftheta, uv - principal
        )
        direction = jnp.sum(poses[..., :3] * dir_cam[..., None, :], axis=-1)
        direction = direction / jnp.linalg.norm(
            direction, axis=-1, keepdims=True
        )
        origin = jnp.where(
            ft_valid[..., None],
            poses[..., 3],
            jnp.array([1000.0, 0.0, 0.0], jnp.float32),
        )
        return origin, direction
    res = cameras.size_of(img_idx)
    xy = (uv - principal) * res / focal
    if cameras.distortion is not None:
        # Undistort in normalized camera coords before building the ray
        # (reference pixel_to_ray, common_device.cuh:246-283).
        x, y = iterative_undistortion(
            cameras.distortion, xy[..., 0], xy[..., 1]
        )
        xy = jnp.stack([x, y], axis=-1)
    dir_cam = jnp.concatenate([xy, jnp.ones_like(xy[..., :1])], axis=-1)
    # Broadcast-multiply-reduce, NOT einsum: XLA:TPU lowers per-sample (3,3)
    # contractions to serial dot_generals that also block fusion (PERF.md
    # round-3 probe — same rule as the encoder's fwd contractions).
    direction = jnp.sum(poses[..., :3] * dir_cam[..., None, :], axis=-1)
    direction = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    origin = poses[..., 3]
    return origin, direction


def rays_from_pixels(
    cameras: Cameras,
    images: jnp.ndarray,  # (N, H, W, 4) RGBA, alpha = mask
    img_idx: jnp.ndarray,  # (B,)
    uv: jnp.ndarray,  # (B, 2)
    snap_to_pixel_centers: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rays + RGBA targets for given (image, uv) picks.

    Returns (origins (B,3), dirs (B,3), rgba (B,4), uv (B,2))."""
    wh = cameras.size_of(img_idx)  # (B, 2) per-image true size
    px = jnp.minimum((uv[:, 0] * wh[:, 0]).astype(jnp.int32), wh[:, 0].astype(jnp.int32) - 1)
    py = jnp.minimum((uv[:, 1] * wh[:, 1]).astype(jnp.int32), wh[:, 1].astype(jnp.int32) - 1)
    if snap_to_pixel_centers:
        uv = jnp.stack([(px + 0.5) / wh[:, 0], (py + 0.5) / wh[:, 1]], axis=-1)
    rgba = images[img_idx, py, px]
    if cameras.rays is not None:
        # Per-pixel ray files override the camera model for training rays
        # (testbed_nerf.cu:1328 rays_in_unnormalized).
        ray = cameras.rays[img_idx, py, px]  # (B, 6)
        origins = ray[:, :3]
        dirs = ray[:, 3:]
        dirs = dirs / jnp.maximum(
            jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9
        )
    else:
        origins, dirs = pixel_to_ray(cameras, img_idx, uv)
    return origins, dirs, rgba.astype(jnp.float32), uv


def sample_training_rays(
    key: jax.Array,
    cameras: Cameras,
    images: jnp.ndarray,
    n_rays: int,
    snap_to_pixel_centers: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniformly sample training rays and fetch their RGBA targets.

    Mirrors the uniform path of the reference sampler (testbed_nerf.cu:1263+,
    image_idx / nerf_random_image_pos_training in common_device.cuh); the
    error-map importance path lives in engine/error_map.py.

    Returns (origins (B,3), dirs (B,3), rgba (B,4), img_idx (B,)).
    """
    k_img, k_uv = jax.random.split(key)
    img_idx = jax.random.randint(k_img, (n_rays,), 0, cameras.n_images)
    uv = jax.random.uniform(k_uv, (n_rays, 2))
    origins, dirs, rgba, _ = rays_from_pixels(
        cameras, images, img_idx, uv, snap_to_pixel_centers
    )
    return origins, dirs, rgba, img_idx


def rays_for_image(cameras: Cameras, img_idx: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """All pixel-center rays of one image, shape (H*W, 3) each."""
    w, h = cameras.resolution
    u = (jnp.arange(w) + 0.5) / w
    v = (jnp.arange(h) + 0.5) / h
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    uv = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)
    idx = jnp.full((uv.shape[0],), img_idx, jnp.int32)
    return pixel_to_ray(cameras, idx, uv)
