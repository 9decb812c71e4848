"""Inference rendering: fixed-shape masked marching, chunked over pixels.

TPU-native replacement for the reference's alive-ray compaction render loop
(reference: src/testbed_nerf.cu:2397-2595 NerfTracer::init_rays_from_camera /
trace, 936-1045 composite_kernel_nerf): instead of host-synced compaction
rounds (a device->host sync per round, 2526-2528), every ray gets a fixed
occupancy-compacted sample budget and one batched field evaluation; the
composite uses the identical SDF->alpha math.  Fixed-size pixel chunks are
dispatched asynchronously from the host against one jitted chunk program,
which bounds peak memory and compiles once per shape.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from neus2_tpu.engine import occupancy as occ
from neus2_tpu.engine.march import march_rays
from neus2_tpu.engine.rays import Cameras, pixel_to_ray
from neus2_tpu.models import delta as delta_mod
from neus2_tpu.models.field import FieldConfig, field_forward
from neus2_tpu.ops.losses import linear_to_srgb
from neus2_tpu.ops.neus_math import composite_rays, neus_alpha
from neus2_tpu.ops.warp import AABB, warp_direction, warp_position


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    field: FieldConfig = FieldConfig()
    samples_per_ray: int = 128
    n_candidates: int = 384
    aabb_scale: int = 1
    near: float = 0.0
    cone_angle: float = 0.0
    min_transmittance: float = 1e-4  # eval protocol (run.py:271)
    # 4096-ray chunks: larger single-chunk programs (16k x 128 samples)
    # crash the v5e compiler, and host dispatch pipelines chunks anyway.
    chunk: int = 1 << 12
    spp: int = 1


def _render_chunk(
    params,
    acc,
    occupancy: occ.OccupancyGrid | None,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    key: jax.Array,
    config: RenderConfig,
    aabb: AABB,
    jitter: bool,
):
    """Shared ray->samples->field->composite chunk; returns all AOVs.

    The reference's render modes (ERenderMode: Shade/Depth/Normals/Cost,
    composite_kernel_nerf + shade_kernel_nerf, testbed_nerf.cu:936-2160) map
    to the returned channels: rgb, depth, opacity, normal, cost(=n samples).
    """
    origins, dirs = delta_mod.apply_accumulated_to_rays(acc, origins, dirs)
    samples = march_rays(
        key,
        origins,
        dirs,
        aabb,
        occupancy,
        config.n_candidates,
        config.samples_per_ray,
        cone_angle=config.cone_angle,
        near=config.near,
        jitter=jitter,
        # Deterministic candidate probes: the render's valid-candidate set
        # must equal march_probe's so hit-ray compaction stays exact under
        # jittered multi-spp renders (sample placement stays jittered).
        probe_jitter=False,
    )
    R, S = origins.shape[0], config.samples_per_ray
    pos = origins[:, None, :] + samples.t[..., None] * dirs[:, None, :]
    pos_w = warp_position(pos, aabb)
    dir_w = warp_direction(dirs)[:, None, :].repeat(S, 1)
    flat = lambda a: a.reshape((R * S,) + a.shape[2:])
    out = field_forward(params, flat(pos_w), flat(dir_w), config.field)
    rgb_s = out.rgb.reshape(R, S, 3)
    sdf_s = out.sdf.reshape(R, S)
    normal_s = out.normal.reshape(R, S, 3)
    # dt in the WARP metric — sdf/gradient are warp-coordinate quantities
    # (see engine/train.py; deviation from the reference's latent metric
    # bug at aabb_scale > 1).
    alpha = neus_alpha(
        sdf_s,
        normal_s,
        dirs[:, None, :],
        samples.dt / float(config.aabb_scale),
        out.inv_s,
        1.0,
    )
    comp = composite_rays(
        rgb_s, alpha, samples.t, samples.mask, config.min_transmittance
    )
    # Weighted surface normal (normalized), for the Normals render mode.
    n_acc = jnp.sum(comp.weights[..., None] * normal_s, axis=-2)
    n_acc = n_acc / jnp.maximum(
        jnp.linalg.norm(n_acc, axis=-1, keepdims=True), 1e-8
    )
    cost = samples.n_valid.astype(jnp.float32)
    return comp.rgb, comp.depth, comp.weight_sum, n_acc, cost


@partial(jax.jit, static_argnames=("config", "jitter"))
def _render_chunk_jit(params, acc, occupancy, oo, dd, kk, config, jitter):
    aabb = AABB(
        jnp.full((3,), 0.5 - 0.5 * config.aabb_scale, jnp.float32),
        jnp.full((3,), 0.5 + 0.5 * config.aabb_scale, jnp.float32),
    )
    return _render_chunk(params, acc, occupancy, oo, dd, kk, config, aabb, jitter)


@partial(jax.jit, static_argnames=("config",))
def _probe_rays_jit(acc, occupancy, origins, dirs, config):
    """Occupied length per ray — candidates + occupancy gathers, no MLP."""
    from neus2_tpu.engine.march import march_probe

    aabb = AABB(
        jnp.full((3,), 0.5 - 0.5 * config.aabb_scale, jnp.float32),
        jnp.full((3,), 0.5 + 0.5 * config.aabb_scale, jnp.float32),
    )
    origins, dirs = delta_mod.apply_accumulated_to_rays(acc, origins, dirs)
    return march_probe(
        origins,
        dirs,
        aabb,
        occupancy,
        config.n_candidates,
        cone_angle=config.cone_angle,
        near=config.near,
    )


def render_rays(
    params,
    acc,
    occupancy,
    origins: jnp.ndarray,  # (N, 3)
    dirs: jnp.ndarray,
    key: jax.Array,
    config: RenderConfig,
    jitter: bool = False,
    compact: bool = False,
):
    """Chunked render -> (rgb (N,3) sRGB-space pre-bg, depth (N,), opacity,
    normal (N,3), cost (N,)).

    Chunks are dispatched from the host against one jitted chunk program
    (compiled once per shape). NOTE deliberately not `lax.map`: a fori-loop
    over the full render body crashes the v5e XLA compiler, and host
    dispatch is async anyway so there is no per-chunk sync cost.

    ``compact``: probe the occupancy march first and evaluate the field only
    for rays that cross occupied space (misses return exact zeros either
    way); saves the field evaluation for background pixels at the cost of
    one host sync.  ``render_image`` does this itself (probe shared across
    spp passes) — the flag is for direct ray-level callers.
    """
    n = origins.shape[0]
    if compact and occupancy is not None:
        hit_idx = probe_hit_rays(acc, occupancy, origins, dirs, config)
        empty = (
            jnp.zeros((n, 3)),
            jnp.zeros((n,)),
            jnp.zeros((n,)),
            jnp.zeros((n, 3)),
            jnp.zeros((n,)),
        )
        if hit_idx.size == 0:
            return empty
        sub = render_rays(
            params,
            acc,
            occupancy,
            origins[hit_idx],
            dirs[hit_idx],
            key,
            config,
            jitter=jitter,
            compact=False,
        )
        return tuple(e.at[hit_idx].set(s) for e, s in zip(empty, sub))
    c = min(config.chunk, n)
    n_chunks = -(-n // c)
    pad = n_chunks * c - n
    o = jnp.pad(origins, ((0, pad), (0, 0))).reshape(n_chunks, c, 3)
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        n_chunks, c, 3
    )
    keys = jax.random.split(key, n_chunks)
    outs = [
        _render_chunk_jit(params, acc, occupancy, o[i], d[i], keys[i], config, jitter)
        for i in range(n_chunks)
    ]
    cat = lambda k: jnp.concatenate([out[k] for out in outs], axis=0)[:n]
    return cat(0), cat(1), cat(2), cat(3), cat(4)


def probe_hit_rays(acc, occupancy, origins, dirs, config) -> "np.ndarray":
    """Indices of rays whose chord crosses occupied space (host np.int array).

    One chunked march-only probe + one host sync; rays not returned would
    march mask-all-False samples and composite to zero, so skipping their
    field evaluation is exact (march.py march_probe).  This is the
    fixed-shape analog of the reference's alive-ray compaction
    (testbed_nerf.cu:2479-2595) with one sync instead of one per round."""
    import numpy as np

    n = origins.shape[0]
    c = min(config.chunk, n)
    n_chunks = -(-n // c)
    pad = n_chunks * c - n
    o = jnp.pad(origins, ((0, pad), (0, 0))).reshape(n_chunks, c, 3)
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0).reshape(
        n_chunks, c, 3
    )
    totals = jnp.concatenate(
        [
            _probe_rays_jit(acc, occupancy, o[i], d[i], config)
            for i in range(n_chunks)
        ]
    )[:n]
    return np.nonzero(np.asarray(jax.device_get(totals)) > 0.0)[0]


def render_image(
    params,
    acc,
    occupancy,
    cameras: Cameras,
    pose: jnp.ndarray,  # (3, 4) camera-to-world
    focal: jnp.ndarray,  # (2,)
    principal: jnp.ndarray,  # (2,)
    key: jax.Array,
    config: RenderConfig,
    background: jnp.ndarray | float = 0.0,
    spp: int | None = None,
    mode: str = "shade",
    resolution: tuple[int, int] | None = None,
    envmap: jnp.ndarray | None = None,
    distortion: jnp.ndarray | None = None,
    exposure: float = 0.0,
    tonemap: str = "identity",
):
    """Render a full image -> (H, W, 3) image, (H, W) depth, (H, W) alpha.

    ``mode``: "shade" (sRGB color), "depth" (grayscale), "normals"
    (0.5*(n+1) color-coded), "cost" (marcher samples/ray) — the reference's
    ERenderMode menu (testbed_nerf.cu:2148-2160, 2807-2817).

    Eval protocol (reference scripts/run.py:264-271): black background,
    spp=8 (jittered sample offsets averaged), min transmittance 1e-4; network
    rgb output already lives in sRGB space.

    ``envmap``: learned (H, W, 4) environment map — non-hit radiance
    backgrounds every ray exactly as in training (reference
    init_rays_from_camera reads the envmap for render rays,
    testbed_nerf.cu:2298-2299; train composite at 1646-1655).
    ``distortion``: learned (H, W, 2) uv-offset grid applied to ray
    generation, matching the training-side warp (testbed_nerf.cu:2208-2331).
    ``exposure``/``tonemap``: reference CudaRenderBuffer output controls
    (render_buffer.cu:313-332) — sRGB -> linear, x 2^exposure, curve
    ("identity"|"aces"|"hable"|"reinhard"), -> sRGB; applied to the full
    composited frame in shade mode.
    """
    w, h = resolution or cameras.resolution
    # Carry the dataset's lens model: rendering through a distorted camera
    # must cast the same (undistorted) rays as training, or eval renders are
    # geometrically misaligned with captured GT (reference
    # init_rays_from_camera applies the identical distortion,
    # testbed_nerf.cu:2208-2331).  Per-pixel ray files and rolling shutter
    # are per-training-image data and do not apply to a novel pose.
    one_cam = Cameras(
        poses=pose[None],
        focal=jnp.asarray(focal)[None],
        principal=jnp.asarray(principal)[None],
        resolution=(w, h),
        distortion=cameras.distortion,
    )
    u = (jnp.arange(w) + 0.5) / w
    v = (jnp.arange(h) + 0.5) / h
    uu, vv = jnp.meshgrid(u, v)
    uv = jnp.stack([uu.ravel(), vv.ravel()], axis=-1)
    idx = jnp.zeros((uv.shape[0],), jnp.int32)
    if distortion is not None:
        from neus2_tpu.ops.envmap import apply_distortion

        uv = apply_distortion(distortion, uv)
    origins, dirs = pixel_to_ray(one_cam, idx, uv)

    spp = spp or config.spp
    bg = jnp.broadcast_to(jnp.asarray(background, jnp.float32), (3,))
    # Per-ray sRGB background: the learned envmap composites over the flat
    # background in linear space (training semantics, engine/train.py).
    if envmap is not None:
        from neus2_tpu.ops.envmap import composite_envmap_background

        bg_srgb = linear_to_srgb(
            jnp.clip(
                composite_envmap_background(envmap, dirs, bg[None, :]),
                0.0,
                1.0,
            )
        )  # (N, 3)
    else:
        bg_srgb = jnp.broadcast_to(linear_to_srgb(bg), (w * h, 3))

    # Hit-ray compaction: the probe is deterministic (no jitter), so one
    # probe serves every spp pass; only rays crossing occupied space reach
    # the field (typically 30-60% on object-centric scenes).
    n = w * h
    if occupancy is not None:
        hit_idx = probe_hit_rays(acc, occupancy, origins, dirs, config)
        o_h, d_h = origins[hit_idx], dirs[hit_idx]
        bg_h = bg_srgb[hit_idx]
    else:
        hit_idx = None
        o_h, d_h = origins, dirs
        bg_h = bg_srgb
    m = o_h.shape[0]

    rgb_acc = jnp.zeros((m, 3))
    depth_acc = jnp.zeros((m,))
    op_acc = jnp.zeros((m,))
    for s in range(spp if m else 0):
        k = jax.random.fold_in(key, s)
        rgb, depth, opacity, normal, cost = render_rays(
            params, acc, occupancy, o_h, d_h, k, config, jitter=spp > 1
        )
        if mode == "shade":
            rgb_acc += rgb + (1.0 - opacity)[:, None] * bg_h
        elif mode == "normals":
            rgb_acc += 0.5 * (normal + 1.0) * opacity[:, None]
        elif mode == "depth":
            rgb_acc += depth[:, None].repeat(3, -1)
        elif mode == "cost":
            rgb_acc += cost[:, None].repeat(3, -1) / config.samples_per_ray
        else:
            raise ValueError(f"unknown render mode {mode!r}")
        depth_acc += depth
        op_acc += opacity
    if hit_idx is not None:
        # Misses composite to zero + background (exactly what the full
        # render would produce for them).
        miss_rgb = bg_srgb * spp if mode == "shade" else 0.0
        rgb_acc = (
            jnp.zeros((n, 3)) + miss_rgb
        ).at[hit_idx].set(rgb_acc)
        depth_acc = jnp.zeros((n,)).at[hit_idx].set(depth_acc)
        op_acc = jnp.zeros((n,)).at[hit_idx].set(op_acc)
    rgb_img = (rgb_acc / spp).reshape(h, w, 3)
    if mode == "shade":
        if exposure != 0.0 or tonemap.lower() != "identity":
            from neus2_tpu.ops.tonemap import apply_output_tonemap

            rgb_img = apply_output_tonemap(rgb_img, exposure, tonemap)
        rgb_img = jnp.clip(rgb_img, 0.0, 1.0)
    return rgb_img, (depth_acc / spp).reshape(h, w), (op_acc / spp).reshape(h, w)
