"""Error-map importance sampling over training pixels/images.

TPU-native restatement of the reference's error-map machinery
(reference: src/testbed_nerf.cu:1740-1765 loss deposit with bilinear
footprint, 2333-2388 construct_cdf_2d/construct_cdf_1d, 3478-3484 map reset
per accumulation window, 3555-3603 CDF rebuild every 128 steps growing by
1.5x; sampling via sample_image / nerf_random_image_pos_training in
common_device.cuh).

The reference samples hierarchically: image from a CDF mixed with a uniform
floor (MIN_PMF = 0.1), then row y | img (floor MIN_PDF = 0.01), then cell
x | y,img (floor 0.01).  Here the SAME joint distribution is computed in
closed form as the product of those three mixed pmfs and flattened into one
(image, cell) CDF; sampling is one searchsorted per ray (~log2(bins)
compares) — no host sync, and distribution-identical to the reference's
three-stage scheme.  The reference deliberately does NOT divide the loss by
the sampling pdf (testbed_nerf.cu:1901-1906 comment) — importance sampling
intentionally reweights the loss — and we reproduce that behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Fallback error-map resolution; the Testbed derives the real one from the
# first accumulation window via ``resolution_for`` (testbed_nerf.cu:3482).
ERROR_MAP_RES = 32

# Uniform-mixture floors (testbed_nerf.cu:2331 MIN_PDF, 3592 MIN_PMF).
MIN_PDF = 0.01
MIN_PMF = 0.1


def resolution_for(n_rays_per_step: int, n_images: int, image_res: int) -> int:
    """Reference sizing: res = sqrt(sqrt(samples/image in the first 128-step
    window)) * 3.5, capped at the image resolution (testbed_nerf.cu:3479-3482).
    Static here (fixed shapes): computed once at error-map enable time."""
    n_per_img = max(1, (128 * n_rays_per_step) // max(1, n_images))
    res = int(float(n_per_img) ** 0.25 * 3.5)
    return max(4, min(res, image_res))


class ErrorMapState(NamedTuple):
    error_map: jnp.ndarray  # (N_img, R, R) loss accumulated this window
    cdf: jnp.ndarray  # (N_img*R*R,) inclusive prefix sums (rebuilt lazily)
    # Running per-cell max of observed image sharpness at 3-D hit points
    # ((cascades*G^3,) f32, decayed 0.95/step), None unless
    # include_sharpness_in_error is on (reference m_nerf.training.
    # sharpness_grid, testbed_nerf.cu:3448-3459; consumed at the deposit,
    # :1748-1756).  None by default so the standard pytree/HLO is
    # unchanged.
    sharpness_grid: jnp.ndarray | None = None

    @property
    def res(self) -> int:
        return self.error_map.shape[1]


def init_error_map(
    n_images: int, res: int = ERROR_MAP_RES, sharpness_cells: int = 0
) -> ErrorMapState:
    flat = n_images * res * res
    # Uniform CDF at init.
    return ErrorMapState(
        error_map=jnp.zeros((n_images, res, res), jnp.float32),
        cdf=jnp.arange(1, flat + 1, dtype=jnp.float32) / flat,
        sharpness_grid=(
            jnp.zeros((sharpness_cells,), jnp.float32)
            if sharpness_cells
            else None
        ),
    )


def sharpness_weight_and_update(
    grid: jnp.ndarray,
    cells: jnp.ndarray,
    sharp: jnp.ndarray,
    valid: jnp.ndarray,
    decay: float = 0.95,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-ray sharpness deposit weight + the updated sharpness grid.

    The reference decays the grid 0.95/step (testbed_nerf.cu:3458
    decay_sharpness_grid_nerf), atomicMax-es each hit cell with the ray's
    image-space sharpness, and scales the deposited loss by
    max(sharp / grid_sharp, 0.01) where grid_sharp includes this ray's
    own observation (:1748-1756) — rays whose image is blurrier than the
    sharpest observation of that surface point are down-weighted.
    TPU version: decay, one scatter-max (a few-k updates — far below the
    measured scatter cliffs), gather, same floor.  ``valid`` masks rays
    with an in-aabb hit; invalid rays get weight 1 and no deposit.
    """
    g = grid * decay
    old = jnp.take(g, cells)
    contrib = jnp.where(valid, sharp, 0.0)
    g = g.at[cells].max(contrib)
    grid_sharp = jnp.maximum(jnp.maximum(old, sharp), 1e-20)
    w = jnp.where(valid, jnp.maximum(sharp / grid_sharp, 0.01), 1.0)
    return w, g


def deposit(
    state: ErrorMapState,
    img_idx: jnp.ndarray,  # (B,)
    uv: jnp.ndarray,  # (B, 2)
    loss: jnp.ndarray,  # (B,) per-ray loss values
) -> ErrorMapState:
    """Accumulate per-ray losses with the reference's bilinear 4-cell
    footprint (testbed_nerf.cu:1737-1763: cell index clamped to res-2 so the
    +1 neighbors stay in bounds, fractional part as the weight)."""
    r = state.res
    pos = uv * r - 0.5
    pos_floor = jnp.floor(pos)
    w = pos - pos_floor  # (B, 2) bilinear weights
    cx = jnp.clip(pos_floor[:, 0].astype(jnp.int32), 0, r - 2)
    cy = jnp.clip(pos_floor[:, 1].astype(jnp.int32), 0, r - 2)
    em = state.error_map
    wx, wy = w[:, 0], w[:, 1]
    em = em.at[img_idx, cy, cx].add((1 - wx) * (1 - wy) * loss)
    em = em.at[img_idx, cy, cx + 1].add(wx * (1 - wy) * loss)
    em = em.at[img_idx, cy + 1, cx].add((1 - wx) * wy * loss)
    em = em.at[img_idx, cy + 1, cx + 1].add(wx * wy * loss)
    return state._replace(error_map=em)


def rebuild_cdf(state: ErrorMapState) -> ErrorMapState:
    """Rebuild the sampling CDF as the exact joint of the reference's
    three-stage mixed sampling (construct_cdf_2d/1d + the CPU image CDF):

      p(img)      = (1-MIN_PMF) img_sum/total + MIN_PMF/N
      p(y | img)  = (1-MIN_PDF) row_sum/img_sum + MIN_PDF/H
      p(x | y,im) = (1-MIN_PDF) cell/row_sum + MIN_PDF/W

    then ZERO the accumulation map — the reference memsets it at the start
    of each window (testbed_nerf.cu:3484), so each CDF reflects only the
    most recent window's losses."""
    em = state.error_map + 1e-10  # construct_cdf_2d adds 1e-10 per cell
    n, h, wdt = em.shape
    row_sum = em.sum(axis=2)  # (N, H)
    img_sum = row_sum.sum(axis=1)  # (N,)
    total = img_sum.sum()

    p_img = (1.0 - MIN_PMF) * img_sum / total + MIN_PMF / n  # (N,)
    p_y = (1.0 - MIN_PDF) * row_sum / img_sum[:, None] + MIN_PDF / h  # (N,H)
    p_x = (1.0 - MIN_PDF) * em / row_sum[:, :, None] + MIN_PDF / wdt  # (N,H,W)

    weights = (p_img[:, None, None] * p_y[:, :, None] * p_x).reshape(-1)
    cdf = blocked_cumsum(weights)
    cdf = cdf / cdf[-1]
    return ErrorMapState(error_map=jnp.zeros_like(state.error_map), cdf=cdf)


def blocked_cumsum(x: jnp.ndarray, block: int = 4096) -> jnp.ndarray:
    """Two-level prefix sum: == jnp.cumsum(x) for 1D x, but TPU-safe at CDF
    scale.  XLA:TPU lowers a long 1D cumsum to a serial scan over the whole
    axis (a 2M-element cumsum never finished a 5-minute probe — PERF.md);
    blocking gives scan length ``block`` vectorized over rows plus one tiny
    scan over the per-block totals (48 views x 128^2 cells -> 786k cells =
    192 rows here)."""
    (n,) = x.shape
    if n <= block:
        return jnp.cumsum(x)
    k = -(-n // block)
    xp = jnp.pad(x, (0, k * block - n)).reshape(k, block)
    inner = jnp.cumsum(xp, axis=1)
    totals = inner[:, -1]
    offsets = jnp.cumsum(totals) - totals  # exclusive prefix of block sums
    return (inner + offsets[:, None]).reshape(-1)[:n]


def sample_pixels(
    state: ErrorMapState,
    key: jax.Array,
    n_rays: int,
    n_images: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Draw (img_idx (B,), uv (B,2)) from the error CDF, jittered in-cell."""
    r = state.res
    k_u, k_j = jax.random.split(key)
    u = jax.random.uniform(k_u, (n_rays,))
    # method="sort": the default binary-search lowering serializes per query
    # batch on TPU (engine/occupancy.py measured 21 s/call at scale).
    flat_idx = jnp.searchsorted(state.cdf, u, side="left", method="sort")
    flat_idx = jnp.minimum(flat_idx, n_images * r * r - 1)
    img = flat_idx // (r * r)
    cell = flat_idx % (r * r)
    cy = cell // r
    cx = cell % r
    jitter = jax.random.uniform(k_j, (n_rays, 2))
    uv = jnp.stack([(cx + jitter[:, 0]) / r, (cy + jitter[:, 1]) / r], axis=-1)
    return img, uv


def should_rebuild(step: int) -> bool:
    """Reference schedule: rebuild at 128, then every interval*1.5
    (testbed_nerf.cu:3555-3603) — equivalently at steps 128*1.5^k."""
    if step < 128:
        return False
    t = 128
    while t < step:
        t = int(t * 1.5)
    return step == t
