"""Error-map importance sampling over training pixels/images.

TPU-native restatement of the reference's error-map machinery
(reference: src/testbed_nerf.cu:1740-1765 loss deposit with bilinear
footprint, 2333-2388 construct_cdf_2d/construct_cdf_1d, 3555-3603 CDF rebuild
every 128 steps growing by 1.5x; sampling via image_idx /
nerf_random_image_pos_training in common_device.cuh).

Instead of separate per-row/marginal CDFs, a single flat CDF over all
(image, cell) bins is kept on device; sampling is one searchsorted per ray
(log2(bins) ~ 20 compares) and the deposit is a small scatter-add — both
trivially jit-able, no host sync.  The reference deliberately does NOT divide
the loss by the sampling pdf (testbed_nerf.cu:1901-1906 comment) — importance
sampling intentionally reweights the loss — and we reproduce that behavior.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

# Reference error-map resolution: 128x128 (testbed.h error_map.resolution
# default); we keep it configurable via init.
ERROR_MAP_RES = 32


class ErrorMapState(NamedTuple):
    error_map: jnp.ndarray  # (N_img, R, R) accumulated loss
    cdf: jnp.ndarray  # (N_img*R*R,) inclusive prefix sums (rebuilt lazily)

    @property
    def res(self) -> int:
        return self.error_map.shape[1]


def init_error_map(n_images: int, res: int = ERROR_MAP_RES) -> ErrorMapState:
    flat = n_images * res * res
    # Uniform CDF at init.
    return ErrorMapState(
        error_map=jnp.zeros((n_images, res, res), jnp.float32),
        cdf=jnp.arange(1, flat + 1, dtype=jnp.float32) / flat,
    )


def deposit(
    state: ErrorMapState,
    img_idx: jnp.ndarray,  # (B,)
    uv: jnp.ndarray,  # (B, 2)
    loss: jnp.ndarray,  # (B,) per-ray loss values
) -> ErrorMapState:
    """Accumulate per-ray losses into the map (nearest cell; the reference
    uses a bilinear footprint — nearest is sufficient at our cell sizes)."""
    r = state.res
    cx = jnp.clip((uv[:, 0] * r).astype(jnp.int32), 0, r - 1)
    cy = jnp.clip((uv[:, 1] * r).astype(jnp.int32), 0, r - 1)
    em = state.error_map.at[img_idx, cy, cx].add(loss)
    return state._replace(error_map=em)


def rebuild_cdf(state: ErrorMapState, decay: float = 0.5) -> ErrorMapState:
    """Rebuild the sampling CDF and decay the accumulated map
    (the reference halves the map on rebuild via its CDF normalization)."""
    flat = state.error_map.reshape(-1)
    # Smooth with a uniform floor so unvisited cells keep being explored.
    weights = flat + jnp.mean(flat) * 0.1 + 1e-8
    cdf = jnp.cumsum(weights)
    cdf = cdf / cdf[-1]
    return ErrorMapState(error_map=state.error_map * decay, cdf=cdf)


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
    flat_idx = jnp.searchsorted(state.cdf, u, side="left")
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
