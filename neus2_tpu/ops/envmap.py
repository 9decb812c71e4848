"""Learnable environment map (background) and lens distortion grid.

Mirrors two optional reference subsystems:
  * envmap: a lat-long RGBA environment texture composited behind the scene,
    trained jointly (reference: read_envmap in common_device.cuh, the envmap
    composite at testbed_nerf.cu:1650-1655, config configs/nerf/base.json:93);
  * distortion map: a learnable 32x32 pixel-space warp grid added to the
    camera uv (reference: distortion_map config base.json:76,
    m_distortion_map trainer in testbed.cu:2253+).

Both are plain differentiable lookups here — their gradients come from the
shared training loss instead of dedicated CUDA trainers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_envmap(key: jax.Array, resolution=(16, 32)) -> jnp.ndarray:
    """(H, W, 4) RGBA lat-long map, near-zero init (transparent)."""
    h, w = resolution
    return jax.random.uniform(key, (h, w, 4), jnp.float32, 0.0, 1e-4)


def _bilinear(grid: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Bilinear lookup; grid (H, W, C), x in [0, W), y in [0, H)."""
    h, w = grid.shape[:2]
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 1)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = jnp.clip(x - x0, 0.0, 1.0)[..., None]
    fy = jnp.clip(y - y0, 0.0, 1.0)[..., None]
    g = lambda yy, xx: grid[yy, xx]
    return (
        g(y0, x0) * (1 - fx) * (1 - fy)
        + g(y0, x1) * fx * (1 - fy)
        + g(y1, x0) * (1 - fx) * fy
        + g(y1, x1) * fx * fy
    )


def envmap_lookup(envmap: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """RGBA from the lat-long map for world directions (..., 3)."""
    h, w = envmap.shape[:2]
    d = dirs / jnp.maximum(jnp.linalg.norm(dirs, axis=-1, keepdims=True), 1e-8)
    phi = jnp.arctan2(d[..., 1], d[..., 0])  # [-pi, pi]
    theta = jnp.arccos(jnp.clip(d[..., 2], -1.0, 1.0))  # [0, pi]
    x = (phi / (2 * jnp.pi) + 0.5) * (w - 1)
    y = theta / jnp.pi * (h - 1)
    return _bilinear(envmap, x, y)


def composite_envmap_background(
    envmap: jnp.ndarray, dirs: jnp.ndarray, bg: jnp.ndarray
) -> jnp.ndarray:
    """background' = env.rgb + bg * (1 - env.a) (testbed_nerf.cu:1650-1655)."""
    env = envmap_lookup(envmap, dirs)
    return env[..., :3] + bg * (1.0 - env[..., 3:4])


def init_distortion(resolution=(32, 32)) -> jnp.ndarray:
    """(H, W, 2) uv-offset grid, zero init (reference distortion_map)."""
    h, w = resolution
    return jnp.zeros((h, w, 2), jnp.float32)


def apply_distortion(grid: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """uv' = uv + bilinear(grid, uv); uv in [0,1]^2."""
    h, w = grid.shape[:2]
    off = _bilinear(grid, uv[..., 0] * (w - 1), uv[..., 1] * (h - 1))
    return uv + off
