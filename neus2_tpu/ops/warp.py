"""Coordinate warps between world space and network-input space.

Behavior contract from the reference (src/testbed_nerf.cu:445-492):
  * positions are warped to the unit cube relative to the scene AABB,
  * directions are warped from [-1,1] to [0,1],
  * dt is normalized by the min/max cone step sizes.
All network inputs live in warped space; the SDF (and hence the eikonal
constraint) is therefore expressed in warped units.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from neus2_tpu.constants import MAX_CONE_STEPSIZE, MIN_CONE_STEPSIZE


class AABB(NamedTuple):
    """Axis-aligned bounding box (reference bounding_box.cuh)."""

    lo: jnp.ndarray  # (3,)
    hi: jnp.ndarray  # (3,)

    @property
    def diag(self) -> jnp.ndarray:
        return self.hi - self.lo

    @property
    def center(self) -> jnp.ndarray:
        return 0.5 * (self.lo + self.hi)

    def contains(self, pos: jnp.ndarray) -> jnp.ndarray:
        return jnp.all((pos >= self.lo) & (pos <= self.hi), axis=-1)

    def relative_pos(self, pos: jnp.ndarray) -> jnp.ndarray:
        return (pos - self.lo) / self.diag

    def ray_intersect(
        self, origin: jnp.ndarray, direction: jnp.ndarray
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Slab-test ray/AABB intersection -> (tmin, tmax), tmin <= tmax if hit.

        Matches BoundingBox::ray_intersect (bounding_box.cuh): returns entry and
        exit distances along the ray; no hit iff tmin > tmax.
        """
        inv_d = 1.0 / direction
        t0 = (self.lo - origin) * inv_d
        t1 = (self.hi - origin) * inv_d
        tmin = jnp.max(jnp.minimum(t0, t1), axis=-1)
        tmax = jnp.min(jnp.maximum(t0, t1), axis=-1)
        return tmin, tmax


def unit_aabb() -> AABB:
    return AABB(jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32))


def scene_aabb(aabb_scale: float) -> AABB:
    """The reference's scene AABB: unit cube inflated around (0.5,)*3 by scale."""
    half = 0.5 * float(aabb_scale)
    center = jnp.full((3,), 0.5, jnp.float32)
    return AABB(center - half, center + half)


def warp_position(pos: jnp.ndarray, aabb: AABB) -> jnp.ndarray:
    return aabb.relative_pos(pos)


def unwarp_position(pos: jnp.ndarray, aabb: AABB) -> jnp.ndarray:
    return aabb.lo + pos * aabb.diag


def warp_direction(direction: jnp.ndarray) -> jnp.ndarray:
    return (direction + 1.0) * 0.5


def unwarp_direction(direction: jnp.ndarray) -> jnp.ndarray:
    return direction * 2.0 - 1.0


def warp_dt(dt: jnp.ndarray) -> jnp.ndarray:
    return (dt - MIN_CONE_STEPSIZE) / (MAX_CONE_STEPSIZE - MIN_CONE_STEPSIZE)


def unwarp_dt(dt: jnp.ndarray) -> jnp.ndarray:
    return dt * (MAX_CONE_STEPSIZE - MIN_CONE_STEPSIZE) + MIN_CONE_STEPSIZE
