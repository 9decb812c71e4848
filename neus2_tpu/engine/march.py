"""Fixed-shape masked ray marching.

TPU-native replacement for the reference's two-pass atomics-based sample
generation (reference: src/testbed_nerf.cu:1263-1449
generate_training_samples_nerf_with_global_movement) and the render-time
compaction loop (2479-2595).  Instead of data-dependent sample counts:

  1. generate ``n_candidates`` candidate positions per ray by marching from a
     jittered start with the reference's cone-angle step rule
     (calc_dt: dt = clamp(t*cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE));
  2. mask candidates by AABB membership and occupancy-grid lookups;
  3. stably compact the first ``budget`` valid candidates per ray into a fixed
     (R, budget) buffer (argsort on the validity key — the TPU analog of the
     reference's atomic sample-range allocation).

Everything is jit-compatible with static shapes; empty space costs a gather
instead of an MLP evaluation, which is the same asymptotic win the occupancy
grid gives the reference.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neus2_tpu.constants import MAX_CONE_STEPSIZE, MIN_CONE_STEPSIZE
from neus2_tpu.engine.occupancy import OccupancyGrid, occupancy_at
from neus2_tpu.ops.warp import AABB


def calc_dt(t: jnp.ndarray, cone_angle: float) -> jnp.ndarray:
    """Reference calc_dt (testbed_nerf.cu): clamp(t*cone, dt_min, dt_max)."""
    return jnp.clip(t * cone_angle, MIN_CONE_STEPSIZE, MAX_CONE_STEPSIZE)


def cone_angle_for_scene(aabb_scale: float, constant: float = 1.0 / 256.0) -> float:
    """Cone angle rule (reference testbed_nerf.cu:3090): 0 for unit scenes."""
    return constant if aabb_scale > 1 else 0.0


class MarchedSamples(NamedTuple):
    t: jnp.ndarray  # (R, K) sample distance along ray
    dt: jnp.ndarray  # (R, K) step size at each sample
    positions: jnp.ndarray  # (R, K, 3) world-space positions
    mask: jnp.ndarray  # (R, K) validity
    n_valid: jnp.ndarray  # (R,) number of valid samples per ray


def candidate_ts(
    start: jnp.ndarray,  # (R,)
    n_candidates: int,
    cone_angle: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """March distances (R, S) and the dt at each (R, S)."""
    if cone_angle == 0.0:
        # Constant dt: closed form, no scan.
        steps = jnp.arange(n_candidates, dtype=jnp.float32)
        t = start[:, None] + steps[None, :] * MIN_CONE_STEPSIZE
        dt = jnp.full_like(t, MIN_CONE_STEPSIZE)
        return t, dt

    def body(t, _):
        dt = calc_dt(t, cone_angle)
        return t + dt, (t, dt)

    _, (ts, dts) = jax.lax.scan(body, start, None, length=n_candidates)
    return ts.T, dts.T


def march_rays(
    key: jax.Array,
    origins: jnp.ndarray,  # (R, 3)
    directions: jnp.ndarray,  # (R, 3) unit
    aabb: AABB,
    occupancy: OccupancyGrid | None,
    n_candidates: int,
    budget: int,
    cone_angle: float = 0.0,
    near: float = 0.0,
    jitter: bool = True,
) -> MarchedSamples:
    """Generate up to ``budget`` occupancy-masked samples per ray."""
    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, near)
    hit = tmin < tmax
    if jitter:
        u = jax.random.uniform(key, tmin.shape)
    else:
        u = jnp.full(tmin.shape, 0.5)
    start = tmin + calc_dt(tmin, cone_angle) * u

    t, dt = candidate_ts(start, n_candidates, cone_angle)  # (R, S)
    pos = origins[:, None, :] + t[..., None] * directions[:, None, :]
    valid = (t < tmax[:, None]) & hit[:, None]
    if occupancy is not None:
        valid &= occupancy_at(occupancy, pos)

    # Stable compaction: order candidates by (invalid, index) and keep the
    # first `budget`. jnp.argsort(stable) preserves front-to-back order.
    order = jnp.argsort(jnp.where(valid, 0, 1), axis=-1, stable=True)
    sel = order[:, :budget]
    t_sel = jnp.take_along_axis(t, sel, axis=-1)
    dt_sel = jnp.take_along_axis(dt, sel, axis=-1)
    mask_sel = jnp.take_along_axis(valid, sel, axis=-1)
    pos_sel = origins[:, None, :] + t_sel[..., None] * directions[:, None, :]
    return MarchedSamples(
        t=t_sel,
        dt=dt_sel,
        positions=pos_sel,
        mask=mask_sel,
        n_valid=jnp.sum(valid, axis=-1).astype(jnp.int32),
    )
