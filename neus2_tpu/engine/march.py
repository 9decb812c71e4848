"""Fixed-shape occupancy-guided ray marching (inverse-CDF over occupied length).

TPU-native replacement for the reference's two-pass atomics-based sample
generation (reference: src/testbed_nerf.cu:1263-1449
generate_training_samples_nerf_with_global_movement) and the render-time
alive-ray compaction loop (2479-2595).  The reference marches each ray at a
fine fixed step (STEPSIZE = sqrt(3)/1024) skipping unoccupied voxels, and
allocates a *variable* number of samples per ray via atomics.  Neither maps to
TPU (dynamic shapes, global atomics).  Instead:

  1. Probe a fixed grid of ``n_candidates`` coarse intervals along the ray's
     AABB chord (cone-angle stepping for large scenes, reference calc_dt) and
     mask each by the occupancy bitfield — gathers only, no MLP;
  2. Compute the cumulative *occupied length* along the ray and draw exactly
     ``budget`` stratified samples from its inverse CDF.

Every ray that intersects occupied space gets exactly ``budget`` samples
(100% MXU utilization of the field evaluation); the effective step size
``dt = occupied_length / budget`` adapts per ray — coarse while the occupancy
grid is still permissive, *finer than the reference's* STEPSIZE once the grid
has converged to a thin shell around the surface.  Everything is
jit-compatible with static shapes and zero host syncs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neus2_tpu.constants import MIN_CONE_STEPSIZE
from neus2_tpu.engine.occupancy import OccupancyGrid, occupancy_at
from neus2_tpu.ops.warp import AABB


def cone_angle_for_scene(aabb_scale: float, constant: float = 1.0 / 256.0) -> float:
    """Cone angle rule (reference testbed_nerf.cu:3090): 0 for unit scenes."""
    return constant if aabb_scale > 1 else 0.0


class MarchedSamples(NamedTuple):
    t: jnp.ndarray  # (R, B) sample distance along ray
    dt: jnp.ndarray  # (R, B) step size at each sample
    positions: jnp.ndarray  # (R, B, 3) world-space positions
    mask: jnp.ndarray  # (R, B) validity
    n_valid: jnp.ndarray  # (R,) number of valid samples per ray


def coarse_intervals(
    tmin: jnp.ndarray,  # (R,)
    tmax: jnp.ndarray,  # (R,)
    n_candidates: int,
    cone_angle: float,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Candidate interval starts (R, C) and lengths (R, C) spanning the chord.

    With cone_angle == 0 the intervals are uniform over [tmin, tmax] (their
    length adapts to the chord, never below MIN_CONE_STEPSIZE).  With a cone
    angle (aabb_scale > 1) they are spaced EXPONENTIALLY per ray —
    t_i = tmin * r^i with r = (tmax/tmin)^(1/C) — the cone-marching density
    profile (dt proportional to t, reference calc_dt) but guaranteed to span
    the WHOLE chord: a literal reference-style scan (t += t*cone) truncates
    at ~1.6x tmin after C steps and silently never reaches geometry deep in
    a large scene (measured: the aabb_scale-4 outer sphere got zero samples
    and never trained — the reference marches with up to MARCH_ITER = 10000
    steps and has no such cap).
    """
    if cone_angle == 0.0:
        span = jnp.maximum(tmax - tmin, 0.0)
        dt = jnp.maximum(span / n_candidates, MIN_CONE_STEPSIZE)[:, None]
        steps = jnp.arange(n_candidates, dtype=jnp.float32)[None, :]
        t0 = tmin[:, None] + steps * dt
        return t0, jnp.broadcast_to(dt, t0.shape)

    t_lo = jnp.maximum(tmin, 10.0 * MIN_CONE_STEPSIZE)
    t_hi = jnp.maximum(tmax, t_lo * (1.0 + 1e-4))
    r = (t_hi / t_lo) ** (1.0 / n_candidates)  # (R,)
    i = jnp.arange(n_candidates, dtype=jnp.float32)[None, :]
    t0 = t_lo[:, None] * r[:, None] ** i
    dt = t0 * (r[:, None] - 1.0)
    return t0, dt


def march_probe(
    origins: jnp.ndarray,  # (R, 3)
    directions: jnp.ndarray,  # (R, 3) unit
    aabb: AABB,
    occupancy: OccupancyGrid | None,
    n_candidates: int,
    cone_angle: float = 0.0,
    near: float = 0.0,
) -> jnp.ndarray:
    """Total occupied length per ray (R,) — the march WITHOUT sample draws.

    Deterministic candidate midpoints; a ray with probe 0 draws mask-all-False
    samples from ``march_rays`` and composites to nothing, so callers may skip
    the field evaluation for such rays entirely (the render path's hit-ray
    compaction — the fixed-shape analog of the reference's alive-ray
    compaction rounds, testbed_nerf.cu:2479-2595)."""
    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, near)
    hit = tmin < tmax
    t0, dt_c = coarse_intervals(tmin, tmax, n_candidates, cone_angle)
    mid = t0 + 0.5 * dt_c
    valid_c = (mid < tmax[:, None]) & hit[:, None]
    if occupancy is not None:
        pos_c = origins[:, None, :] + mid[..., None] * directions[:, None, :]
        valid_c &= occupancy_at(occupancy, pos_c)
    return jnp.sum(jnp.where(valid_c, dt_c, 0.0), axis=-1)


class CandidateProbe(NamedTuple):
    """Per-ray coarse occupancy probe (the march without sample draws)."""

    t0: jnp.ndarray  # (R, C) candidate interval starts
    seg: jnp.ndarray  # (R, C) occupied interval lengths (0 where unoccupied)
    total: jnp.ndarray  # (R,) total occupied length
    hit: jnp.ndarray  # (R,) bool: ray enters the AABB AND has occupied length


def probe_candidates(
    key: jax.Array | None,
    origins: jnp.ndarray,  # (R, 3)
    directions: jnp.ndarray,  # (R, 3) unit
    aabb: AABB,
    occupancy: OccupancyGrid | None,
    n_candidates: int,
    cone_angle: float = 0.0,
    near: float = 0.0,
    probe_jitter: bool = True,
) -> CandidateProbe:
    """Probe ``n_candidates`` coarse intervals against the occupancy bitfield.

    Probe point within each candidate interval: jittered during training so
    intervals wider than an occupancy cell (exponential spacing in large
    scenes) still hit a thin occupied shell in expectation; deterministic
    midpoint (``probe_jitter=False``) for rendering.

    The result feeds ``draw_from_probe`` — and the training batch's hit-ray
    compaction (engine/train.py): probing ``oversample * R`` candidate rays
    once and drawing samples only for rays with ``hit`` is the fixed-shape
    analog of the reference's rays-per-batch auto-tune, which fills its 2^18
    compacted sample budget with contributing samples only
    (testbed_nerf.cu:3434-3435, 3922-3930)."""
    tmin, tmax = aabb.ray_intersect(origins, directions)
    tmin = jnp.maximum(tmin, near)
    enters = tmin < tmax

    t0, dt_c = coarse_intervals(tmin, tmax, n_candidates, cone_angle)  # (R, C)
    if probe_jitter:
        assert key is not None
        u_c = jax.random.uniform(key, t0.shape)
    else:
        u_c = 0.5
    mid = t0 + u_c * dt_c
    valid_c = (mid < tmax[:, None]) & enters[:, None]
    if occupancy is not None:
        pos_c = origins[:, None, :] + mid[..., None] * directions[:, None, :]
        valid_c &= occupancy_at(occupancy, pos_c)

    seg = jnp.where(valid_c, dt_c, 0.0)
    total = jnp.sum(seg, axis=-1)
    return CandidateProbe(
        t0=t0, seg=seg, total=total, hit=(total > 0.0) & enters
    )


def draw_from_probe(
    key: jax.Array,
    probe: CandidateProbe,
    origins: jnp.ndarray,  # (R, 3)
    directions: jnp.ndarray,  # (R, 3) unit
    budget: int,
    jitter: bool = True,
) -> MarchedSamples:
    """Draw exactly ``budget`` stratified samples per ray from the probe's
    occupied-length inverse CDF."""
    R = origins.shape[0]
    n_candidates = probe.t0.shape[1]
    cum = jnp.cumsum(probe.seg, axis=-1)  # (R, C) occupied length prefix
    total = probe.total

    # Stratified inverse-CDF draws over the occupied length.
    if jitter:
        xi = jax.random.uniform(key, (R, budget))
    else:
        xi = jnp.full((R, budget), 0.5)
    frac = (jnp.arange(budget, dtype=jnp.float32)[None, :] + xi) / budget
    # Clamp strictly below total: f32 rounding can give frac*total == total
    # for the top stratum, which would select past the last valid candidate.
    u = jnp.minimum(frac * total[:, None], total[:, None] * (1.0 - 1e-7))

    # Inverse CDF via a fused comparison-sum (equivalent to per-ray
    # searchsorted side="right", but one vectorized reduce instead of a
    # sequential binary-search loop of gathers — faster on TPU).
    idx = jnp.sum(
        (cum[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )
    idx = jnp.minimum(idx, n_candidates - 1)
    take = lambda a: jnp.take_along_axis(a, idx, axis=-1)
    cum_before = take(cum) - take(probe.seg)
    # Position inside the chosen occupied interval, exact inverse CDF
    # (clipped to the interval so rounding never places t past its end).
    t = take(probe.t0) + jnp.clip(u - cum_before, 0.0, take(probe.seg))
    dt = jnp.maximum(total[:, None] / budget, 1e-10)
    dt = jnp.broadcast_to(dt, t.shape)
    mask = jnp.broadcast_to(probe.hit[:, None], t.shape)

    pos = origins[:, None, :] + t[..., None] * directions[:, None, :]
    n_valid = jnp.sum(mask, axis=-1).astype(jnp.int32)
    return MarchedSamples(t=t, dt=dt, positions=pos, mask=mask, n_valid=n_valid)


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
    probe_jitter: bool | None = None,
) -> MarchedSamples:
    """Draw exactly ``budget`` samples per ray from the occupied-length CDF.

    ``jitter`` controls the stratified sample draws (spp averaging);
    ``probe_jitter`` (default: follow ``jitter``) controls the per-candidate
    occupancy probe point.  The render path passes ``probe_jitter=False`` so
    the valid-candidate set is the deterministic-midpoint one that
    ``march_probe`` computes — hit-ray compaction is then exact even for
    jittered multi-spp renders."""
    if probe_jitter is None:
        probe_jitter = jitter
    k_probe = None
    if probe_jitter:
        key, k_probe = jax.random.split(key)
    probe = probe_candidates(
        k_probe, origins, directions, aabb, occupancy, n_candidates,
        cone_angle=cone_angle, near=near, probe_jitter=probe_jitter,
    )
    return draw_from_probe(key, probe, origins, directions, budget, jitter)
