"""Occupancy (density) grid: cascaded 128^3 EMA grid + bitfield, fully on-device.

TPU-native restatement of the reference's density-grid maintenance
(reference: src/testbed_nerf.cu:640-800 splat/EMA/bitfield/maxpool kernels and
3293-3397 update_density_grid_nerf / update_density_grid_mean_and_bitfield):

  * grid value = NeuS logistic density s*sig(s*sdf)*(1-sig(s*sdf)) probed at a
    jittered position inside each cell;
  * EMA merge: val' = max(val * decay, probe) (unprobed cells simply decay);
  * bitfield: val > min(NERF_MIN_OPTICAL_THICKNESS, mean(cascade-0 density));
  * cascade k covers the box of side 2^k centered at (0.5,)^3; coarser
    cascades also inherit (max-pool) the finer cascade's bits in their
    central half (reference bitfield_max_pool).

Probing is a deterministic ROUND-ROBIN PERMUTATION SWEEP: every update
probes the next ``n_probe`` cells of a fixed pseudo-random permutation of
all cells, so EVERY cell is re-measured exactly once per
``ceil(n_cells/n_probe)`` updates, and the EMA decay is calibrated to that
sweep period ("no cell is forgotten faster than the system re-measures
it" — engine/train.py occupancy_update).  This replaces the reference's
scheme (decay 0.95 EVERY step + ~1M probes/step: half uniform, half
rejection-sampled over occupied cells) with the same steady state at ~1/8
the probe volume.  Designs that were tried and measured to fail:

  * slow fixed decay at a 16-step cadence (round 1): the early-training fat
    shell never culls — occ_len 0.21 after 1024 steps, the adaptive
    (rays, samples) buckets never engage;
  * probe-driven decay (unprobed cells keep their value): mass-stale
    regions never die — an aabb_scale-4 init band held 5.5M of 6.3M cells
    for 900+ steps;
  * an occupied-cell "hot ring" (capacity 2^19-2^20) with in-place refresh:
    saturates whenever the interesting set exceeds capacity (any early fat
    shell), silently dropping novel cells, which then flicker at the sweep
    duty cycle — measured whole-scene training collapse at aabb_scale 4;
  * CDF/searchsorted importance sampling over the bitfield: XLA:TPU
    serializes both large cumsums and batched binary search (~13 s/call at
    2M cells).

The deterministic sweep has none of these failure modes: uniform guaranteed
refresh, exact cadence, zero auxiliary state.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neus2_tpu.constants import (
    DENSITY_GRID_DECAY,
    NERF_GRIDSIZE,
    NERF_MIN_OPTICAL_THICKNESS,
)

# A prime much larger than any cell count, used to build the probe permutation
# i -> (i * PRIME) % n_cells (bijective when gcd(PRIME, n_cells) == 1; n_cells
# is a power of two times a cascade count, and the prime is odd).
_PROBE_PRIME = 2654435761


class OccupancyGrid(NamedTuple):
    density: jnp.ndarray  # (C, G, G, G) float32, -1 marks culled cells
    bitfield: jnp.ndarray  # (C, G, G, G) bool
    ema_step: jnp.ndarray  # () int32

    @property
    def n_cascades(self) -> int:
        return self.density.shape[0]

    @property
    def grid_size(self) -> int:
        return self.density.shape[1]


def init_occupancy(n_cascades: int = 1, grid_size: int = NERF_GRIDSIZE) -> OccupancyGrid:
    shape = (n_cascades, grid_size, grid_size, grid_size)
    return OccupancyGrid(
        density=jnp.zeros(shape, jnp.float32),
        bitfield=jnp.zeros(shape, bool),
        ema_step=jnp.zeros((), jnp.int32),
    )


def cell_position(
    cell_idx: jnp.ndarray, cascade: jnp.ndarray, jitter: jnp.ndarray, grid_size: int
) -> jnp.ndarray:
    """World position of a jittered point inside a cell.

    Matches generate_grid_samples_nerf_nonuniform (testbed_nerf.cu:660-667):
    pos = ((cell + u)/G - 0.5) * 2^cascade + 0.5 with u ~ U[0,1)^3.
    """
    xyz = jnp.stack(
        [
            cell_idx % grid_size,
            (cell_idx // grid_size) % grid_size,
            cell_idx // (grid_size * grid_size),
        ],
        axis=-1,
    ).astype(jnp.float32)
    scale = jnp.exp2(cascade.astype(jnp.float32))[..., None]
    return ((xyz + jitter) / grid_size - 0.5) * scale + 0.5


def probe_cells(
    state: OccupancyGrid, key: jax.Array, n_probe: int
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """The next ``n_probe`` cells of the round-robin permutation sweep.

    Returns (flat cell indices (P,), cascade indices (P,), world
    positions (P,3)).
    """
    c = state.n_cascades
    g = state.grid_size
    g3 = g * g * g  # power of two (g = 128), so uint32 wraparound is benign
    base = (state.ema_step.astype(jnp.uint32) * jnp.uint32(n_probe)).astype(
        jnp.uint32
    )
    i = jnp.arange(n_probe, dtype=jnp.uint32) + base
    # Bijection over any n_cells consecutive i: the cascade cycles fastest
    # (i mod c) so every probe PREFIX spreads across all cascades (the
    # step-0 prior sweep relies on this), and the within-cascade cell is a
    # fixed-point-scramble of i//c modulo the power-of-two g^3 — where the
    # uint32 product wrap IS the modulus, so the permutation is exact.
    # A single (i * PRIME) % n_cells does NOT permute when n_cells is not a
    # power of two (3/5/6/7-cascade scenes): the product wraps mod 2^32
    # before the reduction, and measured ~14% of cells were never probed
    # per sweep — starving their EMA against the sweep-calibrated decay.
    cell = (
        ((i // jnp.uint32(c)) * jnp.uint32(_PROBE_PRIME)) % jnp.uint32(g3)
    ).astype(jnp.int32)
    cascade = (i % jnp.uint32(c)).astype(jnp.int32)
    flat = cascade * g3 + cell
    jitter = jax.random.uniform(key, (n_probe, 3))
    pos = cell_position(cell, cascade, jitter, g)
    return flat, cascade, pos


def merge_probes(
    state: OccupancyGrid,
    flat_idx: jnp.ndarray,
    densities: jnp.ndarray,
    decay: float = DENSITY_GRID_DECAY,
) -> OccupancyGrid:
    """Scatter-max the probe densities and EMA-merge into the grid.

    Universal EMA-max, matching the reference's ema_grid_samples_nerf:
    every cell decays every update, probes only raise.  The caller passes
    a decay calibrated to the sweep period (see module docstring)."""
    c, g = state.n_cascades, state.grid_size
    tmp = jnp.zeros((c * g * g * g,), jnp.float32).at[flat_idx].max(densities)
    prev = state.density.reshape(-1)
    merged = jnp.where(prev < 0.0, prev, jnp.maximum(prev * decay, tmp))
    return state._replace(
        density=merged.reshape(state.density.shape),
        ema_step=state.ema_step + 1,
    )


def update_bitfield(state: OccupancyGrid) -> OccupancyGrid:
    """Threshold to bits + cascade max-pool (reference grid_to_bitfield +
    bitfield_max_pool, testbed_nerf.cu:748-795)."""
    g = state.grid_size
    mean0 = jnp.mean(jnp.maximum(state.density[0], 0.0))
    thresh = jnp.minimum(NERF_MIN_OPTICAL_THICKNESS, mean0)
    bits = state.density > thresh
    # Coarser cascades inherit the finer cascade's occupancy in their central
    # half: maxpool cascade k's G^3 down to (G/2)^3 and OR into cascade k+1.
    if state.n_cascades > 1:
        levels = [bits[0]]
        q = g // 4
        for k in range(1, state.n_cascades):
            finer = levels[k - 1]
            pooled = finer.reshape(g // 2, 2, g // 2, 2, g // 2, 2).any(axis=(1, 3, 5))
            lvl = bits[k].at[q : 3 * q, q : 3 * q, q : 3 * q].max(pooled)
            levels.append(lvl)
        bits = jnp.stack(levels)
    return state._replace(bitfield=bits)


def reset_density(state: OccupancyGrid) -> OccupancyGrid:
    """Re-seed all cells (reference reset_density_grid_nerf,
    testbed_nerf.cu:3205: used after a global-movement phase)."""
    return init_occupancy(state.n_cascades, state.grid_size)


def mip_from_pos(pos: jnp.ndarray, max_cascade: int) -> jnp.ndarray:
    """Smallest cascade whose box contains pos (reference common_device.cuh)."""
    d = jnp.max(jnp.abs(pos - 0.5), axis=-1)
    # cascade k covers |x-0.5| < 2^(k-1); exponent of the float is the mip.
    mip = jnp.ceil(jnp.log2(jnp.maximum(d * 2.0, 1e-10)))
    return jnp.clip(mip, 0, max_cascade).astype(jnp.int32)


def packed_bitfield(state: OccupancyGrid) -> jnp.ndarray:
    """Bitfield packed to (C*G^3/32,) uint32 words (bit j of word w = cell
    32*w + j).  Recomputed inside jit from the bool grid (a 2M-element
    reduce, ~0.1 ms) so the snapshot format and the OccupancyGrid pytree
    stay unchanged; XLA CSEs repeated calls within one program."""
    bits = state.bitfield.reshape(-1, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, :]
    return jnp.sum(bits * weights, axis=-1, dtype=jnp.uint32)


def _packed_lookup(words: jnp.ndarray, flat: jnp.ndarray) -> jnp.ndarray:
    word = jnp.take(words, flat >> 5, axis=0)
    return ((word >> (flat & 31).astype(jnp.uint32)) & 1).astype(bool)


def occupancy_at(state: OccupancyGrid, pos: jnp.ndarray) -> jnp.ndarray:
    """Bitfield lookup at world positions (..., 3) using the per-point mip.

    The lookup gathers from the PACKED bitfield — one flat int32 index into
    a (C*G^3/32,) word table instead of 4-D advanced indexing into the bool
    grid: fewer index operands for XLA's gather and a 32x smaller table
    (measured ~12% on the raw probe, more with the index plumbing;
    tools_probe_micro.py / tools_probe_march.py)."""
    g = state.grid_size
    words = packed_bitfield(state)
    if state.n_cascades == 1:
        # Single-cascade fast path: no per-point mip (log2/ceil) needed.
        cell = jnp.floor(pos * g).astype(jnp.int32)
        inside = jnp.all((cell >= 0) & (cell < g), axis=-1)
        cell = jnp.clip(cell, 0, g - 1)
        flat = (cell[..., 2] * g + cell[..., 1]) * g + cell[..., 0]
        return _packed_lookup(words, flat) & inside
    mip = mip_from_pos(pos, state.n_cascades - 1)
    scale = jnp.exp2(-mip.astype(jnp.float32))[..., None]
    rel = (pos - 0.5) * scale + 0.5
    cell = jnp.floor(rel * g).astype(jnp.int32)
    inside = jnp.all((cell >= 0) & (cell < g), axis=-1)
    cell = jnp.clip(cell, 0, g - 1)
    # Flat cell index convention is x-fastest (cell_position), so the (G,G,G)
    # array axes are (z, y, x).
    flat = ((mip * g + cell[..., 2]) * g + cell[..., 1]) * g + cell[..., 0]
    return _packed_lookup(words, flat) & inside
