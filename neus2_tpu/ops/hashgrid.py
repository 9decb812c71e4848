"""Multiresolution hash-grid encoding (instant-ngp style), TPU-native.

This is the jnp reference implementation: a static per-level table layout plus
gather + trilinear interpolation.  The backward pass (scatter-add into the
table) and the *second-order* path needed by the eikonal loss (grad-of-grad
through the interpolation) come entirely from JAX autodiff — the reference
needs three hand-written second-order CUDA kernels for this
(reference: dependencies/my_tcnn/include/tiny-cuda-nn/encodings/grid.h:175-369
forward, 372+ backward, 881/1010/1183 second-order kernels).

Behavior contract reproduced from the reference:
  * per-level scale table uses the NeuS2 quirk ``scale = resolution - 1``
    (grid.h:1477) rather than the fractional instant-ngp scale;
  * resolution_l = ceil(2^(l*log2(per_level_scale)) * base_resolution - 1) + 1;
  * corner index: dense stride indexing while the level fits in the table,
    spatial hash (primes 1, 2654435761, 805459861) otherwise (grid.h:118-155);
  * positions are offset by +0.5 before flooring (common_device.h:416-424);
  * progressive level unlock: levels above ``valid_level`` output zeros, with
    valid_level = min(L, ceil(base_valid_level_scale*L +
    valid_level_scale*max(0, step - base_training_step))) (grid.h:2427-2440).

The TPU performance path (custom-VJP encoder, one gather + one segment-sum
pass) lives in ``hashgrid_fast.py``; this module is the always-correct
fallback and the test oracle.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

_PRIMES = (1, 2654435761, 805459861)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    """Static configuration (hashable; safe to close over in jit)."""

    n_levels: int = 14
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 16
    per_level_scale: float = 1.5
    # Progressive unlock schedule (base.json:35-38).
    valid_level_scale: float = 0.02
    base_valid_level_scale: float = 0.2
    base_training_step: int = 100
    grid_type: str = "Hash"  # "Hash" | "Dense" | "Tiled"

    @staticmethod
    def per_level_scale_from_top(
        base_resolution: int, top_resolution: int, n_levels: int
    ) -> float:
        """Derive per_level_scale from the top resolution.

        Matches Testbed::reset_network (reference src/testbed.cu:2183-2189):
        scale = exp(ln(top/base) / (L-1)).
        """
        return math.exp(
            math.log(top_resolution / base_resolution) / (n_levels - 1)
        )

    # ---- static per-level tables (computed eagerly, plain Python) ----
    def level_tables(self) -> tuple[Sequence[int], Sequence[float], Sequence[int], Sequence[int], Sequence[bool]]:
        """Returns (resolutions, scales, offsets, sizes, use_hash) per level."""
        resolutions, scales, offsets, sizes, use_hash = [], [], [], [], []
        offset = 0
        max_params = (2**32 - 1) // 2
        for lvl in range(self.n_levels):
            raw_scale = (
                math.exp2(lvl * math.log2(self.per_level_scale)) * self.base_resolution
                - 1.0
            )
            resolution = int(math.ceil(raw_scale)) + 1
            # NeuS2 quirk: the lookup scale is resolution-1, not raw_scale.
            scale = float(resolution - 1)
            dense = (
                max_params
                if float(resolution) ** 3 > max_params
                else resolution**3
            )
            params_in_level = _next_multiple(dense, 8)
            if self.grid_type == "Hash":
                params_in_level = min(params_in_level, 1 << self.log2_hashmap_size)
            elif self.grid_type == "Tiled":
                params_in_level = min(params_in_level, self.base_resolution**3)
            elif self.grid_type != "Dense":
                raise ValueError(f"invalid grid type {self.grid_type!r}")
            # Hash only when the dense grid does not fit (grid_index, grid.h:148).
            stride_exceeds = resolution**3 > params_in_level
            resolutions.append(resolution)
            scales.append(scale)
            offsets.append(offset)
            sizes.append(params_in_level)
            use_hash.append(self.grid_type == "Hash" and stride_exceeds)
            offset += params_in_level
        return resolutions, scales, offsets, sizes, use_hash

    @property
    def n_table_entries(self) -> int:
        _, _, offsets, sizes, _ = self.level_tables()
        return offsets[-1] + sizes[-1]

    @property
    def n_params(self) -> int:
        return self.n_table_entries * self.n_features_per_level

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def valid_level(self, step: jnp.ndarray) -> jnp.ndarray:
        """Progressive level unlock (grid.h:2427-2440). step<=0 => all levels."""
        raw = jnp.ceil(
            self.base_valid_level_scale * self.n_levels
            + self.valid_level_scale
            * jnp.maximum(0, step - self.base_training_step).astype(jnp.float32)
        ).astype(jnp.int32)
        unlocked = jnp.minimum(self.n_levels, raw)
        return jnp.where(step <= 0, self.n_levels, unlocked)


def init_hashgrid(key: jax.Array, config: HashGridConfig) -> jnp.ndarray:
    """Initialize the table ~ U(-1e-4, 1e-4) (tcnn grid.h initialize_params)."""
    return jax.random.uniform(
        key,
        (config.n_table_entries, config.n_features_per_level),
        jnp.float32,
        minval=-1e-4,
        maxval=1e-4,
    )


def _corner_indices(
    pos_grid: jnp.ndarray, resolution: int, size: int, use_hash: bool
) -> jnp.ndarray:
    """Flat table index of integer grid corners. pos_grid (..., 3) int32 -> (...,)."""
    if use_hash:
        pg = pos_grid.astype(jnp.uint32)
        idx = (
            pg[..., 0] * jnp.uint32(_PRIMES[0])
            ^ pg[..., 1] * jnp.uint32(_PRIMES[1])
            ^ pg[..., 2] * jnp.uint32(_PRIMES[2])
        )
        return (idx % jnp.uint32(size)).astype(jnp.int32)
    idx = (
        pos_grid[..., 0]
        + pos_grid[..., 1] * resolution
        + pos_grid[..., 2] * resolution * resolution
    )
    return idx % size


def hashgrid_encode(
    table: jnp.ndarray,  # (n_table_entries, F)
    positions: jnp.ndarray,  # (B, 3) warped positions in [0, 1]
    config: HashGridConfig,
    valid_level: jnp.ndarray | int | None = None,
    max_level: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Forward hash-grid encoding -> (B, L*F), fully differentiable.

    ``valid_level``: traced scalar; levels with index > valid_level output 0
    (note: *strictly greater*, matching grid.h:198 `if (level > valid_level)`).
    ``max_level``: optional (B,) per-sample fraction in [0,1]; level l is zeroed
    when l >= max_level * n_levels (grid.h:217-240).
    """
    resolutions, scales, offsets, sizes, use_hash = config.level_tables()
    outs = []
    for lvl in range(config.n_levels):
        pos = positions * scales[lvl] + 0.5
        pos_floor = jnp.floor(pos)
        frac = pos - pos_floor
        pos_grid = pos_floor.astype(jnp.int32)

        feat = jnp.zeros(
            positions.shape[:-1] + (config.n_features_per_level,), table.dtype
        )
        for corner in range(8):
            corner_offset = jnp.array(
                [(corner >> d) & 1 for d in range(3)], jnp.int32
            )
            w = jnp.prod(
                jnp.where(corner_offset == 1, frac, 1.0 - frac), axis=-1
            )
            idx = _corner_indices(
                pos_grid + corner_offset, resolutions[lvl], sizes[lvl], use_hash[lvl]
            )
            vals = jnp.take(table, offsets[lvl] + idx, axis=0)
            feat = feat + w[..., None] * vals

        gate = jnp.ones((), table.dtype)
        if valid_level is not None:
            gate = gate * (lvl <= jnp.asarray(valid_level)).astype(table.dtype)
        if max_level is not None:
            per_sample = (lvl < max_level * config.n_levels + 1e-3).astype(table.dtype)
            feat = feat * per_sample[..., None]
        outs.append(feat * gate)
    return jnp.concatenate(outs, axis=-1)
