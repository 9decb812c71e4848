"""Sort + Pallas tile-reduce segment sum: the fast hashgrid-backward path.

The hashgrid backward must compute ``dense[r] = sum of upd[m] where
idx[m] == r`` for M ~ 2^21 updates into T = 2^19 table rows, per level — the
TPU analog of the reference's fp16 ``atomicAdd`` hash-table accumulation
(reference: my_tcnn/include/tiny-cuda-nn/encodings/grid.h:372-800
kernel_grid_backward).  TPUs have no scatter hardware; XLA lowers scatter-add
to a serialized per-update loop (~17-60 ns/update, PERF.md), and the round-1
sort-based ``segment_dense_sum`` costs two full (M+T)-element multi-operand
sorts (~21 ms/level).

This module cuts that to ONE 2-operand sort + a Pallas kernel:

  1. sort [idx, packed-bf16 payload] (lax.sort, stable bitonic — the one
     data-dependent routing step);
  2. ``searchsorted`` the (static) tile boundaries -> per-tile element
     offsets (n_rows/row_block scalars, cheap);
  3. a Pallas kernel, one grid step per 512-row output tile: DMA the tile's
     (now contiguous) slice of updates into VMEM and accumulate with a
     one-hot matmul on the MXU — ``out[f, w] = sum_e vals[f, e] *
     (idx[e] - tile_base == w)``.  Elements outside the tile's row range
     (DMA alignment slack, neighboring tiles, padding) match no lane and
     drop out for free.

Accumulation is fp32 inside the matmul — unlike the cumsum-differencing
path there is NO catastrophic-cancellation risk (ADVICE.md round 1); the
only rounding is one bf16 quantization of each update riding through the
sort, matching the reference's fp16 atomics precision.

CAPACITY CONTRACT: each tile's updates must fit the DMA window
(``elems_cap``).  With hashed (uniform) indices and the default
cap = max(4096, 4x the mean tile load) the overflow probability is
astronomically small; use this path for hashed levels only — dense coarse
levels concentrate load and go through ``ops.scatter.segment_dense_sum``.
``debug_overflow_check`` measures the true max load for tests/tuning.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128
_SUBLANE = 8
_PAD_IDX = np.int32(2**31 - 1)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def pack_bf16_pairs(upd: jnp.ndarray) -> jnp.ndarray:
    """(M, F) f32 -> (M, ceil(F/2)) int32 of packed bf16 pairs."""
    m, f = upd.shape
    if f % 2:
        upd = jnp.concatenate([upd, jnp.zeros((m, 1), upd.dtype)], axis=1)
    b = upd.astype(jnp.bfloat16)
    return jax.lax.bitcast_convert_type(
        b.reshape(m, -1, 2), jnp.int32
    ).reshape(m, -1)


def unpack_bf16_pairs(packed: jnp.ndarray, f: int) -> jnp.ndarray:
    """(M, P) int32 -> (M, F) f32."""
    m = packed.shape[0]
    b = jax.lax.bitcast_convert_type(packed, jnp.bfloat16).reshape(m, -1)
    return b[:, :f].astype(jnp.float32)


def _tile_kernel(ncap: int, row_block: int, chunk: int, f_pad: int):
    n_chunks = ncap // chunk

    def kernel(e0_ref, idx_hbm, vals_hbm, out_ref, idx_s, vals_s, sem):
        j = pl.program_id(0)
        # e0 is host-computed as (offs // LANE) * LANE; Mosaic needs the
        # alignment *proved* to allow a dynamic-offset DMA slice (the v5e
        # compiler otherwise rejects: "tile index in dimension 1 is
        # divisible by the tiling (128)").
        e0 = pl.multiple_of(e0_ref[j], _LANE)
        cp_i = pltpu.make_async_copy(
            idx_hbm.at[:, pl.ds(e0, ncap)], idx_s, sem.at[0]
        )
        cp_v = pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds(e0, ncap)], vals_s, sem.at[1]
        )
        cp_i.start()
        cp_v.start()
        cp_i.wait()
        cp_v.wait()

        base = j * row_block
        rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, 1), 0)

        def body(c, acc):
            local = idx_s[:, pl.ds(c * chunk, chunk)] - base  # (1, chunk)
            onehot_t = (rows == local).astype(jnp.float32)  # (row_block, chunk)
            v = vals_s[:, pl.ds(c * chunk, chunk)]  # (f_pad, chunk)
            return acc + jax.lax.dot_general(
                v,
                onehot_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_ref[:] = jax.lax.fori_loop(
            0, n_chunks, body, jnp.zeros((f_pad, row_block), jnp.float32)
        )

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_rows", "row_block", "elems_cap", "interpret")
)
def sorted_segment_sum_tiles(
    idx_sorted: jnp.ndarray,  # (M,) int32, ascending
    vals_planar: jnp.ndarray,  # (F, M) f32, same order as idx_sorted
    n_rows: int,
    row_block: int = 512,
    elems_cap: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-row sums of a SORTED update stream -> (n_rows, F) f32."""
    m = idx_sorted.shape[0]
    f = vals_planar.shape[0]
    assert n_rows % row_block == 0, (n_rows, row_block)
    n_tiles = n_rows // row_block
    if elems_cap is None:
        mean = m / n_tiles
        elems_cap = max(2048, _round_up(int(4 * mean), _LANE))
    elems_cap = _round_up(elems_cap, _LANE)
    chunk = min(512, elems_cap)
    f_pad = _round_up(f, _SUBLANE)

    m_pad = _round_up(m, _LANE) + elems_cap
    idx_p = jnp.full((1, m_pad), _PAD_IDX, jnp.int32).at[0, :m].set(idx_sorted)
    vals_p = jnp.zeros((f_pad, m_pad), jnp.float32).at[:f, :m].set(vals_planar)

    bounds = jnp.arange(n_tiles, dtype=jnp.int32) * row_block
    offs = jnp.searchsorted(idx_sorted, bounds, side="left").astype(jnp.int32)
    e0 = (offs // _LANE) * _LANE  # aligned DMA starts

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (f_pad, row_block), lambda j, e0_ref: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((1, elems_cap), jnp.int32),
            pltpu.VMEM((f_pad, elems_cap), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _tile_kernel(elems_cap, row_block, chunk, f_pad),
        out_shape=jax.ShapeDtypeStruct((f_pad, n_rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(e0, idx_p, vals_p)
    return out[:f].T


def segment_sum_sorttile(
    idx: jnp.ndarray,  # (M,) int32 in [0, n_rows)
    upd: jnp.ndarray,  # (M, F) f32
    n_rows: int,
    row_block: int = 512,
    elems_cap: int | None = None,
    pack: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """``zeros((n_rows, F)).at[idx].add(upd)`` via sort + tile reduce.

    ``pack=True`` carries the values through the sort as bf16 pairs (one
    int32 sort operand per 2 channels — the reference accumulates in fp16,
    grid.h:1428-1439, so this loses no parity precision); ``pack=False``
    carries fp32 operands (exact, ~20% slower sort).
    """
    f = upd.shape[1]
    if pack:
        payload = pack_bf16_pairs(upd)
        ops = jax.lax.sort(
            [idx] + [payload[:, i] for i in range(payload.shape[1])], num_keys=1
        )
        idx_s = ops[0]
        vals = unpack_bf16_pairs(jnp.stack(ops[1:], axis=1), f)
    else:
        ops = jax.lax.sort([idx] + [upd[:, i] for i in range(f)], num_keys=1)
        idx_s = ops[0]
        vals = jnp.stack(ops[1:], axis=1)
    return sorted_segment_sum_tiles(
        idx_s,
        vals.T,
        n_rows,
        row_block=row_block,
        elems_cap=elems_cap,
        interpret=interpret,
    )


def debug_overflow_check(
    idx: jnp.ndarray, n_rows: int, row_block: int = 512
) -> jnp.ndarray:
    """Max elements any tile must cover (incl. alignment slack).  The kernel
    is exact iff this is <= elems_cap."""
    idx_s = jnp.sort(idx)
    n_tiles = n_rows // row_block
    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * row_block
    offs = jnp.searchsorted(idx_s, bounds[:-1], side="left")
    ends = jnp.concatenate(
        [offs[1:], jnp.array([idx.shape[0]], offs.dtype)]
    )
    return jnp.max(ends - (offs // _LANE) * _LANE)
