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
cap = max(2048, 4x the mean tile load) the overflow probability is
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


def _batched_kernel(row_block: int, chunk: int, f_pad: int):
    """Grid (L, n_tiles); each step reduces ONE level's tile with a
    dynamic-length chunk loop (no capacity contract: a tile covering many
    elements just loops more)."""

    def kernel(off_ref, idx_hbm, vals_hbm, out_ref, idx_s, vals_s, sem):
        l = pl.program_id(0)
        j = pl.program_id(1)
        start = off_ref[l, j]
        end = off_ref[l, j + 1]
        # Align the DMA window start down to the lane size; leading elements
        # belong to earlier rows and match no lane below.  Mosaic requires
        # the alignment proved (pl.multiple_of) for dynamic HBM slices.
        e0 = (start // _LANE) * _LANE
        n_chunks = (end - e0 + chunk - 1) // chunk

        base = j * row_block
        rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, 1), 0)

        def body(c, acc):
            s = pl.multiple_of(e0 + c * chunk, _LANE)
            cp_i = pltpu.make_async_copy(
                idx_hbm.at[l, :, pl.ds(s, chunk)], idx_s, sem.at[0]
            )
            cp_v = pltpu.make_async_copy(
                vals_hbm.at[l, :, pl.ds(s, chunk)], vals_s, sem.at[1]
            )
            cp_i.start()
            cp_v.start()
            cp_i.wait()
            cp_v.wait()
            local = idx_s[:, :] - base  # (1, chunk); <0 or >=rb match nothing
            # bf16 MXU operands: fp32 matmuls cost 3x bf16 passes on the MXU
            # and both operands are exactly representable (onehot is 0/1;
            # vals rode the sort as bf16 when pack=True).  fp32 accumulate.
            onehot_t = (rows == local).astype(jnp.bfloat16)  # (rb, chunk)
            return acc + jax.lax.dot_general(
                vals_s[:, :].astype(jnp.bfloat16),
                onehot_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_ref[:] = jax.lax.fori_loop(
            0,
            n_chunks,
            body,
            jnp.zeros((f_pad, row_block), jnp.float32),
            unroll=False,
        )[None]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_rows", "row_block", "chunk", "interpret")
)
def sorted_segment_sum_tiles_batched(
    idx_sorted: jnp.ndarray,  # (L, Mp) int32, ascending per level (padded)
    vals_planar: jnp.ndarray,  # (L, F, Mp) f32, same order
    n_rows: int,
    row_block: int = 512,
    chunk: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-row sums for L independent sorted update streams -> (L, n_rows, F).

    Unlike ``sorted_segment_sum_tiles`` there is NO capacity contract: each
    tile walks its true element range in ``chunk``-sized DMA steps, so any
    index distribution (hashed or dense) is exact.  One kernel covers all
    levels; levels whose true table is smaller than ``n_rows`` simply have
    empty high tiles."""
    L, m_pad = idx_sorted.shape
    f = vals_planar.shape[1]
    assert n_rows % row_block == 0 and chunk % _LANE == 0
    n_tiles = n_rows // row_block
    f_pad = _round_up(f, _SUBLANE)

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * row_block
    offs = jax.vmap(
        lambda a: jnp.searchsorted(a, bounds, side="left").astype(jnp.int32)
    )(idx_sorted)  # (L, n_tiles + 1)

    if f_pad != f:
        vals_planar = jnp.pad(vals_planar, ((0, 0), (0, f_pad - f), (0, 0)))
    idx_p = idx_sorted[:, None, :]  # (L, 1, Mp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, f_pad, row_block),
            lambda l, j, off_ref: (l, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((1, chunk), jnp.int32),
            pltpu.VMEM((f_pad, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _batched_kernel(row_block, chunk, f_pad),
        out_shape=jax.ShapeDtypeStruct((L, f_pad, n_rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offs, idx_p, vals_planar)
    return jnp.swapaxes(out[:, :f, :], 1, 2)


def segment_sum_sorttile_batched(
    idx: jnp.ndarray,  # (L, M) int32, idx[l] in [0, n_rows)
    upd: jnp.ndarray,  # (L, M, F) f32
    n_rows: int,
    row_block: int = 512,
    chunk: int = 512,
    pack: bool = True,
    interpret: bool = False,
) -> jnp.ndarray:
    """L independent ``zeros((n_rows, F)).at[idx[l]].add(upd[l])`` in ONE
    batched sort + ONE Pallas kernel -> (L, n_rows, F).

    The hashgrid backward's every level rides the same (L, M)-batched sort
    (lanes stay full instead of 14 small sequential sort pipelines) and the
    same kernel launch.  ``pack=True`` carries values as packed-bf16 pairs
    (one int32 operand per 2 channels — the reference accumulates fp16,
    grid.h:1428-1439); dense AND hashed index distributions are exact (no
    capacity contract, see sorted_segment_sum_tiles_batched)."""
    L, m, f = upd.shape
    # Slack so the last chunk's DMA window stays in bounds:
    # e0 <= m and the loop reads at most ceil((end - e0)/chunk)*chunk.
    m_pad = _round_up(m, _LANE) + 2 * chunk
    idx_p = jnp.full((L, m_pad), _PAD_IDX, jnp.int32).at[:, :m].set(idx)
    if pack:
        payload = jax.vmap(pack_bf16_pairs)(upd)  # (L, M, P)
        p = payload.shape[-1]
        pay_p = jnp.zeros((L, m_pad, p), jnp.int32).at[:, :m].set(payload)
        ops = jax.lax.sort(
            [idx_p] + [pay_p[..., i] for i in range(p)], dimension=-1, num_keys=1
        )
        idx_s = ops[0]
        vals = jax.vmap(lambda q: unpack_bf16_pairs(q, f))(
            jnp.stack(ops[1:], axis=-1)
        )  # (L, Mp, F)
    else:
        upd_p = jnp.zeros((L, m_pad, f), upd.dtype).at[:, :m].set(upd)
        ops = jax.lax.sort(
            [idx_p] + [upd_p[..., i] for i in range(f)], dimension=-1, num_keys=1
        )
        idx_s = ops[0]
        vals = jnp.stack(ops[1:], axis=-1)
    return sorted_segment_sum_tiles_batched(
        idx_s,
        jnp.swapaxes(vals, 1, 2),
        n_rows,
        row_block=row_block,
        chunk=chunk,
        interpret=interpret,
    )


def _packed_kernel(row_block: int, chunk: int, p: int):
    """Grid (L, n_tiles); dynamic-length chunk loop with DOUBLE-BUFFERED
    DMAs and the value payload carried as packed-bf16-pair int32s (8x fewer
    HBM->VMEM bytes than planar fp32; unpacked in-register via bitcast)."""
    f2 = 2 * p  # bf16 features per packed int32 row

    def kernel(off_ref, idx_hbm, pay_hbm, out_ref, idx_s, pay_s, sem):
        l = pl.program_id(0)
        j = pl.program_id(1)
        start = off_ref[l, j]
        end = off_ref[l, j + 1]
        # Align the DMA window start down to the lane size; leading elements
        # belong to earlier rows and match no lane below.  Mosaic requires
        # the alignment proved (pl.multiple_of) for dynamic HBM slices.
        e0 = (start // _LANE) * _LANE
        n_chunks = jnp.maximum((end - e0 + chunk - 1) // chunk, 0)

        base = j * row_block
        rows = jax.lax.broadcasted_iota(jnp.int32, (row_block, 1), 0)

        def dma_pair(c, slot):
            s = pl.multiple_of(e0 + c * chunk, _LANE)
            cp_i = pltpu.make_async_copy(
                idx_hbm.at[l, :, pl.ds(s, chunk)], idx_s.at[slot], sem.at[slot, 0]
            )
            cp_p = pltpu.make_async_copy(
                pay_hbm.at[l, :, pl.ds(s, chunk)], pay_s.at[slot], sem.at[slot, 1]
            )
            return cp_i, cp_p

        @pl.when(n_chunks > 0)
        def _():
            a, b = dma_pair(0, 0)
            a.start()
            b.start()

        def body(c, acc):
            slot = jax.lax.rem(c, 2)
            a, b = dma_pair(c, slot)
            a.wait()
            b.wait()

            @pl.when(c + 1 < n_chunks)
            def _():
                a2, b2 = dma_pair(c + 1, 1 - slot)
                a2.start()
                b2.start()

            local = idx_s[slot] - base  # (1, chunk); <0 or >=rb match nothing
            # (p, chunk) int32 -> (2p, chunk) bf16: sublane k of the bitcast
            # holds one 16-bit half of each int32 (hardware layout verified
            # by the packed-path equality tests in tests/test_scatter.py,
            # test_sorttile_*).
            vals = pltpu.bitcast(pay_s[slot], jnp.bfloat16)  # (2p, chunk)
            onehot_t = (rows == local).astype(jnp.bfloat16)  # (rb, chunk)
            return acc + jax.lax.dot_general(
                vals,
                onehot_t,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        out_ref[:] = jax.lax.fori_loop(
            0,
            n_chunks,
            body,
            jnp.zeros((f2, row_block), jnp.float32),
            unroll=False,
        )[None]

    return kernel


@functools.partial(
    jax.jit, static_argnames=("n_rows", "row_block", "chunk", "interpret")
)
def sorted_segment_sum_tiles_packed(
    idx_sorted: jnp.ndarray,  # (L, Mp) int32, ascending per level (padded)
    packed: jnp.ndarray,  # (L, P, Mp) int32 packed bf16 pairs, same order
    n_rows: int,
    row_block: int = 512,
    chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-row sums for L sorted update streams -> (L, n_rows, 2P) f32.

    No capacity contract (any index distribution, dense or hashed): each
    tile walks its true element range in ``chunk``-sized double-buffered
    DMA steps.  Values stay bf16-pair-packed through HBM and are unpacked
    in-register (pltpu.bitcast), so the DMA moves 8x fewer bytes than the
    planar-fp32 variant."""
    L, m_pad = idx_sorted.shape
    p = packed.shape[1]
    assert n_rows % row_block == 0 and chunk % _LANE == 0
    n_tiles = n_rows // row_block
    f2 = 2 * p

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * row_block
    offs = jax.vmap(
        lambda a: jnp.searchsorted(a, bounds, side="left").astype(jnp.int32)
    )(idx_sorted)  # (L, n_tiles + 1)
    idx_p = idx_sorted[:, None, :]  # (L, 1, Mp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, f2, row_block),
            lambda l, j, off_ref: (l, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, chunk), jnp.int32),
            pltpu.VMEM((2, p, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out = pl.pallas_call(
        _packed_kernel(row_block, chunk, p),
        out_shape=jax.ShapeDtypeStruct((L, f2, n_rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offs, idx_p, packed)
    return jnp.swapaxes(out, 1, 2)  # (L, n_rows, 2P)


@functools.partial(
    jax.jit, static_argnames=("n_rows", "row_block", "chunk", "interpret")
)
def sorted_segment_sum_tiles_packed_planar(
    idx_sorted: jnp.ndarray,  # (L, Mp) int32, ascending per level (padded)
    packed: jnp.ndarray,  # (L, P, Mp) int32 packed bf16 pairs, same order
    n_rows: int,
    row_block: int = 512,
    chunk: int = 2048,
    interpret: bool = False,
) -> jnp.ndarray:
    """As ``sorted_segment_sum_tiles_packed`` but returns the kernel's RAW
    (L, 2P, n_rows) planar output — no whole-array swapaxes.  The round-4
    bucket-2 profile charged 16.5 ms/step to materializing that transpose
    (f32[9,2,524288] at ~2.3 GB/s); callers that slice per level can take
    ``out[l, :f, :size].T`` instead and let XLA fold the tiny per-level
    layout change into the consumer."""
    L, m_pad = idx_sorted.shape
    p = packed.shape[1]
    assert n_rows % row_block == 0 and chunk % _LANE == 0
    n_tiles = n_rows // row_block
    f2 = 2 * p

    bounds = jnp.arange(n_tiles + 1, dtype=jnp.int32) * row_block
    offs = jax.vmap(
        lambda a: jnp.searchsorted(a, bounds, side="left").astype(jnp.int32)
    )(idx_sorted)  # (L, n_tiles + 1)
    idx_p = idx_sorted[:, None, :]  # (L, 1, Mp)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(L, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, f2, row_block),
            lambda l, j, off_ref: (l, 0, j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 1, chunk), jnp.int32),
            pltpu.VMEM((2, p, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    return pl.pallas_call(
        _packed_kernel(row_block, chunk, p),
        out_shape=jax.ShapeDtypeStruct((L, f2, n_rows), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offs, idx_p, packed)


def segment_sum_all_levels(
    idx_list,  # length-L list of (M,) int32, idx in [0, sizes[l])
    upd_list,  # length-L list of (M, F) f32
    sizes,  # per-level table rows
    row_block: int = 512,
    chunk: int = 2048,
    interpret: bool = False,
):
    """All hashgrid levels' ``zeros((sizes[l], F)).at[idx].add(upd)`` via
    L independent 2-operand sorts (XLA pipelines small sorts better than one
    batched (L, M) sort — measured on v5e) + ONE packed Pallas kernel launch
    covering every level (dense AND hashed; no capacity contract).  Returns a
    list of (sizes[l], F) fp32.  Updates ride as bf16 (reference parity: the
    CUDA grid backward accumulates fp16 atomics, grid.h:1428-1439)."""
    L = len(idx_list)
    m = idx_list[0].shape[0]
    f = upd_list[0].shape[1]
    p = (f + 1) // 2
    m_pad = _round_up(m, _LANE) + 2 * chunk
    n_rows = _round_up(max(sizes), row_block)

    idx_s_l, pay_s_l = [], []
    for l in range(L):
        pay = pack_bf16_pairs(upd_list[l])  # (M, P)
        idx_p = jnp.full((m_pad,), _PAD_IDX, jnp.int32).at[:m].set(idx_list[l])
        pay_p = [
            jnp.zeros((m_pad,), jnp.int32).at[:m].set(pay[:, i])
            for i in range(p)
        ]
        s = jax.lax.sort([idx_p] + pay_p, num_keys=1)
        idx_s_l.append(s[0])
        pay_s_l.append(jnp.stack(s[1:], axis=0))  # (P, Mp)
    out = sorted_segment_sum_tiles_packed_planar(
        jnp.stack(idx_s_l),
        jnp.stack(pay_s_l),
        n_rows,
        row_block=row_block,
        chunk=chunk,
        interpret=interpret,
    )  # (L, 2P, n_rows) planar — per-level .T below instead of one big
    # materialized swapaxes (16.5 ms/step at flagship scale, r4 profile).
    return [out[l, :f, : sizes[l]].T for l in range(L)]


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
