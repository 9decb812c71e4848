"""VMEM-resident table row gather via Mosaic ``tpu.dynamic_gather``.

Context (PERF.md "Speed-of-light budget"): XLA:TPU issues random table
gathers serially at ~6 ns/row regardless of row width, which puts the hash
encoder's forward gathers (~18.9M hashed-level rows/step at the flagship
batch) at ~100 ms of a 337 ms step — 100x off the bandwidth floor.  A
hashed level's table (2^19 x F fp32 = 4 MB at F=2) fits in VMEM, so the
gather can run on-chip instead of through XLA's HBM gather path.

Mosaic lowers ``jnp.take_along_axis(table, idx, axis=0)`` inside a Pallas
kernel to ``tpu.dynamic_gather`` (jax 0.9, mosaic/lowering.py
_gather_lowering_rule) under a hard constraint: the index array must have
the SAME shape as the 2-D table operand — one call permutes/gathers exactly
T rows of a (T, F) table.  An (M,) row gather therefore runs as
ceil(M / T) grid steps, each gathering T rows, with the table operand
resident in VMEM across steps (constant index_map) and the index/output
blocks streamed.  At the flagship scale M = 8 corners x 262,144 samples =
2,097,152 = exactly 4 x 2^19, so a level is 4 grid steps.

Verified to lower for all production shapes (F in {2,4,8}, fp32/bf16
tables, grid-blocked (T,1) index blocks) via cross-platform lowering on
CPU; semantics tested in interpret mode (tests/test_dyngather.py).
Hardware timing is gated on the axon tunnel (tools_probe_dyngather.py) —
until measured, the encoder uses this path only when NEUS2_DYNGATHER=1.

Reference analog: my_tcnn grid.h:175-369 kernel_grid reads table rows
through the GPU L2/texture path; this is the TPU equivalent of keeping the
working set on-chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM working-set ceiling for the resident table + double-buffered
# index/output blocks (v5e has ~16 MB/core; leave headroom for Mosaic's
# own spills).  Table bytes + 2*(idx block + out block) must fit.  The
# flagship hashed level only fits with a bf16 table (2 + 2*(2+2) = 10 MB;
# fp32 would be 16 MB) — which is reference parity anyway: my_tcnn stores
# grid params in half precision (grid.h network_precision_t storage).
_VMEM_BUDGET = 13 * 1024 * 1024


def dyngather_supported(n_rows: int, n_features: int, dtype=jnp.float32) -> bool:
    """True when the (n_rows, n_features) table fits the kernel's VMEM plan."""
    itemsize = jnp.dtype(dtype).itemsize
    table_b = n_rows * n_features * itemsize
    idx_b = n_rows * 4  # (T, 1) int32 block
    out_b = n_rows * n_features * itemsize
    # Mosaic sublane tiling wants the row count 8-aligned; production tables
    # are powers of two so this only excludes degenerate test shapes.
    return n_rows % 8 == 0 and table_b + 2 * (idx_b + out_b) <= _VMEM_BUDGET


def dyngather_plan(n_rows: int, n_features: int, dtype=jnp.float32):
    """Widest per-call feature width that fits the VMEM plan, or None.

    Wider-row configs (tpu_opt L7/F4, l4f8 F=8) blow the VMEM budget at
    full row width; gathering the table in feature slices (same indices,
    (T, F_slice) operands) stays legal under the lowering contract at the
    cost of proportionally more gather rows.  Returns the slice width.
    """
    f = n_features
    while f >= 1:
        if n_features % f == 0 and dyngather_supported(n_rows, f, dtype):
            return f
        f //= 2
    return None


def _gather_kernel(tab_ref, idx_ref, out_ref):
    idx = jnp.broadcast_to(idx_ref[:], (idx_ref.shape[0], tab_ref.shape[1]))
    out_ref[:] = jnp.take_along_axis(tab_ref[:], idx, axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def dyngather_rows(table: jnp.ndarray, idx: jnp.ndarray, *,
                   interpret: bool = False) -> jnp.ndarray:
    """``table[idx]`` with the table resident in VMEM.

    table: (T, F); idx: (M,) int32 in [0, T).  Returns (M, F) in the
    table's dtype.  M is padded up to a multiple of T internally (the
    ``tpu.dynamic_gather`` one-call-per-T-rows contract above).
    """
    T, F = table.shape
    (M,) = idx.shape
    k = max(1, -(-M // T))
    pad = k * T - M
    idx_p = jnp.pad(idx, (0, pad)) if pad else idx
    Fs = dyngather_plan(T, F, table.dtype)
    if Fs is None:
        raise ValueError(
            f"table ({T}, {F}) {table.dtype} does not fit the VMEM plan"
        )
    idx_col = idx_p[:, None]

    def one_slice(tab_slice):
        return pl.pallas_call(
            _gather_kernel,
            out_shape=jax.ShapeDtypeStruct((k * T, Fs), table.dtype),
            grid=(k,),
            in_specs=[
                pl.BlockSpec((T, Fs), lambda b: (0, 0)),  # table: resident
                pl.BlockSpec((T, 1), lambda b: (b, 0)),   # index block
            ],
            out_specs=pl.BlockSpec((T, Fs), lambda b: (b, 0)),
            interpret=interpret,
        )(tab_slice, idx_col)

    if Fs == F:
        out = one_slice(table)
    else:
        out = jnp.concatenate(
            [one_slice(table[:, s : s + Fs]) for s in range(0, F, Fs)],
            axis=1,
        )
    return out[:M] if pad else out
