"""Scatter-free segment-sum into a dense table (the TPU scatter-add escape).

XLA:TPU lowers `scatter_add` to a serialized per-update loop (~17-60 ns per
update — PERF.md); `lax.sort` however is a fast vectorized bitonic sort.
``segment_dense_sum`` computes dL/dTable = sum of updates per table row using
only sorts, cumulative sums, and gathers:

  1. sort the updates by table index (value columns ride along);
  2. per-channel cumulative sums over the sorted values;
  3. "merge rank": sort [update_indices ++ iota(T)] with a tiebreak flag that
     places each table-row query AFTER its equal update indices; the query's
     position in the merged order minus the number of queries before it is
     ub(t) = #updates with index <= t;
  4. dense[t] = cumsum[ub(t)-1] - cumsum[ub(t-1)-1] (0 where ub doesn't grow).

Measured on v5e at one hash level's scale (2M updates -> 2^19 rows, F=2):
~4-25 ms vs ~80-130 ms for the native scatter.  This is the deterministic
TPU analog of the reference's atomicAdd hash-table accumulation
(my_tcnn grid.h:372+, which is nondeterministic in summation order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def segment_dense_sum(
    idx: jnp.ndarray,  # (M,) int32 in [0, n_rows)
    upd: jnp.ndarray,  # (M, F) float
    n_rows: int,
) -> jnp.ndarray:
    """Equivalent of ``jnp.zeros((n_rows, F)).at[idx].add(upd)`` without scatter."""
    M = idx.shape[0]
    F = upd.shape[1]

    ops = [idx.astype(jnp.int32)] + [upd[:, f] for f in range(F)]
    sorted_ops = jax.lax.sort(ops, num_keys=1)
    si = sorted_ops[0]
    cs = [jnp.cumsum(v) for v in sorted_ops[1:]]

    # Merge rank of each row id among the sorted update indices.
    keys = jnp.concatenate([si, jnp.arange(n_rows, dtype=jnp.int32)])
    flags = jnp.concatenate(
        [jnp.zeros((M,), jnp.int32), jnp.ones((n_rows,), jnp.int32)]
    )
    sk, sf = jax.lax.sort([keys, flags], num_keys=2)
    pos = jnp.arange(M + n_rows, dtype=jnp.int32)
    n_queries_upto = jnp.cumsum(sf)
    ub_at_query = pos - n_queries_upto + 1  # #updates <= row, valid where sf==1
    # Compact the query positions back to row order: queries appear in
    # ascending row order among themselves, so a stable partition by flag
    # (sort on 1-sf) yields them contiguously in row order.
    order_key = (1 - sf) * (M + n_rows)  # queries first, original order kept
    _, ub_sorted = jax.lax.sort([order_key, ub_at_query], num_keys=1)
    ub = ub_sorted[:n_rows]  # (n_rows,) #updates with index <= t

    # dense_cum[t] = cumsum up to the last update with index <= t; since ub
    # is nondecreasing this gather IS the forward fill, and consecutive rows
    # without updates difference to exactly zero.
    gather_at = jnp.maximum(ub - 1, 0)
    outs = []
    for c in cs:
        dense_cum = jnp.where(ub > 0, c[gather_at], 0.0)
        prev = jnp.concatenate([jnp.zeros((1,), dense_cum.dtype), dense_cum[:-1]])
        outs.append(dense_cum - prev)
    return jnp.stack(outs, axis=-1)
