"""Scatter-free segment-sum into a dense table (the TPU scatter-add escape).

XLA:TPU lowers `scatter_add` to a serialized per-update loop (~17-60 ns per
update — PERF.md); `lax.sort` however is a fast vectorized bitonic sort.
``segment_dense_sum`` computes dL/dTable = sum of updates per table row using
only sorts, cumulative sums, and slices:

  1. ONE merge sort of [update_indices ++ iota(n_rows)] (a tiebreak flag
     places each table-row "query" AFTER its equal update indices; update
     values ride along, queries carry zeros);
  2. per-channel cumulative sums over the merged values — at each query
     position the cumsum equals "sum of all updates with index <= row";
  3. ONE stable compaction sort on the flag alone pulls the T query rows to
     the front *in ascending row order* (stable + queries pre-sorted by row);
  4. dense[t] = cum_at_query[t] - cum_at_query[t-1].

Measured on v5e at one hash level's scale (2M updates -> 2^19 rows, F=2):
~4-25 ms vs ~80-130 ms for the native scatter.  This is the deterministic
TPU analog of the reference's atomicAdd hash-table accumulation
(my_tcnn grid.h:372+, which is nondeterministic in summation order).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_cpu() -> bool:
    """Trace-time backend check: native scatter is fast on CPU and the sort
    pipeline is slow there — exactly the reverse of TPU."""
    dev = getattr(jax.config, "jax_default_device", None)
    if dev is not None:
        return getattr(dev, "platform", None) == "cpu"
    return jax.default_backend() == "cpu"


def segment_dense_sum(
    idx: jnp.ndarray,  # (M,) int32 in [0, n_rows)
    upd: jnp.ndarray,  # (M, F) float
    n_rows: int,
    method: str = "auto",
    uniform_hint: bool = False,
) -> jnp.ndarray:
    """Equivalent of ``jnp.zeros((n_rows, F)).at[idx].add(upd)``.

    method: "sort" (scatter-free two-sort pipeline, TPU-safe for any index
    distribution), "sorttile" (one sort + Pallas tile reduce — fastest, but
    requires near-uniform indices and 512-divisible n_rows; see
    ops/segment_tile.py capacity contract), "scatter" (native, the CPU
    path), or "auto" (scatter on CPU; sorttile on TPU when ``uniform_hint``
    and shape allow, else sort).

    ``uniform_hint``: caller asserts the indices are hash-uniform (true for
    hashed grid levels, NOT for dense coarse levels where samples
    concentrate in few cells).

    bf16 updates (the bf16-compute backward emits them — the sort payload is
    bf16-quantized regardless) are accumulated in f32, matching the packed
    TPU path's in-kernel f32 accumulation."""
    if upd.dtype == jnp.bfloat16:
        upd = upd.astype(jnp.float32)
    if method == "auto":
        if _on_cpu():
            method = "scatter"
        elif uniform_hint and n_rows % 512 == 0 and n_rows >= 4096:
            method = "sorttile"
        else:
            method = "sort"
    if method == "scatter":
        return jnp.zeros((n_rows, upd.shape[1]), upd.dtype).at[idx].add(upd)
    if method == "sorttile":
        from neus2_tpu.ops.segment_tile import segment_sum_sorttile

        return segment_sum_sorttile(idx, upd, n_rows)
    M = idx.shape[0]
    F = upd.shape[1]

    keys = jnp.concatenate([idx.astype(jnp.int32), jnp.arange(n_rows, dtype=jnp.int32)])
    flags = jnp.concatenate(
        [jnp.zeros((M,), jnp.int32), jnp.ones((n_rows,), jnp.int32)]
    )
    vals = [
        jnp.concatenate([upd[:, f], jnp.zeros((n_rows,), upd.dtype)])
        for f in range(F)
    ]
    merged = jax.lax.sort([keys, flags] + vals, num_keys=2)
    sf = merged[1]
    cs = [jnp.cumsum(v) for v in merged[2:]]

    # Stable compaction: queries (flag 1 -> key 0) first, keeping their
    # merged (ascending-row) order.
    compacted = jax.lax.sort([1 - sf] + cs, num_keys=1)
    outs = []
    for c in compacted[1:]:
        dense_cum = c[:n_rows]
        prev = jnp.concatenate([jnp.zeros((1,), dense_cum.dtype), dense_cum[:-1]])
        outs.append(dense_cum - prev)
    return jnp.stack(outs, axis=-1)


def segment_dense_sum_multi(
    idx_list,  # length-L list of (M,) int32, idx_list[l] in [0, sizes[l])
    upd_list,  # length-L list of (M, F) f32 (same M, F across levels)
    sizes,  # per-level table rows
    method: str = "auto",
):
    """All hashgrid levels' segment sums in one call -> list of (sizes[l], F).

    On TPU ("packed"): L per-level 2-operand sorts (values ride packed as
    bf16 pairs — the reference's fp16-atomics precision, grid.h:1428-1439)
    + ONE Pallas dynamic-length tile-reduce kernel covering every level,
    dense and hashed alike (ops/segment_tile.py segment_sum_all_levels).
    Measured 14-level full scale (2M upd -> 2^19 rows): 117 ms vs 149 ms
    for the per-level auto paths.  On CPU: native scatter (exact fp32)."""
    if method == "auto":
        method = "scatter" if _on_cpu() else "packed"
    if method == "packed":
        from neus2_tpu.ops.segment_tile import segment_sum_all_levels

        return segment_sum_all_levels(idx_list, upd_list, list(sizes))
    return [
        segment_dense_sum(i, u, s, method=method)
        for i, u, s in zip(idx_list, upd_list, sizes)
    ]
