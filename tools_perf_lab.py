"""Perf lab: segment-sum backward variants on the real TPU chip.

Round-2 exploration for the hashgrid backward (the 14 per-level sort
pipelines that eat ~350 ms/step, PERF.md).  Run sections with
  python tools_perf_lab.py sort        # lax.sort operand/size scaling
  python tools_perf_lab.py variants    # segment-sum variant shootout
  python tools_perf_lab.py pallas     # Pallas tile-reduce kernel
Timing rule (CLAUDE.md): end every measurement with float(x); the tunnel
roundtrip is ~26-31 ms, so iterate chained work between fetches.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")

M = 1 << 21  # updates per level (2^18 samples x 8 corners)
T = 1 << 19  # table rows per level
F = 2


def timeit(fn, *args, iters=5, name=""):
    out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = float(jnp.sum(out[0] if isinstance(out, (tuple, list)) else out))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:55s} {dt:8.2f} ms")
    return dt


def make_data(key, m=M, t=T):
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (m,), 0, t, dtype=jnp.int32)
    upd = jax.random.normal(k2, (m, F), jnp.float32)
    return idx, upd


def section_sort():
    key = jax.random.PRNGKey(0)
    for m in (1 << 18, 1 << 20, 1 << 21, (1 << 21) + (1 << 19)):
        idx = jax.random.randint(key, (m,), 0, T, dtype=jnp.int32)
        ops32 = [jax.random.normal(key, (m,), jnp.float32) for _ in range(3)]
        for nops in (1, 2, 3, 4):
            f = jax.jit(
                lambda a, *vs: jax.lax.sort([a] + list(vs), num_keys=1)[0]
            )
            timeit(f, idx, *ops32[: nops - 1], name=f"sort m={m:>8} ops={nops}")


def current_segment(idx, upd):
    from neus2_tpu.ops.scatter import segment_dense_sum

    return segment_dense_sum(idx, upd, T, method="sort")


def variant_packed(idx, upd):
    """Packed key (idx*2+flag) + bf16-packed payload; 2-op sort1, 3-op sort2."""
    m = idx.shape[0]
    key1 = jnp.concatenate(
        [idx * 2, jnp.arange(T, dtype=jnp.int32) * 2 + 1]
    )
    b = upd.astype(jnp.bfloat16)
    packed = jax.lax.bitcast_convert_type(
        jax.lax.concatenate([b[:, :1], b[:, 1:2]], 1), jnp.int32
    ).reshape(-1)
    payload = jnp.concatenate([packed, jnp.zeros((T,), jnp.int32)])
    k_s, p_s = jax.lax.sort([key1, payload], num_keys=1)
    flag = k_s & 1
    v = jax.lax.bitcast_convert_type(p_s, jnp.bfloat16).reshape(-1, 2)
    cs0 = jnp.cumsum(v[:, 0].astype(jnp.float32))
    cs1 = jnp.cumsum(v[:, 1].astype(jnp.float32))
    _, c0, c1 = jax.lax.sort([1 - flag, cs0, cs1], num_keys=1)
    dense0 = c0[:T] - jnp.concatenate([jnp.zeros((1,)), c0[: T - 1]])
    dense1 = c1[:T] - jnp.concatenate([jnp.zeros((1,)), c1[: T - 1]])
    return jnp.stack([dense0, dense1], -1)


def make_variant_scatter_extract(t_rows):
    def variant_scatter_extract(idx, upd):
        """sort1 packed + cumsum + scatter-set of the t_rows query rows."""
        key1 = jnp.concatenate(
            [idx * 2, jnp.arange(t_rows, dtype=jnp.int32) * 2 + 1]
        )
        b = upd.astype(jnp.bfloat16)
        packed = jax.lax.bitcast_convert_type(
            jax.lax.concatenate([b[:, :1], b[:, 1:2]], 1), jnp.int32
        ).reshape(-1)
        payload = jnp.concatenate([packed, jnp.zeros((t_rows,), jnp.int32)])
        k_s, p_s = jax.lax.sort([key1, payload], num_keys=1)
        flag = k_s & 1
        v = jax.lax.bitcast_convert_type(p_s, jnp.bfloat16).reshape(-1, 2)
        cs = jnp.cumsum(v.astype(jnp.float32), axis=0)  # (M+T, F)
        rows = jnp.where(flag == 1, k_s >> 1, t_rows)  # sentinel drops updates
        cum_at = jnp.zeros((t_rows, F), jnp.float32).at[rows].set(
            cs, mode="drop", unique_indices=True
        )
        return cum_at - jnp.concatenate(
            [jnp.zeros((1, F)), cum_at[:-1]], 0
        )

    return variant_scatter_extract


def variant_sort_only_2op(idx, upd):
    """Lower bound: sort [idx, packed] over M only + cumsum (no extraction)."""
    b = upd.astype(jnp.bfloat16)
    packed = jax.lax.bitcast_convert_type(
        jax.lax.concatenate([b[:, :1], b[:, 1:2]], 1), jnp.int32
    ).reshape(-1)
    k_s, p_s = jax.lax.sort([idx, packed], num_keys=1)
    v = jax.lax.bitcast_convert_type(p_s, jnp.bfloat16).reshape(-1, 2)
    cs = jnp.cumsum(v.astype(jnp.float32), axis=0)
    return cs


def variant_searchsorted(idx, upd):
    """sort [idx, packed] + searchsorted tile offsets (no kernel yet)."""
    b = upd.astype(jnp.bfloat16)
    packed = jax.lax.bitcast_convert_type(
        jax.lax.concatenate([b[:, :1], b[:, 1:2]], 1), jnp.int32
    ).reshape(-1)
    k_s, p_s = jax.lax.sort([idx, packed], num_keys=1)
    W = 512
    bounds = jnp.arange(T // W + 1, dtype=jnp.int32) * W
    offs = jnp.searchsorted(k_s, bounds)
    return k_s, p_s, offs


def section_variants():
    key = jax.random.PRNGKey(0)
    idx, upd = make_data(key)
    ref = jnp.zeros((T, F)).at[idx].add(upd)
    timeit(jax.jit(current_segment), idx, upd, name="current segment_dense_sum")
    out = jax.jit(variant_packed)(idx, upd)
    err = float(jnp.max(jnp.abs(out - ref)))
    print(f"  variant_packed max err vs fp32 scatter: {err:.4f}")
    timeit(jax.jit(variant_packed), idx, upd, name="packed-bf16 2op+3op sorts")
    timeit(
        jax.jit(variant_sort_only_2op), idx, upd, name="LOWER BOUND sort2op(M)+cumsum"
    )
    timeit(jax.jit(variant_searchsorted), idx, upd, name="sort2op(M)+searchsorted")
    # Variant C at large T and small T
    vc = jax.jit(make_variant_scatter_extract(T))
    out = vc(idx, upd)
    print(f"  variant_C(T=2^19) max err: {float(jnp.max(jnp.abs(out - ref))):.4f}")
    timeit(vc, idx, upd, name="variant_C scatter-extract T=2^19")
    for tsmall in (1 << 13, 1 << 16, 373248):
        idx_s = jax.random.randint(key, (M,), 0, tsmall, dtype=jnp.int32)
        ref_s = jnp.zeros((tsmall, F)).at[idx_s].add(upd)
        vcs = jax.jit(make_variant_scatter_extract(tsmall))
        out_s = vcs(idx_s, upd)
        err_s = float(jnp.max(jnp.abs(out_s - ref_s)))
        print(f"  variant_C(T={tsmall}) max err: {err_s:.4f}")
        timeit(vcs, idx_s, upd, name=f"variant_C scatter-extract T={tsmall}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "variants"
    print(f"backend: {jax.default_backend()} {jax.devices()}")
    if which == "sort":
        section_sort()
    elif which == "variants":
        section_variants()
