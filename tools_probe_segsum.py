"""Backward segment-sum data-formatting probe (VERDICT r3 task 4).

The round-3 serialized-core profile charges 50.6 ms/step to backward sorts
and 37.9 ms to "data formatting" (convert_element_type 9.8 + slice 7.2 +
concat 6.6 + bitcast 5.6) around the 9 per-level 2.1M-key sorts.  The
payloads already ride the sort as packed-bf16-pair int32s
(ops/segment_tile.py segment_sum_all_levels); the remaining question is how
much of the formatting is the f32->bf16 convert + bitcast of the incoming
updates (deletable by emitting bf16 straight from the backward einsums)
versus the padding/stack plumbing (structural).

Variants at flagship scale (9 hashed levels, M = 2.1M updates -> 2^19 rows,
F=2):
  f32   — production: upd arrives f32, pack converts (the current path)
  bf16  — upd arrives bf16: pack's astype is a no-op, bitcast remains
  int32 — upd arrives pre-packed (M, 1) int32: sort+kernel floor
plus the 5-dense-level corner-fused group ((N, 16) f32 rows).

Usage: python tools_probe_segsum.py [iters=10]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from neus2_tpu.ops.segment_tile import pack_bf16_pairs, segment_sum_all_levels

N = 262144
L_HASH = 9
M = N * 8  # per-level corner updates
T = 1 << 19
F = 2


def timed(fn, args, n_iters, name):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n_iters * 1000
    print(f"{name:28s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 2 * L_HASH)
    idx_list = [
        jax.random.randint(ks[2 * l], (M,), 0, T, jnp.int32)
        for l in range(L_HASH)
    ]
    upd_f32 = [
        jax.random.normal(ks[2 * l + 1], (M, F), jnp.float32) * 1e-3
        for l in range(L_HASH)
    ]
    upd_bf16 = [u.astype(jnp.bfloat16) for u in upd_f32]
    sizes = [T] * L_HASH

    @jax.jit
    def run_f32(idx, upd):
        return segment_sum_all_levels(list(idx), list(upd), sizes)

    @jax.jit
    def run_bf16(idx, upd):
        return segment_sum_all_levels(list(idx), list(upd), sizes)

    t_f32 = timed(run_f32, (idx_list, upd_f32), n_iters, "hashed x9 f32-in")
    t_bf16 = timed(run_bf16, (idx_list, upd_bf16), n_iters, "hashed x9 bf16-in")

    # Floor: pre-packed int32 payloads (sort + kernel only).  Same math as
    # pack-inside since pack_bf16_pairs(bf16) == bitcast.
    packed = [pack_bf16_pairs(u) for u in upd_f32]

    from neus2_tpu.ops.segment_tile import (
        _PAD_IDX,
        _round_up,
        sorted_segment_sum_tiles_packed,
    )

    chunk = 2048
    m_pad = _round_up(M, 128) + 2 * chunk

    @jax.jit
    def run_prepacked(idx, pay):
        idx_s_l, pay_s_l = [], []
        for l in range(L_HASH):
            idx_p = (
                jnp.full((m_pad,), _PAD_IDX, jnp.int32).at[:M].set(idx[l])
            )
            pay_p = [
                jnp.zeros((m_pad,), jnp.int32).at[:M].set(pay[l][:, i])
                for i in range(pay[l].shape[1])
            ]
            s = jax.lax.sort([idx_p] + pay_p, num_keys=1)
            idx_s_l.append(s[0])
            pay_s_l.append(jnp.stack(s[1:], axis=0))
        out = sorted_segment_sum_tiles_packed(
            jnp.stack(idx_s_l), jnp.stack(pay_s_l), T, chunk=chunk
        )
        return [out[l, :T, :F] for l in range(L_HASH)]

    t_pk = timed(run_prepacked, (idx_list, packed), n_iters, "hashed x9 prepacked-int32")

    # Dense corner-fused group: 5 levels, (N, 16) rows into res^3 tables.
    dsizes = [4096, 10648, 29791, 79507, 205379]
    kd = jax.random.split(jax.random.PRNGKey(1), 2 * len(dsizes))
    didx = [
        jax.random.randint(kd[2 * i], (N,), 0, s, jnp.int32)
        for i, s in enumerate(dsizes)
    ]
    dupd = [
        jax.random.normal(kd[2 * i + 1], (N, 16), jnp.float32) * 1e-3
        for i in range(len(dsizes))
    ]

    @jax.jit
    def run_dense(idx, upd):
        return segment_sum_all_levels(list(idx), list(upd), dsizes)

    timed(run_dense, (didx, dupd), n_iters, "dense x5 corner-fused f32")

    print(
        f"delta f32->bf16-in: {t_f32 - t_bf16:+.2f} ms; "
        f"bf16-in -> prepacked floor: {t_bf16 - t_pk:+.2f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
