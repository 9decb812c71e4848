"""Micro-probes for the forward-gather attack (PERF.md speed-of-light budget).

The flagship forward spends ~100 ms in hashed-level gathers (XLA issues
rows serially at ~6 ns/row).  Candidate replacement per level: sort the
2M corner indices (with an iota rank), run a Pallas blocked one-hot MXU
gather over the sorted range (the mirror of ops/segment_tile.py's
tile-reduce scatter), and unsort via a second 2-operand sort with the
values packed as bf16 pairs.  Net win iff
    2 * sort(2M) + kernel  <  gather(2M rows)  ~  12.6 ms.

Usage: python tools_probe_sortgather.py [MODE]
  sort1  — lax.sort 1-operand, 2M int32
  sort2  — lax.sort 2-operand (idx + int32 payload), 2M
  sort3  — lax.sort 3-operand, 2M
  gather — jnp.take of (N,8) rows from a (2^19, 2) table (the current path)
  gatherw — same row count from a (2^19, 8) F=8 table (width sensitivity)
Each mode times 20 iterations ending in a scalar fetch (tunnel rule).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

N = 262144  # flagship samples
M = N * 8  # corner rows per hashed level
T = 1 << 19  # hashed table rows


def timed(fn, args, n_iters=20, name=""):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    dt = (time.perf_counter() - t0) / n_iters
    print(f"{name}: {1000*dt:.2f} ms", flush=True)
    return dt


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, dtype=jnp.int32)
    pay = jnp.arange(M, dtype=jnp.int32)

    if mode in ("sort1", "all"):
        f = jax.jit(lambda k: jax.lax.sort([k], num_keys=1)[0])
        timed(f, (idx,), name="sort1 2M int32")
    if mode in ("sort2", "all"):
        f = jax.jit(lambda k, p: jax.lax.sort([k, p], num_keys=1)[1])
        timed(f, (idx, pay), name="sort2 2M int32+payload")
    if mode in ("sort3", "all"):
        f = jax.jit(
            lambda k, p: jax.lax.sort([k, p, p], num_keys=1)[1]
        )
        timed(f, (idx, pay), name="sort3 2M int32+2payload")
    if mode in ("gather", "all"):
        table = jax.random.normal(key, (T, 2))
        idx2 = idx.reshape(N, 8)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        timed(f, (table, idx2), name="gather 2M rows (T,2)")
    if mode in ("gatherw", "all"):
        table = jax.random.normal(key, (T, 8))
        idx2 = idx.reshape(N, 8)
        f = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        timed(f, (table, idx2), name="gather 2M rows (T,8)")


if __name__ == "__main__":
    main()
