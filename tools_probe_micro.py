"""Micro-probes for step-time levers (round 3, PERF.md speed-of-light budget).

Usage: python tools_probe_micro.py MODE
  bitbool   — occupancy probe gather from a (2M,) bool bitfield (current)
  bitpack   — same probe from a (65536,) uint32 packed bitfield + bit test
  einsum    — forward feat/jac einsums as jnp.einsum (current formulation)
  bcast     — same contractions as broadcast-multiply-reduce
  bwd_einsum / bwd_bcast — the backward upd contraction both ways
All at flagship scale: N = 262144 samples (einsums), R*C = 16384*256 probes
(the bucket-2 march load).  20 iters, scalar-fetch timing (tunnel rule).
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

N = 262144
F = 2
RC = 16384 * 256  # bucket-2 candidate probes
G3 = 128 ** 3


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
    if mode in ("bitbool", "all"):
        bits = jax.random.bernoulli(key, 0.05, (G3,))
        idx = jax.random.randint(key, (RC,), 0, G3, dtype=jnp.int32)
        f = jax.jit(lambda b, i: jnp.take(b, i, axis=0).sum())
        timed(f, (bits, idx), name="bitbool 4.2M probes from (2M,) bool")
    if mode in ("bitpack", "all"):
        words = jax.random.randint(
            key, (G3 // 32,), -(2**31), 2**31 - 1, dtype=jnp.int32
        )
        idx = jax.random.randint(key, (RC,), 0, G3, dtype=jnp.int32)

        def probe(w, i):
            word = jnp.take(w, i >> 5, axis=0)
            return ((word >> (i & 31)) & 1).sum()

        f = jax.jit(probe)
        timed(f, (words, idx), name="bitpack 4.2M probes from (65k,) int32")
    if mode in ("einsum", "all"):
        w = jax.random.normal(key, (N, 8))
        dw = jax.random.normal(key, (N, 8, 3))
        vals = jax.random.normal(key, (N, 8, F))

        def fe(w, dw, vals):
            feat = jnp.einsum("nc,ncf->nf", w, vals)
            jac = jnp.einsum("ncj,ncf->njf", dw, vals)
            return feat.sum() + jac.sum()

        timed(jax.jit(fe), (w, dw, vals), name="fwd einsum feat+jac (N,8,F)")
    if mode in ("bcast", "all"):
        w = jax.random.normal(key, (N, 8))
        dw = jax.random.normal(key, (N, 8, 3))
        vals = jax.random.normal(key, (N, 8, F))

        def fb(w, dw, vals):
            feat = (w[..., None] * vals).sum(1)  # (N,F)
            jac = (dw[..., None] * vals[:, :, None, :]).sum(1)  # (N,3,F)
            return feat.sum() + jac.sum()

        timed(jax.jit(fb), (w, dw, vals), name="fwd bcast feat+jac (N,8,F)")
    if mode in ("bwd_einsum", "all"):
        dw = jax.random.normal(key, (N, 8, 3))
        ctj = jax.random.normal(key, (N, 3, F))

        def g(dw, ctj):
            return jnp.einsum(
                "ncj,njf->ncf",
                dw.astype(jnp.bfloat16),
                ctj.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).sum()

        timed(jax.jit(g), (dw, ctj), name="bwd einsum upd (N,8,3)x(N,3,F)")
    if mode in ("bwd_bcast", "all"):
        dw = jax.random.normal(key, (N, 8, 3))
        ctj = jax.random.normal(key, (N, 3, F))

        def g(dw, ctj):
            return (dw[..., None] * ctj[:, None, :, :]).sum(2).sum()

        timed(jax.jit(g), (dw, ctj), name="bwd bcast upd (N,8,3)x(N,3,F)")


if __name__ == "__main__":
    main()
