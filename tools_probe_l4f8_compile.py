"""Bisect the l4f8 v5e compile pathology by stage (round-4 follow-up).

`bench.py --config l4f8` was killed at 25 min still compiling the train
step on the chip, while the SAME jaxpr compiles in 4.6 s on XLA:CPU
(faster than tpu_opt's 7.3 s) — so the blowup is v5e-backend-specific,
not graph size.  This tool compiles the step's constituent programs
one at a time at l4f8 shapes (L4/F8, 2^18-sample batch) and prints the
per-stage compile wall time; run the whole thing under `timeout` so the
pathological stage is identified by the last line printed.

Stages:
  1. packed Pallas segment-sum over the hashed levels (F=8 -> p=4
     packed words; a Mosaic instantiation never exercised by parity/tpu_opt)
  2. encoder forward only (incl. the corner-fused dense gather)
  3. encoder fwd+bwd (custom-VJP hashgrid, corner-fused dense gathers at
     8F=64-wide rows) via jax.vjp
  4. full field fwd+bwd (encoder + MLPs + jax.linearize jac tangents)
  5. the full train step (known-pathological; keep last)

Usage: [timeout 900] python tools_probe_l4f8_compile.py [stage ...]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

N = 262144  # 2^18-sample batch


def _compile(name, fn, *args):
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t1 = time.perf_counter()
    compiled = lowered.compile()
    t2 = time.perf_counter()
    print(
        f"{name:32s} lower {t1 - t0:6.1f}s  compile {t2 - t1:7.1f}s",
        flush=True,
    )
    return compiled


def main():
    stages = set(sys.argv[1:]) or {"segsum", "encfwd", "encoder", "field", "step"}
    from bench import flagship_config

    config = flagship_config("l4f8")
    grid = config.field.grid
    key = jax.random.PRNGKey(0)

    if "segsum" in stages:
        from neus2_tpu.ops.segment_tile import segment_sum_all_levels

        sizes = grid.level_tables()[3]
        # hashed levels = those at the table cap
        cap = 1 << grid.log2_hashmap_size
        hashed = [s for s in sizes if s >= cap]
        M = N * 8
        ks = jax.random.split(key, 2 * len(hashed))
        idx = [
            jax.random.randint(ks[2 * i], (M,), 0, cap, jnp.int32)
            for i in range(len(hashed))
        ]
        upd = [
            (jax.random.normal(ks[2 * i + 1], (M, 8), jnp.float32) * 1e-3)
            for i in range(len(hashed))
        ]

        def seg(idx, upd):
            return segment_sum_all_levels(list(idx), list(upd), hashed)

        _compile(f"segsum x{len(hashed)} F=8", seg, idx, upd)

    if "encfwd" in stages:
        from neus2_tpu.ops.hashgrid_fast import (
            init_hashgrid_tables,
            make_encode_jac,
        )

        tables = init_hashgrid_tables(key, grid)
        enc = make_encode_jac(grid, compute_dtype=jnp.bfloat16)
        pos = jax.random.uniform(key, (N, 3))

        def enc_fwd(tables, pos):
            feat, jac = enc(tables, pos)[:2]
            return (
                jnp.sum(feat.astype(jnp.float32))
                + jnp.sum(jac.astype(jnp.float32))
            )

        _compile("encoder fwd only", enc_fwd, tables, pos)

    if "encoder" in stages:
        from neus2_tpu.ops.hashgrid_fast import (
            init_hashgrid_tables,
            make_encode_jac,
        )

        tables = init_hashgrid_tables(key, grid)
        enc = make_encode_jac(grid, compute_dtype=jnp.bfloat16)
        pos = jax.random.uniform(key, (N, 3))

        def enc_fwd_bwd(tables, pos):
            def loss(t):
                feat, jac = enc(t, pos)[:2]
                return (
                    jnp.sum(feat.astype(jnp.float32))
                    + jnp.sum(jac.astype(jnp.float32))
                )

            return jax.value_and_grad(loss)(tables)

        _compile("encoder fwd+bwd", enc_fwd_bwd, tables, pos)

    if "field" in stages:
        from neus2_tpu.models.field import field_forward, init_field

        params = init_field(key, config.field)
        pos = jax.random.uniform(key, (N, 3))
        dirs = jax.random.normal(key, (N, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

        def f_fwd_bwd(params, pos, dirs):
            def loss(p):
                out = field_forward(p, pos, dirs, config.field)
                return (
                    jnp.sum(out.rgb.astype(jnp.float32))
                    + jnp.sum(out.sdf)
                    + jnp.sum(out.normal)
                )

            return jax.value_and_grad(loss)(params)

        _compile("field fwd+bwd", f_fwd_bwd, params, pos, dirs)

    if "step" in stages:
        from bench import _setup
        from neus2_tpu.engine.train import train_step

        state, images, cameras = _setup(config)
        t0 = time.perf_counter()
        lowered = train_step.lower(state, images, cameras, config=config)
        t1 = time.perf_counter()
        lowered.compile()
        t2 = time.perf_counter()
        print(
            f"{'full train step':32s} lower {t1 - t0:6.1f}s  "
            f"compile {t2 - t1:7.1f}s",
            flush=True,
        )


if __name__ == "__main__":
    main()
