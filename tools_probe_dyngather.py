"""Probe: does Mosaic's tpu.dynamic_gather beat XLA's narrow-row HBM gather?

Lowering contract (discovered via cross-platform lowering on CPU — see
jax/_src/pallas/mosaic/lowering.py _gather_lowering_rule): take_along_axis
inside a Pallas kernel lowers to tpu.dynamic_gather ONLY when the index
array has the SAME shape as the 2-D operand — one call gathers exactly T
rows of a (T, F) table.  Arbitrary-M gathers therefore run as ceil(M/T)
grid steps with the table resident in VMEM; that production kernel is
ops/dyngather.py (semantics + lowering regression-tested in
tests/test_dyngather.py).  What only hardware can answer: does Mosaic
COMPILE the big shapes (lowering is necessary, not sufficient), and at what
per-row rate does the gather execute vs XLA's ~6 ns/row.

Run modes (one compile per process — tunnel discipline):
  python tools_probe_dyngather.py lower   # compile-check on device
  python tools_probe_dyngather.py time    # time raw M==T calls
  python tools_probe_dyngather.py prod    # time ops/dyngather.py + XLA ref

This is a measurement tool, not product code.
"""

import sys
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")


def gather_kernel(table_ref, idx_ref, out_ref):
    # out[i, j] = table[idx[i, j], j]: cross-sublane gather within lanes.
    out_ref[:] = jnp.take_along_axis(table_ref[:], idx_ref[:], axis=0)


def make_fn(rows, cols, m):
    @jax.jit
    def f(table, idx):
        return pl.pallas_call(
            gather_kernel,
            out_shape=jax.ShapeDtypeStruct((m, cols), table.dtype),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(table, idx)

    return f


def bench(run, payload_rows, warm=1, iters=10):
    for _ in range(warm):
        out = run()
    _ = float(out.sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    _ = float(out.sum())
    dt = (time.perf_counter() - t0) / iters
    return dt, dt / payload_rows * 1e9


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lower"
    key = jax.random.PRNGKey(0)

    if mode == "prod":
        # Production path (ops/dyngather.py): flagship hashed level, bf16
        # table, M = 8 corners x 262,144 samples = 4 x T grid steps —
        # versus the jnp.take XLA baseline at identical shapes.
        from neus2_tpu.ops.dyngather import dyngather_rows

        T, F, M = 1 << 19, 2, 1 << 21
        table = jax.random.normal(key, (T, F), jnp.float32).astype(jnp.bfloat16)
        idx = jax.random.randint(key, (M,), 0, T, jnp.int32)

        xla = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
        try:
            dt, nsrow = bench(lambda: dyngather_rows(table, idx), M)
            print(f"dyngather_rows T={T} F={F} M={M}: {dt*1e3:.3f} ms "
                  f"({nsrow:.2f} ns/row)", flush=True)
        except Exception as e:
            print(f"dyngather_rows: FAIL {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
        dt, nsrow = bench(lambda: xla(table, idx), M)
        print(f"XLA jnp.take   T={T} F={F} M={M}: {dt*1e3:.3f} ms "
              f"({nsrow:.2f} ns/row)", flush=True)
        return

    # Raw M==T calls at increasing scale (the only shapes the lowering
    # accepts; anything with m != rows fails the indices-shape assert).
    cases = [
        (512, 128, 512),
        (4096, 128, 4096),
        (1 << 15, 8, 1 << 15),    # l4f8 row width
        (1 << 17, 2, 1 << 17),    # narrow F=2 rows, 128k-row table
        (1 << 19, 2, 1 << 19),    # flagship hashed-level table (4 MB fp32)
    ]
    for rows, cols, m in cases:
        table = jax.random.normal(key, (rows, cols), jnp.float32)
        idx = jax.random.randint(key, (m, cols), 0, rows, jnp.int32)
        try:
            f = make_fn(rows, cols, m)
            f.lower(table, idx).compile()
            if mode == "time":
                dt, nsrow = bench(lambda: f(table, idx), m)
                rate = m * cols / dt / 1e9
                print(f"rows={rows}x{cols} m={m}: {dt*1e3:.3f} ms "
                      f"({rate:.2f} G elems/s, {nsrow:.2f} ns/row; "
                      f"XLA floor ~6 ns/row)", flush=True)
            else:
                print(f"rows={rows}x{cols} m={m}: lowers OK", flush=True)
        except Exception as e:
            print(f"rows={rows}x{cols} m={m}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
