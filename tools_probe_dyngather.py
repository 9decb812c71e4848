"""Probe: can Mosaic's tpu.dynamic_gather beat XLA's narrow-row HBM gather?

jax 0.9 Pallas lowers jnp.take_along_axis (x: (A, B), idx: (A, B), axis 0/1)
to tpu.dynamic_gather (jax/_src/pallas/mosaic/lowering.py:2465-2525).  If a
hash-table level (2^19 rows x F) can live in VMEM and be gathered along
sublanes at vector rate, the forward hashed-level gathers (~100 ms of the
337 ms flagship step, PERF.md) could collapse.  Open questions only hardware
can answer: does the lowering accept A=512k (multi-tile cross-sublane
gather), and at what rate does it execute?

Run modes (one compile per process — tunnel discipline):
  python tools_probe_dyngather.py lower   # just compile-check tiny + big
  python tools_probe_dyngather.py time    # time in-kernel gather vs XLA

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


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "lower"
    key = jax.random.PRNGKey(0)

    # (rows, cols, m): table rows, lane width, queries. idx must be (m, cols)
    # with per-lane row indices — our use would broadcast one row index
    # across the F features if F were the lane dim; start with the raw
    # primitive shape to learn the constraints.
    cases = [
        (8, 128, 8),          # single tile — should definitely lower
        (512, 128, 512),      # multi-tile operand
        (4096, 128, 4096),    # 2 MB fp32 table in VMEM
        # Realistic hash-encoder shapes: a level is (T, F) with F << 128.
        # Broadcast one row index across the narrow lane dim; these probe
        # whether Mosaic accepts sub-128 lane widths for dynamic_gather.
        (1 << 15, 8, 1 << 15),   # l4f8 row width
        (1 << 17, 2, 1 << 17),   # parity L14/F2 row width, 512k-row table
        (1 << 17, 128, 1 << 15), # wide fallback: 64 F=2 rows packed per row
    ]
    for rows, cols, m in cases:
        table = jax.random.normal(key, (rows, cols), jnp.float32)
        idx = jax.random.randint(key, (m, cols), 0, rows, jnp.int32)
        try:
            f = make_fn(rows, cols, m)
            lowered = f.lower(table, idx).compile()
            if mode == "time":
                out = f(table, idx)
                _ = float(out.sum())
                t0 = time.perf_counter()
                for _ in range(10):
                    out = f(table, idx)
                _ = float(out.sum())
                dt = (time.perf_counter() - t0) / 10
                rate = m * cols / dt / 1e9
                rowrate = dt / m * 1e9
                print(f"rows={rows}x{cols} m={m}: {dt*1e3:.3f} ms "
                      f"({rate:.2f} G elems/s, {rowrate:.2f} ns/row; "
                      f"XLA floor ~6 ns/row)", flush=True)
            else:
                print(f"rows={rows}x{cols} m={m}: lowers OK", flush=True)
        except Exception as e:
            print(f"rows={rows}x{cols} m={m}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)

    # The actual encoder inner loop: 8 corner gathers + weighted reduce for
    # one hashed level, table resident in VMEM.  If this lowers and beats
    # ~6 ns/row x 8 corners, it replaces the XLA gather path in
    # ops/hashgrid_fast.py for hashed levels.
    if mode in ("lower", "time"):
        T, F, M = 1 << 17, 2, 1 << 15
        table = jax.random.normal(key, (T, F), jnp.float32)
        cidx = jax.random.randint(key, (M, 8), 0, T, jnp.int32)
        w = jax.random.uniform(jax.random.PRNGKey(1), (M, 8), jnp.float32)

        def corner_kernel(table_ref, idx_ref, w_ref, out_ref):
            acc = jnp.zeros((idx_ref.shape[0], table_ref.shape[1]),
                            jnp.float32)
            for c in range(8):
                rows_c = idx_ref[:, c][:, None]
                g = jnp.take_along_axis(
                    table_ref[:],
                    jnp.broadcast_to(
                        rows_c, (idx_ref.shape[0], table_ref.shape[1])
                    ),
                    axis=0,
                )
                acc = acc + w_ref[:, c][:, None] * g
            out_ref[:] = acc

        @jax.jit
        def enc(table, cidx, w):
            return pl.pallas_call(
                corner_kernel,
                out_shape=jax.ShapeDtypeStruct((M, F), jnp.float32),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(table, cidx, w)

        try:
            enc.lower(table, cidx, w).compile()
            if mode == "time":
                out = enc(table, cidx, w)
                _ = float(out.sum())
                t0 = time.perf_counter()
                for _ in range(10):
                    out = enc(table, cidx, w)
                _ = float(out.sum())
                dt = (time.perf_counter() - t0) / 10
                print(f"corner-encode M={M}: {dt*1e3:.3f} ms "
                      f"({dt/(8*M)*1e9:.2f} ns/corner-row)", flush=True)
            else:
                print("corner-encode: lowers OK", flush=True)
        except Exception as e:
            print(f"corner-encode: FAIL {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
