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
                print(f"rows={rows} m={m}: {dt*1e3:.3f} ms "
                      f"({rate:.2f} G elems/s)", flush=True)
            else:
                print(f"rows={rows} m={m}: lowers OK", flush=True)
        except Exception as e:
            print(f"rows={rows} m={m}: FAIL {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
