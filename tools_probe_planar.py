"""Planar (F, T) table-layout probe (VERDICT r4 task 7, timeboxed).

Round-4 measured a ~16 ms/step materialized transpose around the Pallas
segment-sum output (PERF.md): the (T, F) standard layout the optimizer and
next step's gather want forces layout movement somewhere, and eliminating
it would require planar (F, T) table storage END-TO-END.  Before paying
that refactor (hashgrid_fast fwd gathers + optimizer + snapshot format),
this probe measures the decisive primitive: the FORWARD gather cost from
planar storage vs row storage at flagship scale.  Per PERF.md, XLA:TPU
gather cost is ~flat in row width and linear in ROW COUNT — planar
storage must gather F scalar-rows per lookup (or gather along the minor
axis), so the expectation is ~F x the row-layout cost, dwarfing the 16 ms
transpose saving.  A measured negative here closes the question.

Run on the real chip (no JAX_PLATFORMS): python tools_probe_planar.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

T = 1 << 19  # flagship hashed-level rows
M = 1 << 21  # ~2.1M gathered rows per level per step


def timeit(name, fn, *args, iters=10):
    out = jax.jit(fn)(*args)
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.jit(fn)(*args)
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:8.2f} ms", flush=True)
    return dt


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(key, (M,), 0, T, jnp.int32)

    for F in (2, 4, 8):
        tab_rows = jax.random.normal(key, (T, F), jnp.float32)
        tab_planar = jnp.asarray(tab_rows.T)  # (F, T)

        # row layout: ONE gather of M F-wide rows (the production path)
        timeit(
            f"F={F} row (T,F) take axis0",
            lambda t, i: jnp.take(t, i, axis=0).sum(),
            tab_rows, idx,
        )
        # planar, one gather along the minor axis
        timeit(
            f"F={F} planar (F,T) take axis1",
            lambda t, i: jnp.take(t, i, axis=1).sum(),
            tab_planar, idx,
        )
        # planar, F separate scalar-row gathers (the other lowering)
        timeit(
            f"F={F} planar F x 1-D takes",
            lambda t, i: sum(
                jnp.take(t[f], i, axis=0).sum() for f in range(t.shape[0])
            ),
            tab_planar, idx,
        )

    # the cost being saved: the (L, F, T) -> (T, F) per-level transpose
    L = 9
    big = jax.random.normal(key, (L, 2, T), jnp.float32)
    timeit(
        "9-level (L,2,T)->(T,2) transposes (the 16ms)",
        lambda b: sum(
            jnp.swapaxes(b[l], 0, 1).sum() for l in range(L)
        ),
        big,
    )


if __name__ == "__main__":
    main()
