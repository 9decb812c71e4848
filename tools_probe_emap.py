"""TPU-time the error-map sampling path in isolation (VERDICT r3 task 6).

The concern (PERF.md): jnp.searchsorted serializes catastrophically at
64k queries over 2M rows (13-21 s/call).  The error map's production scale
is far smaller — 48 views x derived res (35^2 at bucket 0, 50^2 at bucket 2)
-> 59k-120k CDF rows, 4k-16k queries — but it has never been timed on the
chip.  This probe times sample_pixels (searchsorted method="sort"), deposit
(a 4B-update scatter-add), and rebuild_cdf (blocked_cumsum) standalone at
both bucket scales.  Isolation numbers are upper bounds on in-step cost
(XLA overlaps them with other work inside the full program).

Usage: python tools_probe_emap.py
"""

import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from neus2_tpu.engine import error_map as emap


def timeit(fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    # End timing with a scalar fetch (tunnel block_until_ready unreliable).
    jax.tree_util.tree_map(lambda x: float(jnp.asarray(x).reshape(-1)[0]), out)
    return (time.perf_counter() - t0) / iters * 1000


def main():
    n_images = 48
    for n_rays in (4096, 16384):
        res = emap.resolution_for(n_rays, n_images, 256)
        state = emap.init_error_map(n_images, res)
        # Non-trivial contents so the CDF is not degenerate.
        key = jax.random.PRNGKey(0)
        em = jax.random.uniform(key, state.error_map.shape)
        state = state._replace(error_map=em)
        state = jax.jit(emap.rebuild_cdf)(state)
        state = state._replace(error_map=em)

        sample = jax.jit(
            lambda s, k: emap.sample_pixels(s, k, n_rays, n_images)
        )
        ms_sample = timeit(sample, state, key)

        img, uv = sample(state, key)
        loss = jax.random.uniform(key, (n_rays,))
        dep = jax.jit(emap.deposit)
        ms_dep = timeit(dep, state, img, uv, loss)

        reb = jax.jit(emap.rebuild_cdf)
        ms_reb = timeit(reb, state, iters=5)

        print(
            f"rays={n_rays:6d} res={res} cdf_rows={n_images*res*res:7d}: "
            f"sample_pixels {ms_sample:7.2f} ms  deposit {ms_dep:7.2f} ms  "
            f"rebuild_cdf {ms_reb:7.2f} ms",
            flush=True,
        )


if __name__ == "__main__":
    main()
