"""Split the march cost at bucket-2 shapes (round 3; march = 152 ms of the
391 ms bucket-2 step — tools_perf_decomp).

Variants isolate: the occupancy bitfield lookup, the probe-jitter randoms,
the inverse-CDF draw machinery, and the raw interval scaffolding.

Usage: python tools_probe_march.py [n_iters]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from bench import _setup, flagship_config
from neus2_tpu.engine.march import march_rays, march_probe

R, B = 16384, 16  # bucket-2 geometry
C = 256


def timed(fn, args, n_iters, name):
    out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = fn(*args)
    _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
    print(f"{name}: {1000*(time.perf_counter()-t0)/n_iters:.1f} ms", flush=True)


def main():
    n_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    config = flagship_config()
    state, images, cameras = _setup(config)
    aabb = config.aabb()
    occ = state.occupancy
    key = jax.random.PRNGKey(0)

    def rays(k):
        o = jax.random.uniform(k, (R, 3)) * 0.1 + 0.45
        d = jax.random.normal(k, (R, 3))
        return o, d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    @jax.jit
    def full(k):
        o, d = rays(k)
        s = march_rays(k, o, d, aabb, occ, C, B)
        return s.t.sum() + s.dt.sum()

    @jax.jit
    def nojit_probe(k):  # probe_jitter=False: drops the (R,C) uniforms
        o, d = rays(k)
        s = march_rays(k, o, d, aabb, occ, C, B, probe_jitter=False)
        return s.t.sum() + s.dt.sum()

    @jax.jit
    def nojitter(k):  # jitter=False: drops (R,C) AND (R,B) uniforms
        o, d = rays(k)
        s = march_rays(k, o, d, aabb, occ, C, B, jitter=False)
        return s.t.sum() + s.dt.sum()

    @jax.jit
    def no_occ(k):  # occupancy=None: no bitfield lookup at all
        o, d = rays(k)
        s = march_rays(k, o, d, aabb, None, C, B)
        return s.t.sum() + s.dt.sum()

    @jax.jit
    def probe_only(k):  # march_probe: intervals + occupancy, no draws
        o, d = rays(k)
        return march_probe(o, d, aabb, occ, C).sum()

    timed(full, (key,), n_iters, "march full (R=16384,C=256,B=16)")
    timed(nojit_probe, (key,), n_iters, "march probe_jitter=False")
    timed(nojitter, (key,), n_iters, "march jitter=False")
    timed(no_occ, (key,), n_iters, "march occupancy=None")
    timed(probe_only, (key,), n_iters, "march_probe only (no draws)")


if __name__ == "__main__":
    main()
