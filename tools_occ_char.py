"""Characterize the bench's converged occ_len (VERDICT r2 weak #5 / task 8).

The converged-regime benchmark (bench.py _bench_converged) constructs a
steady operating point: warm W steps, set the variance head to its
converged value, reset + fully re-sweep the occupancy grid, then read
aux.mean_occ_len from one training step.  Round 2's runs landed at
occ_len 0.031-0.044 — a spread that straddles the bucket-1/bucket-2
boundary (0.0361 at 64 base samples) and therefore a 1.9x headline swing.

This tool isolates the two candidate sources:
  * geometry convergence (warmup length W),
  * batch noise (occ_len is a mean over one 4096-ray batch),
by printing occ_len for M consecutive measurement steps at each
(seed, warm) combination.  One combination per invocation (tunnel-window
sized); results go in PERF.md.

Usage: python tools_occ_char.py SEED WARM [RESWEEP=80] [MEASURE=8]
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from bench import flagship_config
from neus2_tpu.engine.train import (
    desired_batch_bucket,
    init_train_state,
    occupancy_prior_sweep,
    occupancy_update,
    train_step,
)


def main():
    seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    warm = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    resweep = int(sys.argv[3]) if len(sys.argv) > 3 else 80
    measure = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    config = flagship_config()
    from neus2_tpu.data.synthetic import make_sphere_dataset
    from neus2_tpu.engine import occupancy as occ_mod

    ds = make_sphere_dataset(n_views=16, resolution=256)
    images = ds.images_device()
    cameras = ds.cameras()
    state = init_train_state(jax.random.PRNGKey(seed), config, n_images=16)
    state = occupancy_prior_sweep(state, config)

    t0 = time.time()
    for i in range(warm):
        if i % 4 == 0:
            state = occupancy_update(state, config)
        state, aux = train_step(state, images, cameras, config)
    print(f"warm {warm} steps: {time.time()-t0:.0f}s loss={float(aux.loss):.5f}",
          flush=True)

    state = state._replace(
        params={
            **state.params,
            "variance": jnp.full_like(state.params["variance"], 0.75),
        },
        occupancy=occ_mod.reset_density(state.occupancy),
    )
    for _ in range(resweep):
        state = occupancy_update(state, config)

    vals = []
    for _ in range(measure):
        state, aux = train_step(state, images, cameras, config)
        vals.append(float(aux.mean_occ_len))
    mean = sum(vals) / len(vals)
    print(
        f"OCCCHAR seed={seed} warm={warm} resweep={resweep} "
        f"occ_len mean={mean:.4f} min={min(vals):.4f} max={max(vals):.4f} "
        f"per_step={[round(v, 4) for v in vals]} "
        f"bucket(mean)={desired_batch_bucket(mean, config)}",
        flush=True,
    )


if __name__ == "__main__":
    main()
