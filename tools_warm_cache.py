"""Warm the persistent compile cache for bench.py, one program per run.

Usage: python tools_warm_cache.py [bucket0|bucket1|bucket2|occ]
Each invocation compiles exactly one train-step shape (or the occupancy
update) of the bf16 flagship config and runs it once — sized to fit one
<10-minute tunnel window.  bench.py then starts with every program cached.
"""

import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

from bench import _setup, flagship_config


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "bucket0"
    config = flagship_config()
    t0 = time.time()
    state, images, cameras = _setup(config)
    print(f"setup {time.time()-t0:.0f}s", flush=True)

    from neus2_tpu.engine.train import occupancy_update, train_step

    if which == "occ":
        state = occupancy_update(state, config)
        _ = float(state.occupancy.density.sum())
    else:
        b = int(which[-1])
        cfg = dataclasses.replace(
            config,
            n_rays=config.n_rays << b,
            samples_per_ray=config.samples_per_ray >> b,
        )
        t0 = time.time()
        state, aux = train_step(state, images, cameras, cfg)
        loss = float(aux.loss)
        print(f"{which} compile+run {time.time()-t0:.0f}s loss={loss:.5f}",
              flush=True)
    print("WARMED", which, flush=True)


if __name__ == "__main__":
    main()
