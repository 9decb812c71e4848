"""Measure flagship train-step time on the real TPU: fp32 vs bf16 compute.

Usage: python tools_perf_step.py [fp32|bf16] [n_iters]
Prints rays/s and ms/step (timing ends with a scalar fetch — the tunnel's
block_until_ready is unreliable, see PERF.md).
"""

import dataclasses
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from bench import _setup, flagship_config
from neus2_tpu.engine.train import train_step


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fp32"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    config = flagship_config()
    config = dataclasses.replace(
        config,
        field=dataclasses.replace(
            config.field,
            compute_dtype=jnp.bfloat16 if mode == "bf16" else None,
        ),
    )
    state, images, cameras = _setup(config)

    t0 = time.perf_counter()
    state, aux = train_step(state, images, cameras, config)
    loss0 = float(aux.loss)
    print(f"[{mode}] compile+first step {time.perf_counter()-t0:.1f}s "
          f"loss={loss0:.5f}", flush=True)

    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, aux = train_step(state, images, cameras, config)
    loss = float(aux.loss)
    dt = time.perf_counter() - t0
    print(
        f"[{mode}] {1000*dt/n_iters:.1f} ms/step  "
        f"{config.n_rays*n_iters/dt:.0f} rays/s  loss={loss:.5f}",
        flush=True,
    )


if __name__ == "__main__":
    main()
