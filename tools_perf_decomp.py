"""Decompose the flagship train step on the real TPU (bf16 flagship config).

Usage: python tools_perf_decomp.py [march|encode|forward|step] [n_iters]
Each mode is a separate compile (run repeatedly; persistent cache).  Timing
ends with a scalar fetch (tunnel rule, PERF.md).  Subtractions give the
stage costs: encode-march = field gathers+jac, step-forward = backward+opt.
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from bench import _setup, flagship_config


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "step"
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    bucket = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    import dataclasses

    config = flagship_config()
    if bucket:
        # Bucket-b batch geometry: rays <<= b, samples >>= b (the converged
        # adaptive regime) — per-ray stages (march, composite) scale with it.
        config = dataclasses.replace(
            config,
            n_rays=config.n_rays << bucket,
            samples_per_ray=config.samples_per_ray >> bucket,
        )
        mode = f"{mode}"
    state, images, cameras = _setup(config)

    from neus2_tpu.engine.march import march_rays
    from neus2_tpu.engine.train import train_step
    from neus2_tpu.models.field import field_forward

    R, S = config.n_rays, config.samples_per_ray
    aabb = config.aabb()
    key = jax.random.PRNGKey(0)

    if mode == "march":

        @jax.jit
        def fn(params, k):
            o = jax.random.uniform(k, (R, 3)) * 0.1 + 0.45
            d_ = jax.random.normal(k, (R, 3))
            d_ = d_ / jnp.linalg.norm(d_, axis=-1, keepdims=True)
            s = march_rays(
                k, o, d_, aabb, state.occupancy, config.n_candidates, S
            )
            return s.t.sum() + s.dt.sum()

        arg = state.params
    elif mode == "encode":
        # Field forward (gathers + analytic jac) on a training-scale batch.
        @jax.jit
        def fn(params, k):
            pos = jax.random.uniform(k, (R * S, 3))
            dirs = jax.random.normal(k, (R * S, 3))
            dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
            out = field_forward(params, pos, dirs, config.field)
            return (
                out.rgb.sum()
                + out.sdf.sum()
                + out.normal.sum()
                + out.inv_s.sum()
            )

        arg = state.params
    elif mode == "forward":
        # Full loss forward (march + field + composite), no grad.
        from neus2_tpu.engine.train import _forward_loss

        @jax.jit
        def fn(params, k):
            loss, _ = _forward_loss(
                {"params": params},
                state,
                images,
                cameras,
                k,
                config,
                use_delta=False,
            )
            return loss

        arg = state.params
    else:

        def fn(params, k):
            nonlocal state
            state, aux = train_step(state, images, cameras, config)
            return aux.loss

        arg = state.params

    t0 = time.perf_counter()
    v = fn(arg, key)
    v0 = float(v if not hasattr(v, "shape") or v.shape == () else v.sum())
    print(f"[{mode}] compile+first {time.perf_counter()-t0:.1f}s ({v0:.4f})",
          flush=True)
    t0 = time.perf_counter()
    for i in range(n_iters):
        v = fn(arg, jax.random.fold_in(key, i))
    _ = float(v if not hasattr(v, "shape") or v.shape == () else v.sum())
    dt = time.perf_counter() - t0
    print(f"[{mode}] {1000*dt/n_iters:.1f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
