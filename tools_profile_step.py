"""Profile the train step on the real TPU: per-op self-time ranking.

Usage: python tools_profile_step.py [bucket] [n_steps]
Traces n_steps compiled steps under jax.profiler and prints the top ops by
self time (device), via tensorboard_plugin_profile's xplane converter.
State construction: bench._setup (dataset + prior occupancy sweep) with the
bucket's batch shapes — i.e. "bucket-N shapes on a prior-swept state", NOT
the bench's fully-constructed converged point (48 warm steps + converged
variance + occupancy re-sweep).  Shapes match, so op timings are
representative; occupancy-dependent behavior (occ_len, probe hit rates)
differs from the true converged state.
Reading the ranking: ray-proportional ops scale with the bucket's ray count
(16384 at bucket 2); sample-proportional ops are constant across buckets
(PERF.md round-3 fit: ~43 ms/4096 rays vs ~217 ms sample-bound).
"""

import dataclasses
import glob
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def main():
    bucket = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    logdir = f"/tmp/neus2_profile_b{bucket}"

    from bench import _setup, flagship_config
    from neus2_tpu.engine.train import train_step

    config = flagship_config()
    if bucket:
        config = dataclasses.replace(
            config,
            n_rays=config.n_rays << bucket,
            samples_per_ray=config.samples_per_ray >> bucket,
        )
    print(f"[profile] setup b{bucket}: {config.n_rays}x{config.samples_per_ray}",
          flush=True)
    state, images, cameras = _setup(config)
    t0 = time.perf_counter()
    state, aux = train_step(state, images, cameras, config)
    _ = float(aux.loss)
    print(f"[profile] compile+first {time.perf_counter()-t0:.1f}s", flush=True)

    jax.profiler.start_trace(logdir)
    for _ in range(n_steps):
        state, aux = train_step(state, images, cameras, config)
    _ = float(aux.loss)
    jax.profiler.stop_trace()
    print("[profile] trace done", flush=True)

    xplanes = sorted(glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True))
    if not xplanes:
        print("[profile] NO xplane captured (tunnel may not export device "
              "traces); falling back to nothing")
        return
    xp = xplanes[-1]
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    for tool in ("framework_op_stats", "tensorflow_stats", "op_profile"):
        try:
            data = raw_to_tool_data.xspace_to_tool_data(
                [xp], tool, params={}
            )
            if isinstance(data, tuple):
                data = data[0]
            out = f"/tmp/profile_b{bucket}_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print(f"[profile] {tool}: wrote {out} ({len(data)} bytes)",
                  flush=True)
        except Exception as e:
            print(f"[profile] {tool}: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
