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
    print_xplane_op_ranking(xplanes[-1], n_steps)


def print_xplane_op_ranking(xp: str, n_steps: int, top: int = 40):
    """Rank ops by device self-time straight from the raw xplane proto.

    tensorboard_plugin_profile's converter is broken in this image (protobuf
    descriptor mismatch, seen 2026-08-20); TF's bundled tsl xplane_pb2
    parses the same file fine.  The "XLA Ops" line is the core's serialized
    timeline — its summed durations/n_steps equal the step wall time when
    the core is busy end-to-end."""
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    space = xplane_pb2.XSpace()
    with open(xp, "rb") as f:
        space.ParseFromString(f.read())
    planes = [p for p in space.planes if p.name.startswith("/device:TPU")]
    if not planes:
        print("[profile] no TPU plane in trace")
        return
    plane = planes[0]
    md = plane.event_metadata
    line = max(plane.lines, key=lambda l: len(l.events))
    tot, cnt = defaultdict(float), defaultdict(int)
    for ev in line.events:
        name = md[ev.metadata_id].name
        tot[name] += ev.duration_ps / 1e9  # ms
        cnt[name] += 1
    print(
        f"[profile] line {line.name!r}: "
        f"{sum(tot.values())/n_steps:.1f} ms/step over {n_steps} steps"
    )
    for name, ms in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{ms/n_steps:8.2f} ms/step  x{cnt[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
