"""Benchmark: training-step throughput (rays/s/chip) on real TPU hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers (BASELINE.md).  The NeuS2 paper
reports minutes-scale DTU training on an RTX 3090 at ~2000 steps with 4096
rays/batch — roughly 8 steps/s ~= 33k rays/s.  We use 33_000 rays/s as the
reference-derived baseline; vs_baseline = ours / baseline (higher is better).
"""

import json
import time

import jax

BASELINE_RAYS_PER_S = 33_000.0


def main():
    import jax.numpy as jnp

    from neus2_tpu.data.synthetic import make_sphere_dataset
    from neus2_tpu.engine.train import (
        TrainConfig,
        init_train_state,
        occupancy_update,
        train_step,
    )
    from neus2_tpu.models.field import FieldConfig
    from neus2_tpu.ops.hashgrid import HashGridConfig

    # Flagship config: base.json-scale hashgrid, 4096 rays x 64 samples
    # (the reference's 2^18-sample batch geometry).
    config = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=14,
                log2_hashmap_size=19,
                base_resolution=16,
                per_level_scale=HashGridConfig.per_level_scale_from_top(16, 2048, 14),
            )
        ),
        n_rays=4096,
        samples_per_ray=64,
        n_candidates=256,
        mask_loss_weight=0.1,
    )
    ds = make_sphere_dataset(n_views=16, resolution=256)
    images = ds.images_device()
    cameras = ds.cameras()

    state = init_train_state(jax.random.PRNGKey(0), config, n_images=16)
    state = occupancy_update(state, config)

    # Warmup / compile.  NOTE: under the axon tunnel block_until_ready may
    # return before remote work drains; fetching a scalar value is the only
    # reliable completion barrier, so time N chained steps ending in a fetch.
    state, aux = train_step(state, images, cameras, config)
    _ = float(aux.loss)

    n_iters = 20
    t0 = time.perf_counter()
    for _ in range(n_iters):
        state, aux = train_step(state, images, cameras, config)
    _ = float(aux.loss)
    dt = time.perf_counter() - t0

    rays_per_s = config.n_rays * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "train_rays_per_s_per_chip",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
