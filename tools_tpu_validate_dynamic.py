"""Dynamic-scene TPU validation (pose refinement + incremental), resumable.

Chunks fit the 10-minute command window via Testbed snapshots + the
persistent JAX compilation cache. Run repeatedly until it prints DONE.
"""

import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np

from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_moving_sphere_frames
from neus2_tpu.engine.train import TrainConfig
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig

SNAP = Path("/tmp/tpu_dyn_validate.msgpack")


def main():
    cfg = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=14, log2_hashmap_size=19, base_resolution=16,
                per_level_scale=HashGridConfig.per_level_scale_from_top(16, 2048, 14),
            )
        ),
        n_rays=4096, samples_per_ray=64, n_candidates=256,
        ek_loss_weight=0.1, mask_loss_weight=0.1, delta_lr=5e-3,
    )
    hyper = Hyperparams(
        first_frame_max_training_step=300,
        next_frame_max_training_step=120,
        predict_global_movement=True,
        predict_global_movement_training_step=80,
        finetune_global_movement=False,
    )
    frames = make_moving_sphere_frames(
        n_frames=2, translation_per_frame=(0.03, 0, 0), n_views=12, resolution=128
    )
    tb = Testbed(config=cfg, hyper=hyper)
    tb.load_training_data_from_datasets(frames)
    if SNAP.exists():
        # load_snapshot replays phase flags + frame dataset
        # (Testbed._restore_phase_flags).
        tb.load_snapshot(SNAP)
        print(
            f"resumed frame {tb.current_training_time_frame} "
            f"step {tb.training_step}",
            flush=True,
        )

    t0 = time.time()
    while time.time() - t0 < 460:
        if not tb.frame():
            d = np.asarray(jax.device_get(tb.state.delta)["transition"])
            print(
                f"DONE: learned delta trans={np.round(d, 4)} "
                f"(want ~[-0.03, 0, 0])",
                flush=True,
            )
            return
        if tb.training_step % 50 == 0:
            print(
                f"frame {tb.current_training_time_frame} step {tb.training_step} "
                f"loss={tb.loss_scalar:.5f} [{time.time()-t0:.0f}s]",
                flush=True,
            )
    tb.save_snapshot(SNAP)
    print(
        f"paused at frame {tb.current_training_time_frame} "
        f"step {tb.training_step} [{time.time()-t0:.0f}s]",
        flush=True,
    )


if __name__ == "__main__":
    main()
