"""Full-scale TPU training validation: flagship config on the synthetic scene.

Resumable in <10-minute chunks (snapshot between invocations) so it fits the
driver's command windows; uses the persistent JAX compilation cache so only
the first invocation pays the ~4 min TPU compile.

Run repeatedly until it prints DONE:
  python tools_tpu_validate.py [target_steps]
"""

import json
import sys
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import numpy as np
import jax.numpy as jnp

from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine.train import TrainConfig
from neus2_tpu.models.field import FieldConfig, sdf_fn
from neus2_tpu.ops.hashgrid import HashGridConfig

SNAP = Path("/tmp/tpu_validate.msgpack")
META = Path("/tmp/tpu_validate.json")
TARGET = int(sys.argv[1]) if len(sys.argv) > 1 else 1200


def main():
    config = TrainConfig(
        field=FieldConfig(
            grid=HashGridConfig(
                n_levels=14, log2_hashmap_size=19, base_resolution=16,
                per_level_scale=HashGridConfig.per_level_scale_from_top(16, 2048, 14),
            )
        ),
        n_rays=4096,
        samples_per_ray=64,
        n_candidates=256,
        ek_loss_weight=0.1,
        mask_loss_weight=0.1,
    )
    tb = Testbed(config=config, hyper=Hyperparams(first_frame_max_training_step=TARGET))
    tb.load_training_data_from_datasets(
        [make_sphere_dataset(n_views=16, resolution=256)]
    )
    if SNAP.exists():
        tb.load_snapshot(SNAP)
        print(f"resumed at step {tb.training_step}", flush=True)

    t0 = time.time()
    budget_s = 480  # leave margin in a 595 s window
    while tb.training_step < TARGET and time.time() - t0 < budget_s:
        tb.train()
        if tb.training_step % 100 == 0:
            print(
                f"step {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"[{time.time()-t0:.0f}s, {1000*tb.meters.training_ms.value:.0f}us?]",
                flush=True,
            )
    tb.save_snapshot(SNAP)
    print(f"paused/finished at step {tb.training_step} [{time.time()-t0:.0f}s]", flush=True)

    if tb.training_step >= TARGET:
        d = np.random.default_rng(0).normal(size=(512, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        shell = jnp.asarray(0.5 + 0.25 * d, jnp.float32)
        sdf, _ = sdf_fn(tb.state.ema_params, shell, config.field)
        err = float(jnp.abs(sdf).mean())
        rgb, depth, alpha = tb.render(0, spp=1)
        from neus2_tpu.ops.image import psnr
        from neus2_tpu.ops.losses import linear_to_srgb

        tex = tb.images[0]
        a = tex[..., 3:4]
        target = jnp.where(
            a > 0, linear_to_srgb(tex[..., :3] / jnp.where(a > 0, a, 1.0)) * a, 0.0
        )
        p = float(psnr(jnp.asarray(rgb), target))
        META.write_text(json.dumps({"steps": tb.training_step, "shell_sdf": err, "psnr": p}))
        print(f"DONE steps={tb.training_step} shell|sdf|={err:.4f} train-view PSNR={p:.2f}", flush=True)


if __name__ == "__main__":
    main()
