"""Real-run occ_len / adaptive-bucket characterization on the chip.

Answers the round-2 verdict's open question (weak #5): which converged
occ_len is representative of a REAL run — the bench's constructed operating
point straddles the bucket-1/bucket-2 boundary (0.031-0.044 across runs vs
the 0.036 threshold), a 1.9x headline swing.  This tool trains the exact
bench flagship (bf16 L14/F2, 16-view sphere scene, bench.flagship_config)
through the PRODUCT path (Testbed: adaptive buckets, hysteresis, occupancy
cadence) and logs the occ_len trajectory + bucket transitions + steady-state
step rate, resumable in <10-min chunks like tools_tpu_validate.py.

  python tools_occlen_run.py [target_steps] [--seed N] [--tag NAME]

Writes /tmp/occlen_<tag>.json {steps, occ_hist: [[step, occ_len, ema,
bucket], ...], final_bucket, rate_rays_s, psnr, sdf_err} and pauses/resumes
via /tmp/occlen_<tag>.msgpack.
"""

import argparse
import json
import time
from pathlib import Path

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/neus2_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
import numpy as np

from bench import flagship_config
from neus2_tpu.api.testbed import Hyperparams, Testbed
from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.models.field import sdf_fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("target", nargs="?", type=int, default=2000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tag", default=None)
    p.add_argument("--budget_s", type=float, default=480)
    args = p.parse_args()
    tag = args.tag or f"s{args.seed}"
    snap = Path(f"/tmp/occlen_{tag}.msgpack")
    meta = Path(f"/tmp/occlen_{tag}.json")

    config = flagship_config()
    tb = Testbed(
        config=config,
        hyper=Hyperparams(first_frame_max_training_step=args.target),
        seed=args.seed,
    )
    tb.load_training_data_from_datasets(
        [make_sphere_dataset(n_views=16, resolution=256)]
    )
    hist = []
    if snap.exists():
        tb.load_snapshot(snap)
        if meta.exists():
            hist = json.loads(meta.read_text()).get("occ_hist", [])
        print(f"resumed at step {tb.training_step}", flush=True)

    t0 = time.time()
    last_fetch_step = tb.training_step
    rate_t0, rate_step0, rate_bucket = time.time(), tb.training_step, tb.batch_bucket
    rates = {}  # bucket -> most recent rays/s over a stable stretch
    while tb.training_step < args.target and time.time() - t0 < args.budget_s:
        tb.train()
        if tb.training_step % 16 == 0:
            # occ_len EMA + bucket were just refreshed inside tb.train()
            hist.append(
                [
                    tb.training_step,
                    round(float(tb._occ_len_ema or 0.0), 5),
                    tb.batch_bucket,
                ]
            )
            if tb.batch_bucket != rate_bucket:
                rate_t0, rate_step0 = time.time(), tb.training_step
                rate_bucket = tb.batch_bucket
            elif tb.training_step - rate_step0 >= 64:
                dt = time.time() - rate_t0
                rays = config.n_rays << rate_bucket
                rates[str(rate_bucket)] = round(
                    rays * (tb.training_step - rate_step0) / dt, 1
                )
        if tb.training_step % 200 == 0 and tb.training_step != last_fetch_step:
            last_fetch_step = tb.training_step
            print(
                f"step {tb.training_step} loss={tb.loss_scalar:.5f} "
                f"occ_len_ema={tb._occ_len_ema} bucket={tb.batch_bucket} "
                f"[{time.time()-t0:.0f}s]",
                flush=True,
            )

    out = {
        "steps": tb.training_step,
        "seed": args.seed,
        "occ_hist": hist,
        "final_bucket": tb.batch_bucket,
        "final_occ_ema": float(tb._occ_len_ema or 0.0),
        "rates": rates,
    }
    if tb.training_step >= args.target:
        d = np.random.default_rng(0).normal(size=(512, 3))
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        shell = jnp.asarray(0.5 + 0.25 * d, jnp.float32)
        sdf, _ = sdf_fn(tb.state.ema_params, shell, config.field)
        out["sdf_err"] = float(jnp.abs(sdf).mean())
        print("DONE", flush=True)
    else:
        tb.save_snapshot(snap)
        print(
            f"paused at step {tb.training_step} [{time.time()-t0:.0f}s]",
            flush=True,
        )
    meta.write_text(json.dumps(out))
    print(json.dumps({k: v for k, v in out.items() if k != "occ_hist"}),
          flush=True)


if __name__ == "__main__":
    main()
