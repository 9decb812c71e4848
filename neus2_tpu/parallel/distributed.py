"""Multi-host initialization and checkpoint-restart coordination.

The reference is single-process/single-GPU (SURVEY.md §2.4); this module is
the multi-host layer of the TPU framework: `jax.distributed` per-host init,
primary-process gating for logging/checkpoint writes (SURVEY §5.8), and
restart-from-checkpoint (the recovery model in SURVEY §5.3 — no in-job
elasticity needed to match the reference).

On a pod slice, launch one process per host (e.g. via the TPU VM runtime);
each host sees its local chips, the global mesh spans all of them.
"""

from __future__ import annotations

import os

import jax


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """`jax.distributed.initialize` with cloud-TPU auto-detection.

    On Cloud TPU VMs all arguments auto-detect; pass them explicitly for
    other clusters. Safe to call when single-process (no-op): a run is only
    treated as multi-host when the caller passes arguments or the
    environment names MORE THAN ONE worker host (a single-entry
    TPU_WORKER_HOSTNAMES — e.g. the axon tunnel's 'localhost' — is a
    single-process run)."""
    if num_processes == 1:
        return
    explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_env = len([h for h in hosts.split(",") if h]) > 1 or (
        os.environ.get("JAX_COORDINATOR_ADDRESS") is not None
    )
    if not explicit and not multi_env:
        return  # single-process run
    # Multi-process CPU meshes (tests, CPU clusters) need the gloo
    # collectives backend; harmless no-op for TPU runs.
    try:
        if jax.config.jax_platforms and "cpu" in str(jax.config.jax_platforms):
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_primary() -> bool:
    """True on the process that should write logs/checkpoints/meshes."""
    return jax.process_index() == 0


def global_mesh(axis_name: str = "data"):
    """1D mesh over every chip of every host (ICI within hosts, DCN across)."""
    from neus2_tpu.parallel.train import make_mesh

    return make_mesh(jax.devices(), axis_name)


def barrier(name: str = "ckpt") -> None:
    """Cross-host sync point (e.g. after checkpoint writes)."""
    if jax.process_count() > 1:
        # A tiny all-reduce over every device acts as a barrier.
        import jax.numpy as jnp

        x = jnp.ones((jax.local_device_count(),))
        jax.pmap(lambda v: jax.lax.psum(v, "i"), axis_name="i")(x).block_until_ready()
