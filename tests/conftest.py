"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the standard JAX trick for testing shard_map/pjit collectives without
TPU hardware (SURVEY.md §4).  Note: in the axon environment the TPU platform
registers itself regardless of JAX_PLATFORMS, so we additionally pin the
default device to CPU — tests must not round-trip through the TPU tunnel.
"""

import os

# Force, don't setdefault: the deployment shell exports JAX_PLATFORMS=axon
# globally, which would both leave the TPU plugin first in line and defeat
# env-based CPU guards in modules the tests import (e.g. bench.py).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
# No persistent compilation cache in tests: serializing large 8-virtual-
# device CPU executables through the cache-write path can SEGFAULT the
# process (jax compilation_cache.put_executable_and_time; reproduced
# 2026-08-21 after a test imported bench.py, which enables the cache for
# TPU runs).  Tests must also never inherit a cache dir from the env.
jax.config.update("jax_compilation_cache_dir", None)
# Force the platform list to cpu BEFORE any backend initializes: the axon
# plugin sets jax_platforms="axon,cpu" at registration, and initializing it
# blocks forever when the tunnel relay is down (see utils/cpuforce.py).
from neus2_tpu.utils.cpuforce import force_cpu  # noqa: E402

force_cpu()


def cpu_devices():
    return jax.devices("cpu")
