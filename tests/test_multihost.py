"""Real multi-process (multi-host analog) tests over jax.distributed.

SURVEY §4 item (4): multi-host tests on CPU meshes.  Two actual OS processes
form a 2-process x 4-device global mesh (gloo collectives across processes —
the DCN stand-in), run the production parallel train step, and must agree on
the loss.  Also guards the init-ordering contract: no package module may
initialize the XLA backend at import time, or jax.distributed.initialize
breaks on real pods.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def _clean_env(local_devices: int):
    env = dict(os.environ)
    # Strip the axon TPU plugin (sitecustomize registration) so subprocesses
    # are pure-CPU and cannot touch the tunnel.
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    return env


def test_no_import_time_backend_init():
    """Importing every neus2_tpu module must NOT initialize the XLA backend
    (jax.distributed.initialize must run first on real multi-host)."""
    code = (
        "import pkgutil, importlib, jax\n"
        "from jax._src import xla_bridge as xb\n"
        "import neus2_tpu\n"
        "for m in pkgutil.walk_packages(neus2_tpu.__path__, 'neus2_tpu.'):\n"
        "    importlib.import_module(m.name)\n"
        "    assert not xb.backends_are_initialized(), m.name\n"
        "print('CLEAN')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], env=_clean_env(1), cwd=REPO,
        capture_output=True, text=True, timeout=240,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "CLEAN" in out.stdout


def test_two_process_distributed_train():
    """2 processes x 4 virtual devices: global mesh spans both processes,
    the parallel train step psums across them (gloo), and both controllers
    compute the identical finite loss; process 0 is primary."""
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = _clean_env(4)
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             str(pid), "2", str(port)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=240)
        assert p.returncode == 0, se[-2000:]
        outs.append(json.loads(so.strip().splitlines()[-1]))

    by_pid = {o["pid"]: o for o in outs}
    for o in outs:
        assert o["nproc"] == 2 and o["ndev"] == 8 and o["local"] == 4
        assert np.isfinite(o["loss"])
    assert by_pid[0]["primary"] and not by_pid[1]["primary"]
    assert by_pid[0]["loss"] == by_pid[1]["loss"]
