"""Worker for the real multi-process jax.distributed test (test_multihost.py).

Launched as: python tests/_mp_worker.py <process_id> <num_processes> <port>
with XLA_FLAGS=--xla_force_host_platform_device_count=<local devices>.
Prints one JSON line with the process view + the parallel-train-step loss.
"""

import json
import os
import sys

# The worker is a bare subprocess: it inherits neither pytest's rootdir
# sys.path insertion nor an editable install.  Make the repo importable.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

import jax

jax.config.update("jax_platforms", "cpu")

from neus2_tpu.parallel import distributed

# distributed.initialize selects the gloo CPU collectives backend itself.
distributed.initialize(
    coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
)

from neus2_tpu.data.synthetic import make_sphere_dataset
from neus2_tpu.engine.train import (
    TrainConfig,
    init_train_state,
    occupancy_update,
)
from neus2_tpu.models.field import FieldConfig
from neus2_tpu.ops.hashgrid import HashGridConfig
from neus2_tpu.parallel.train import parallel_train_step, replicate_state

mesh = distributed.global_mesh()
config = TrainConfig(
    field=FieldConfig(
        grid=HashGridConfig(
            n_levels=3, log2_hashmap_size=10, base_resolution=8,
            per_level_scale=1.5,
        ),
        sdf_hidden_dim=16,
        rgb_hidden_dim=16,
    ),
    n_rays=32,  # per device
    samples_per_ray=8,
    n_candidates=16,
    occ_n_probe=1 << 9,
)
ds = make_sphere_dataset(n_views=2, resolution=16)
state = init_train_state(jax.random.PRNGKey(0), config, n_images=2)
state = replicate_state(state, mesh)
state = occupancy_update(state, config)
state, aux = parallel_train_step(
    state, ds.images_device(), ds.cameras(), config, mesh
)
loss = float(jax.device_get(aux.loss))
distributed.barrier("done")
print(
    json.dumps(
        {
            "pid": pid,
            "nproc": jax.process_count(),
            "ndev": jax.device_count(),
            "local": jax.local_device_count(),
            "primary": distributed.is_primary(),
            "loss": loss,
        }
    ),
    flush=True,
)
