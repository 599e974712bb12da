"""Worker for the 2-process distributed test (run via subprocess).

Usage: python two_process_worker.py <coordinator> <num_processes> <process_id>

Each process owns 2 virtual CPU devices; together they form a 4-device
global mesh. The worker assembles a global batch from its local slice and
runs a jitted reduction whose compiled program spans both processes —
a faithful miniature of the multi-host data-parallel train path.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def main(coordinator: str, num_processes: int, process_id: int) -> None:
    from denoising_diffusion_deep_fake_tpu.parallel import (
        create_mesh, batch_sharding, global_batch_from_local, initialize,
        local_batch_size, data_shard, is_primary)

    initialize(coordinator, num_processes, process_id)
    assert jax.process_count() == num_processes
    assert len(jax.local_devices()) == 2
    assert len(jax.devices()) == 2 * num_processes

    mesh = create_mesh()  # all 4 global devices on the data axis
    sharding = batch_sharding(mesh)

    # Global batch 8 -> 4 per process; each process's slice is distinct.
    assert local_batch_size(8) == 8 // num_processes
    shard = data_shard()
    assert shard == (process_id, num_processes)

    local = np.full((4, 8, 8, 3), fill_value=float(process_id),
                    dtype=np.float32)
    global_batch = global_batch_from_local(local, sharding)
    assert global_batch.shape == (8, 8, 8, 3)

    @jax.jit
    def step(x):
        return jnp.mean(x)  # cross-process reduction over the data axis

    mean = float(step(global_batch))
    # Processes contributed 0s and 1s in equal measure.
    expected = sum(range(num_processes)) / num_processes
    assert abs(mean - expected) < 1e-6, (mean, expected)
    print(f"proc {process_id}: primary={is_primary()} mean={mean}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
