"""Multi-host (multi-process) runtime: initialization + global-batch assembly.

The reference is strictly single-device and single-process (SURVEY.md §2
"Parallelism strategies — first-class absence report"; §5 "Distributed
communication backend: absent"). This module is the TPU-native scale-out
substrate built in its place, following the JAX multi-controller model:

* every host runs the SAME program (`jax.distributed.initialize` wires the
  processes together; XLA collectives ride ICI within a slice and DCN across
  hosts — no hand-written NCCL/MPI layer),
* the ``Mesh`` in ``parallel/mesh.py`` is built over **global** devices, so
  train steps, shardings, and checkpointing code are identical on 1 process
  and N processes,
* each process loads only its shard of the dataset
  (``ImageLoader(shard=...)``) and contributes its **process-local** slice of
  the global batch via ``jax.make_array_from_process_local_data``.

Batch-size convention: config ``batch_size`` is the GLOBAL batch; each
process loads ``batch_size // process_count()`` images per step.

Launch (one command per host, same everywhere):

    D3F_COORDINATOR=host0:1234 D3F_NUM_PROCESSES=4 D3F_PROCESS_ID=$RANK \\
        d3f-tpu train new --config_path ...

On Cloud TPU pods, omit the variables — ``jax.distributed.initialize()``
auto-detects from the TPU metadata server.
"""

from __future__ import annotations

import os

import jax
import numpy as np

ENV_COORDINATOR = "D3F_COORDINATOR"
ENV_NUM_PROCESSES = "D3F_NUM_PROCESSES"
ENV_PROCESS_ID = "D3F_PROCESS_ID"

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Idempotent wrapper over ``jax.distributed.initialize``.

    Must run before any jax computation touches the backend. With no
    arguments, relies on TPU-pod auto-detection.
    """
    global _initialized
    if _initialized:
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id,
                               local_device_ids=local_device_ids)
    _initialized = True


def maybe_initialize_from_env() -> bool:
    """Initialize multi-process jax iff the D3F_* launch env is present.

    Called at the top of every workload runner — a no-op for the common
    single-host case, so local runs never pay for (or depend on) the
    coordinator service.
    """
    coordinator = os.environ.get(ENV_COORDINATOR)
    if not coordinator:
        return False
    num = os.environ.get(ENV_NUM_PROCESSES)
    pid = os.environ.get(ENV_PROCESS_ID)
    if num is None or pid is None:
        raise ValueError(
            f"{ENV_COORDINATOR} is set but {ENV_NUM_PROCESSES}/"
            f"{ENV_PROCESS_ID} are not — set all three (or none)")
    initialize(coordinator, int(num), int(pid))
    return True


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def is_primary() -> bool:
    """True on the process that owns logging, manifests, and stdout."""
    return jax.process_index() == 0


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of the global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch_size {global_batch_size} must be divisible by "
            f"process_count {n}")
    return global_batch_size // n


def data_shard() -> tuple[int, int] | None:
    """(process_index, process_count) for ImageLoader sharding; None if 1."""
    n = jax.process_count()
    return (jax.process_index(), n) if n > 1 else None


def fetch_local(tree):
    """Fetch a pytree to host numpy, valid on multi-process global arrays.

    ``jax.device_get`` refuses arrays spanning other hosts' devices
    (multi-host pitfall #2); replicated leaves read their local copy,
    batch-sharded leaves concatenate this process's rows — the local shard
    is the right semantic for per-host observability.
    """
    def get(x):
        if not hasattr(x, "sharding"):
            return x
        if x.is_fully_addressable:
            return np.asarray(x)
        if x.sharding.is_fully_replicated:
            return np.asarray(x.addressable_shards[0].data)
        shards = sorted(x.addressable_shards,
                        key=lambda s: (s.index[0].start or 0))
        return np.concatenate([np.asarray(s.data) for s in shards])

    return jax.tree.map(get, tree)


def global_batch_from_local(local_batch, sharding):
    """Assemble a global sharded array from this process's local slice.

    Each process passes its own ``(local_B, H, W, C)`` numpy batch; the
    result is one global jax.Array of shape ``(global_B, H, W, C)`` laid out
    by ``sharding`` — the multi-process analog of ``jax.device_put``.
    Non-array leaves and host-side scalars pass through untouched.
    """
    def put(x):
        if getattr(x, "ndim", 0) >= 3:
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        return x

    return jax.tree.map(put, local_batch)
