"""Device mesh + sharding layer — the framework's scale-out substrate.

The reference is strictly single-device (SURVEY.md §2 "Parallelism strategies
— first-class absence report": every Trainer pins ``devices=1``; no process
groups, no collectives). This module is the TPU-native equivalent built in its
place: a ``jax.sharding.Mesh`` with a ``data`` axis (batch-parallel over
ICI/DCN) and an optional ``spatial`` axis (height-sharded conv feature maps for
large resolutions). Gradients are reduced by compiler-inserted all-reduces —
``jit`` + ``NamedSharding`` does the NCCL-equivalent work; there is no
hand-written communication backend to maintain.

Usage: params/opt state are replicated over ``data``; each device gets its
batch shard; XLA inserts one fused psum over the gradient tree per step, riding
ICI. ``spatial`` shards the H dimension of activations for the 256²+ configs
(halo exchanges become collective-permutes XLA derives from conv padding).
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(data_parallel: int | None = None, spatial: int = 1,
                devices=None) -> Mesh:
    """Build a ('data', 'spatial') mesh over the available devices.

    ``data_parallel=None`` uses every device on the data axis. On a single
    chip this degenerates to a 1x1 mesh and all shardings become no-ops, so
    the same train-step code serves laptop CPU, one TPU chip, and a pod slice.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if data_parallel is None:
        data_parallel = len(devices) // spatial
    n = data_parallel * spatial
    if n > len(devices):
        raise ValueError(
            f"mesh needs {n} devices (data={data_parallel} x spatial={spatial}) "
            f"but only {len(devices)} available")
    grid = np.asarray(devices[:n]).reshape(data_parallel, spatial)
    return Mesh(grid, axis_names=("data", "spatial"))


def training_mesh(data_parallel: int | None = None,
                  spatial: int = 1) -> Mesh:
    """The canonical ('data','spatial') mesh every fit_* runner builds.

    Multi-process runs span EVERY global device (data axis = cluster size /
    spatial); single-process honors the explicit ``data_parallel`` knob.
    Deterministic over ``jax.devices()``, so a trainer that needs the same
    mesh (for in-step activation constraints — see
    ``spatial_activation_constraint``) can rebuild it and get device-for-
    device the mesh the runner sharded the operands over.
    """
    if jax.process_count() > 1:
        return create_mesh(None, spatial=spatial)
    return create_mesh(data_parallel, spatial=spatial)


def spatial_activation_constraint(data_parallel: int | None, spatial: int):
    """Returns ``pin(x)`` re-pinning NHWC activations to the training mesh's
    ('data', 'spatial') sharding — identity when ``spatial <= 1``.

    Why this must exist (round-5 collective-census finding,
    parallel/audit.py): the train steps open with a gather-based affine warp
    whose H-axis gather the SPMD partitioner cannot partition along H — so
    without an explicit constraint on the warp OUTPUT, H-sharding dies at
    the first op and the partitioner silently REPLICATES the entire U-Net
    over the spatial axis: every spatial rank redundantly computes the full
    network (the compiled (4,2) census showed zero halo collective-permutes
    and full-H conv shapes). Pinning the post-augment activations restores
    real H-sharding: convs carry H/spatial per device and XLA inserts the
    halo exchanges.
    """
    if spatial <= 1:
        return lambda x: x
    sharding = batch_sharding(training_mesh(data_parallel, spatial),
                              spatial_dim=1)
    return lambda x: jax.lax.with_sharding_constraint(x, sharding)


def batch_sharding(mesh: Mesh, *, spatial_dim: int | None = None) -> NamedSharding:
    """NHWC batch: batch axis over 'data', optionally H over 'spatial'."""
    if spatial_dim is None:
        return NamedSharding(mesh, P("data"))
    spec = [None] * 4
    spec[0] = "data"
    spec[spatial_dim] = "spatial"
    return NamedSharding(mesh, P(*spec))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, *, spatial: bool = False):
    """Host numpy batch -> device array sharded over the data axis."""
    sharding = batch_sharding(mesh, spatial_dim=1 if spatial else None)
    return jax.device_put(batch, sharding)


def shard_state(state: Any, mesh: Mesh):
    """Replicate a train-state pytree across the mesh (pure DP layout).

    For model sizes where replication is wasteful, swap this for a
    param-sharded NamedSharding tree — the train steps only see pytrees and
    don't care.
    """
    return jax.device_put(state, replicated_sharding(mesh))


def device_prefetch(iterator, mesh: Mesh, *, depth: int = 2,
                    spatial: bool = False, upload_format: str = "rgb"):
    """Upload batches to the mesh ahead of consumption on a worker thread.

    Wraps an iterator of pytrees-of-numpy-arrays; uint8 image arrays (ndim
    >= 3) get the batch sharding, everything else is left on host. Transfers
    release the GIL, so the upload of batch k+1 overlaps the device compute
    of batch k — on high-latency links (this TPU tunnel) per-step
    ``device_put`` round-trips otherwise dominate the train loop.

    ``upload_format="i420"`` packs uint8 RGB image batches 4:2:0 on the
    worker thread (cv2 SIMD) before upload — half the wire bytes; the train
    step unpacks on-device (``ops.image.unpack_upload``). The packed tensor
    is 3-d, so it shards over the data axis only.
    """
    import queue as _queue
    import threading

    sharding = batch_sharding(mesh, spatial_dim=1 if spatial else None)
    multiprocess = jax.process_count() > 1
    if upload_format == "i420":
        from denoising_diffusion_deep_fake_tpu.ops.image import (
            pack_rgb_batch_to_i420_np)

        sharding = NamedSharding(mesh, P("data"))

    def pack(item):
        if upload_format != "i420":
            return item
        return jax.tree.map(
            lambda x: pack_rgb_batch_to_i420_np(x)
            if (getattr(x, "ndim", 0) == 4
                and getattr(x, "dtype", None) == np.uint8) else x, item)

    def put(item):
        item = pack(item)
        if multiprocess:
            # Each process contributes its local slice of the global batch
            # (one shared implementation of the batch-assembly convention).
            from denoising_diffusion_deep_fake_tpu.parallel.distributed import (
                global_batch_from_local)

            return global_batch_from_local(item, sharding)
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding)
            if getattr(x, "ndim", 0) >= 3 else x, item)

    q: _queue.Queue = _queue.Queue(maxsize=depth)
    stop = threading.Event()

    def blocking_put(item) -> bool:
        """put() that gives up when the consumer abandoned the generator."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except _queue.Full:
                continue
        return False

    def worker():
        try:
            for item in iterator:
                if stop.is_set() or not blocking_put(put(item)):
                    return
            blocking_put(None)
        except BaseException as e:
            blocking_put(e)

    thread = threading.Thread(target=worker, daemon=True)
    thread.start()
    # The finally block runs on normal exhaustion AND on GeneratorExit (the
    # consumer breaking out of its for-loop, e.g. max_steps): without it the
    # worker stays blocked in q.put forever and dies mid-device-transfer at
    # interpreter teardown ("FATAL: exception not rethrown" aborts).
    try:
        while True:
            item = q.get()
            if item is None:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        thread.join(timeout=10.0)
        if thread.is_alive():
            # Mid device_put on a slow link: re-join at atexit before
            # finalization pthread_exits it inside PJRT frames (aborts).
            from denoising_diffusion_deep_fake_tpu.utils import stragglers
            stragglers.adopt(thread)
