"""HBM-resident dataset cache: batches gathered on-device inside the step.

The reference feeds every step from 8 CPU dataloader workers over PCIe
(`/root/reference/d3f/train_deep_fake/lit_module.py:90-95`). The TPU-native
observation: its datasets are a few thousand fixed-size face crops — small
enough to live in HBM whole (10k 448² uint8 frames ~= 6 GB of 16 GB). With
``data_cache: device`` the decoded uint8 dataset is uploaded ONCE, each
epoch uploads one tiny int32 permutation (the SAME seeded order the host
loader would use, so shuffle/class-balance semantics are unchanged), and the
jitted train step gathers its batch with ``jnp.take`` — zero per-step
host->device image bytes. On transfer-limited hosts this removes the e2e
bottleneck entirely (BASELINE.md r2: 448² swap uploads ~19.3 MB/step over a
~26 MB/s tunnel, a 5.4x e2e gap vs the bare step).

Layouts:

* **single-process** (any local device count): the dataset is REPLICATED per
  device and each step's gathered batch is sharding-constrained onto the
  'data' axis — exact host-loader shuffle semantics (pinned-loss equality,
  tests/test_device_cache.py). Worth it while ``n_devices * dataset_bytes``
  fits HBM.
* **multi-process**: each process decodes ITS manifest shard (the same shard
  the host loader would stream) and pins it SHARDED over its local devices —
  the global dataset array is axis-0-sharded over the whole 'data' axis, so
  HBM cost is ``dataset_bytes / n_devices`` and every per-step gather is
  device-LOCAL (a ``shard_map`` take; no cross-device collective). Shuffle
  semantics follow the host multi-process design one level down: the host
  path pins a fixed manifest shard per PROCESS and shuffles within it; the
  sharded cache pins a fixed sub-shard per DEVICE and shuffles within it
  (per-device seeded permutations per epoch). DP gradient averaging sees
  every image each epoch either way.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.data.loader import ImageLoader


class DeviceDatasetCache:
    """Decodes an ``ImageLoader``'s full dataset and pins it in device memory.

    ``order_for_epoch(epoch)`` reproduces the loader's seeded permutation
    (shuffle / class-balanced draws included) trimmed to whole batches, as a
    device int32 vector; the cached train step slices it at
    ``(step % steps_per_epoch) * batch_size``.
    """

    def __init__(self, loader: ImageLoader, *, limit_bytes: int = 8 << 30,
                 mesh=None):
        n = len(loader.paths)
        self.sharded = jax.process_count() > 1
        if self.sharded and mesh is None:
            raise ValueError("multi-process device cache needs the mesh")
        nbytes = n * loader.image_size * loader.image_size * 3
        if nbytes > limit_bytes:
            raise ValueError(
                f"dataset is {nbytes / 1e9:.2f} GB decoded — over the "
                f"device_cache_limit_bytes ({limit_bytes / 1e9:.2f} GB); "
                "use data_cache='host' or raise the limit")
        if n < loader.batch_size:
            raise ValueError(f"dataset ({n} images) smaller than one batch "
                             f"({loader.batch_size})")
        self.loader = loader
        self.batch_size = loader.batch_size
        self.n_images = n
        self.mesh = mesh
        # Decode everything once, BYPASSING the loader's RAM cache: the HBM
        # copy replaces it, and filling the store would pin a second full
        # copy in host RAM for the run's lifetime (only _epoch_order — pure
        # index math — is used after upload). Reuse already-decoded rows if
        # the store happens to be full.
        if loader._cache_enabled and bool(loader._cache_valid.all()):
            images = loader._cache_store
        else:
            images = loader._decode_batch(np.arange(n))
        images = np.ascontiguousarray(images)
        if self.sharded:
            self._init_sharded(images)
            return
        # Single-process: replicate over the mesh (multi-device DP holds one
        # copy per device so each shard's gather is local; the per-step batch
        # is sharding-constrained onto the 'data' axis — training/cached.py).
        self._sharding = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding = NamedSharding(mesh, PartitionSpec())
        self.dataset = jax.device_put(images, self._sharding)

    # --------------------------------------------------- multi-process mode

    def _init_sharded(self, local_images: np.ndarray) -> None:
        """Pin this process's shard axis-0-sharded over the global data axis.

        ``local_images`` are THIS process's manifest-shard rows (the loader
        is already process-sharded in multi-process runs). Rows are trimmed
        so every device holds the same count and each epoch is whole
        per-device batches (mirrors the host loader's equal-shard rule).
        """
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = self.mesh
        n_data = mesh.shape.get("data", mesh.size)
        if mesh.size != n_data:
            raise ValueError(
                "data_cache='device' supports the data axis only "
                f"(mesh {dict(mesh.shape)})")
        n_local_devices = n_data // jax.process_count()
        # NOTE: self.batch_size is the process-LOCAL batch (the loader's);
        # rows/device/step = local_batch / local_devices = global / n_data.
        if self.batch_size % n_local_devices:
            raise ValueError(
                f"local batch {self.batch_size} must divide over "
                f"{n_local_devices} local data devices")
        self._rows_per_dev_batch = self.batch_size // n_local_devices
        n_local = local_images.shape[0]
        per_dev = n_local // n_local_devices
        spe = per_dev // self._rows_per_dev_batch
        if spe < 1:
            raise ValueError(
                f"{n_local} local images over {n_local_devices} local "
                f"devices leave {per_dev} rows/device — under one "
                f"per-device batch ({self._rows_per_dev_batch})")
        self._per_dev_images = per_dev
        self._sharded_spe = spe
        self._img_sharding = NamedSharding(mesh, PartitionSpec("data"))
        usable = per_dev * n_local_devices
        self.dataset = jax.make_array_from_process_local_data(
            self._img_sharding, local_images[:usable])
        self._vec_sharding = NamedSharding(mesh, PartitionSpec("data"))
        self._n_local_devices = n_local_devices

    @property
    def steps_per_epoch(self) -> int:
        # Whole batches ONLY, regardless of the loader's drop_remainder: the
        # epoch order is trimmed to whole batches, and a partial-batch step
        # would silently re-train a clamped overlap slice.
        if self.sharded:
            return self._sharded_spe
        return self.n_images // self.batch_size

    def order_for_epoch(self, epoch: int) -> jax.Array:
        if self.sharded:
            # Per-DEVICE seeded permutation of that device's fixed sub-shard
            # (LOCAL indices — the shard_map gather indexes its own block).
            seed = getattr(self.loader, "seed", 0) or 0
            usable = self._sharded_spe * self._rows_per_dev_batch
            blocks = []
            base = jax.process_index() * self._n_local_devices
            for j in range(self._n_local_devices):
                rng = np.random.default_rng((seed, epoch, base + j))
                blocks.append(
                    rng.permutation(self._per_dev_images)[:usable])
            local = np.concatenate(blocks).astype(np.int32)
            return jax.make_array_from_process_local_data(
                self._vec_sharding, local)
        order = self.loader._epoch_order(epoch)
        usable = len(order) - len(order) % self.batch_size
        return jax.device_put(order[:usable].astype(np.int32),
                              self._sharding)


def gather_batch(dataset: jax.Array, order: jax.Array, step: jax.Array,
                 batch_size: int, steps_per_epoch: int) -> jax.Array:
    """In-jit batch assembly: ``dataset[order[pos : pos+B]]``.

    ``step`` is the GLOBAL step counter carried in the train state; the
    position wraps per epoch, matching the host loop (the runner uploads the
    matching epoch's ``order`` before each epoch).
    """
    pos = (step % steps_per_epoch) * batch_size
    idx = jax.lax.dynamic_slice(order, (pos.astype(jnp.int32),),
                                (batch_size,))
    return jnp.take(dataset, idx, axis=0)


def gather_batch_sharded(dataset: jax.Array, order: jax.Array,
                         step: jax.Array, batch_size: int,
                         steps_per_epoch: int, mesh) -> jax.Array:
    """Shard-local in-jit gather for the multi-process (axis-0-sharded)
    cache: every device takes its per-device batch rows from ITS dataset
    block with LOCAL indices — no cross-device collective, the batch comes
    out already sharded on the 'data' axis.
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    rows = batch_size // mesh.shape["data"]

    def local_take(ds, idx_vec, step_scalar):
        pos = (step_scalar % steps_per_epoch) * rows
        idx = jax.lax.dynamic_slice(idx_vec, (pos.astype(jnp.int32),),
                                    (rows,))
        return jnp.take(ds, idx, axis=0)

    return shard_map(local_take, mesh,
                     in_specs=(P("data"), P("data"), P()),
                     out_specs=P("data"))(dataset, order,
                                          jnp.asarray(step, jnp.int32))
