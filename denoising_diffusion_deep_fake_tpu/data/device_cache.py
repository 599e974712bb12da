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

Single-process only (each process would otherwise need the mesh-global
batch; host loading already shards per process). With >1 local device the
dataset array is replicated per device — worth it only while
``n_devices * dataset_bytes`` fits HBM; the loader path remains the default.
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
        if jax.process_count() > 1:
            raise ValueError(
                "data_cache='device' is single-process; multi-process runs "
                "shard the manifest per host (data_cache='host')")
        n = len(loader.paths)
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
        # Replicate over the mesh (multi-device DP holds one copy per device
        # so each shard's gather is local; the per-step batch is then
        # sharding-constrained onto the 'data' axis — training/cached.py).
        self._sharding = None
        if mesh is not None and mesh.size > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            self._sharding = NamedSharding(mesh, PartitionSpec())
        # Decode everything once, BYPASSING the loader's RAM cache: the HBM
        # copy replaces it, and filling the store would pin a second full
        # copy in host RAM for the run's lifetime (only _epoch_order — pure
        # index math — is used after upload). Reuse already-decoded rows if
        # the store happens to be full.
        if loader._cache_enabled and bool(loader._cache_valid.all()):
            images = loader._cache_store
        else:
            images = loader._decode_batch(np.arange(n))
        self.dataset = jax.device_put(np.ascontiguousarray(images),
                                      self._sharding)

    @property
    def steps_per_epoch(self) -> int:
        # Whole batches ONLY, regardless of the loader's drop_remainder: the
        # epoch order is trimmed to whole batches, and a partial-batch step
        # would silently re-train a clamped overlap slice.
        return self.n_images // self.batch_size

    def order_for_epoch(self, epoch: int) -> jax.Array:
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
