"""Host-side image loading with background prefetch.

Replaces the reference's ``ImageDataset`` + 8-worker torch ``DataLoader``
(`/root/reference/d3f/dataset/image_dataset.py:8-44`,
`d3f/train_deep_fake/lit_module.py:90-95`) with a TPU-first split of work:

* host does the minimum — JPEG decode, optional resize to the static shape,
  batch assembly as **uint8** NHWC (4x fewer PCIe/tunnel bytes than float32),
* normalization and augmentation happen on-device inside the jitted train step
  (see ``ops/augment.py``) per the BASELINE north star,
* a background thread keeps a small queue of ready batches so decode overlaps
  device compute,
* shuffling is seeded per epoch (reproducible, unlike torch's global-RNG
  ``shuffle=True``).

The decode hook is pluggable (``decode_fn``) so the native C++ decoder can be
swapped in without touching callers.
"""

from __future__ import annotations

import queue
import threading
from pathlib import Path
from typing import Callable

import numpy as np

from denoising_diffusion_deep_fake_tpu.data.manifest import read_image_manifest


def default_decode(path: str) -> np.ndarray:
    """JPEG/PNG -> RGB uint8 HWC (cv2 is BGR on disk, like the reference)."""
    import cv2

    image = cv2.imread(path)
    if image is None:
        raise IOError(f"failed to decode image: {path}")
    return cv2.cvtColor(image, cv2.COLOR_BGR2RGB)


def _resize_if_needed(image: np.ndarray, size: int) -> np.ndarray:
    if image.shape[0] == size and image.shape[1] == size:
        return image
    import cv2

    # Cubic, like the dataset-prep tool's resize
    # (video_to_center_cropped_images.py cubic resize; SURVEY.md §2 #14).
    return cv2.resize(image, (size, size), interpolation=cv2.INTER_CUBIC)


class ImageLoader:
    """Iterates epochs of (uint8 NHWC batch, index vector) with prefetch."""

    def __init__(self, manifest_path, batch_size: int, *,
                 image_size: int | None = None, shuffle: bool = True,
                 seed: int = 0, drop_remainder: bool = True,
                 prefetch_batches: int = 2,
                 decode_fn: Callable[[str], np.ndarray] | None = None,
                 use_native: bool = True, native_threads: int = 4,
                 class_balanced: bool = False,
                 shard: tuple[int, int] | None = None,
                 cache: bool | str = "auto",
                 cache_limit_bytes: int = 2 << 30):
        from denoising_diffusion_deep_fake_tpu.data.manifest import (
            read_image_manifest_with_classes)

        self.manifest_path = Path(manifest_path)
        paths, classes = read_image_manifest_with_classes(manifest_path)
        self.paths = [str(p) for p in paths]
        self.classes = classes
        if shard is not None:
            # Multi-process data parallelism: each process keeps a strided
            # slice of the manifest (parallel/distributed.py's data_shard()),
            # truncated to the same length on every process — unequal shards
            # would give processes different batches_per_epoch, and the one
            # with more batches would dispatch a collective step its peers
            # never join (deadlock). Drops at most shard_num-1 images/epoch.
            shard_idx, shard_num = shard
            per_shard = len(self.paths) // shard_num
            if per_shard == 0:
                raise ValueError(
                    f"manifest {manifest_path} has {len(self.paths)} images "
                    f"for {shard_num} processes — every process needs one")
            self.paths = self.paths[shard_idx::shard_num][:per_shard]
            if self.classes is not None:
                self.classes = list(
                    self.classes)[shard_idx::shard_num][:per_shard]
        self.class_balanced = class_balanced
        if class_balanced and classes is None:
            raise ValueError(
                "class_balanced=True needs a difficulty-classed manifest "
                "(run `d3f-tpu balance` to produce one)")
        if not self.paths:
            raise ValueError(f"empty image manifest: {manifest_path}")
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_remainder = drop_remainder
        self.prefetch_batches = prefetch_batches
        self.decode_fn = decode_fn or default_decode
        if image_size is None:
            probe = self.decode_fn(self.paths[0])
            if probe.shape[0] != probe.shape[1]:
                raise ValueError(
                    "image_size not set and first image is not square "
                    f"({probe.shape}); set image_size in the config")
            image_size = probe.shape[0]
        self.image_size = image_size

        # Prefer the native C++ batch loader (decode + crop/resize + batch
        # assembly with a thread pool, data/native_loader.py) unless the
        # caller supplied a custom decode_fn or the library is unavailable.
        self.load_batch_fn = None
        if use_native and decode_fn is None:
            from denoising_diffusion_deep_fake_tpu.data import native_loader

            if native_loader.available():
                self.load_batch_fn = native_loader.NativeBatchSource(
                    image_size, n_threads=native_threads)

        # Decoded-image RAM cache (the tf.data ``.cache()`` analogue): each
        # image is decoded at most once; later epochs are a fancy-index copy.
        # Training-throughput ceilings of thousands of imgs/sec can't be fed
        # by per-epoch JPEG decode on a small host, and face datasets
        # (thousands of fixed-size crops) usually fit in RAM. ``"auto"``
        # enables it when the decoded dataset fits ``cache_limit_bytes``.
        n_bytes = len(self.paths) * self.image_size * self.image_size * 3
        self._cache_enabled = (cache is True or
                               (cache == "auto" and n_bytes <= cache_limit_bytes))
        if self._cache_enabled:
            self._cache_store = np.empty(
                (len(self.paths), self.image_size, self.image_size, 3),
                dtype=np.uint8)
            self._cache_valid = np.zeros(len(self.paths), dtype=bool)

    def __len__(self) -> int:
        return len(self.paths)

    @property
    def batches_per_epoch(self) -> int:
        n = len(self.paths) // self.batch_size
        if not self.drop_remainder and len(self.paths) % self.batch_size:
            n += 1
        return n

    def _epoch_order(self, epoch: int) -> np.ndarray:
        rng = np.random.default_rng(self.seed * 100_003 + epoch)
        if self.class_balanced and self.classes is not None:
            # Uniform-over-classes sampling (with replacement inside small
            # classes): the consumer side of the balancer's difficulty
            # manifest — hard and easy images appear equally often.
            classes = np.asarray(self.classes)
            unique = np.unique(classes)
            members = {c: np.flatnonzero(classes == c) for c in unique}
            draws_c = rng.choice(unique, size=len(self.paths))
            order = np.asarray([rng.choice(members[c]) for c in draws_c])
            return order
        order = np.arange(len(self.paths))
        if self.shuffle:
            rng.shuffle(order)
        return order

    def _decode_batch(self, indices: np.ndarray) -> np.ndarray:
        size = self.image_size
        if self.load_batch_fn is not None:
            return self.load_batch_fn([self.paths[i] for i in indices])
        batch = np.empty((len(indices), size, size, 3), dtype=np.uint8)
        for row, idx in enumerate(indices):
            batch[row] = _resize_if_needed(self.decode_fn(self.paths[idx]), size)
        return batch

    def _load_batch(self, indices: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        if not self._cache_enabled:
            return self._decode_batch(indices), indices.astype(np.int32)
        missing = indices[~self._cache_valid[indices]]
        if missing.size:
            missing = np.unique(missing)
            self._cache_store[missing] = self._decode_batch(missing)
            self._cache_valid[missing] = True
        return self._cache_store[indices], indices.astype(np.int32)

    def epoch(self, epoch: int):
        """Yield this epoch's batches, decoding ahead on a worker thread."""
        order = self._epoch_order(epoch)
        if self.drop_remainder:
            order = order[:len(order) - len(order) % self.batch_size]
        chunks = [order[i:i + self.batch_size]
                  for i in range(0, len(order), self.batch_size)]

        q: queue.Queue = queue.Queue(maxsize=self.prefetch_batches)
        stop = threading.Event()

        def producer():
            try:
                for chunk in chunks:
                    if stop.is_set():
                        return
                    q.put(self._load_batch(chunk))
                q.put(None)
            except BaseException as e:  # surface decode errors to the consumer
                q.put(e)

        worker = threading.Thread(target=producer, daemon=True)
        worker.start()
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


class PairedLoader:
    """Zips two identity loaders (deep-fake's ``{"a","b"}`` dual stream,
    `d3f/train_deep_fake/lit_module.py:72-78`). Epoch length is the shorter
    loader's, matching Lightning's dict-of-dataloaders semantics."""

    def __init__(self, loader_a: ImageLoader, loader_b: ImageLoader):
        if loader_a.image_size != loader_b.image_size:
            raise ValueError("identity datasets must share image_size")
        self.a = loader_a
        self.b = loader_b
        self.image_size = loader_a.image_size

    @property
    def batches_per_epoch(self) -> int:
        return min(self.a.batches_per_epoch, self.b.batches_per_epoch)

    def epoch(self, epoch: int):
        for (batch_a, idx_a), (batch_b, idx_b) in zip(self.a.epoch(epoch),
                                                      self.b.epoch(epoch)):
            yield (batch_a, idx_a), (batch_b, idx_b)
