"""Data layer tests: manifests, loader batching/shuffling/prefetch, pairing."""

import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.data import (
    ImageLoader,
    read_image_manifest,
    write_image_manifest,
)

from helpers import make_image_dataset


def test_manifest_round_trip(tmp_path):
    manifest = make_image_dataset(tmp_path, n=4, subdir="frames")
    paths = read_image_manifest(manifest)
    assert len(paths) == 4
    assert all(p.exists() for p in paths)
    # Relative resolution against the manifest's directory.
    assert paths[0].parent.name == "frames"


def test_manifest_write_with_difficulty(tmp_path):
    manifest = make_image_dataset(tmp_path, n=3)
    paths = read_image_manifest(manifest)
    out = tmp_path / "balanced" / "images.txt"
    write_image_manifest(out, paths, difficulty_classes=[2, 0, 1])
    lines = out.read_text().strip().split("\n")
    assert all("\t" in l for l in lines)
    assert lines[0].endswith("\t2")
    # Reader keeps only the path column and resolves it.
    back = read_image_manifest(out)
    assert [p.name for p in back] == [p.name for p in paths]
    assert all(p.exists() for p in back)


def test_loader_batches_uint8(tmp_path):
    manifest = make_image_dataset(tmp_path, n=10, size=16)
    loader = ImageLoader(manifest, batch_size=4, seed=1)
    assert loader.image_size == 16
    assert loader.batches_per_epoch == 2  # drop_remainder
    batches = list(loader.epoch(0))
    assert len(batches) == 2
    batch, idx = batches[0]
    assert batch.shape == (4, 16, 16, 3)
    assert batch.dtype == np.uint8
    assert idx.shape == (4,) and idx.dtype == np.int32


def test_loader_shuffles_per_epoch_deterministically(tmp_path):
    manifest = make_image_dataset(tmp_path, n=8, size=8)
    loader = ImageLoader(manifest, batch_size=8, seed=3)
    _, idx_e0 = next(iter(loader.epoch(0)))
    _, idx_e0_again = next(iter(loader.epoch(0)))
    _, idx_e1 = next(iter(loader.epoch(1)))
    np.testing.assert_array_equal(idx_e0, idx_e0_again)  # reproducible
    assert not np.array_equal(idx_e0, idx_e1)            # varies per epoch
    assert sorted(idx_e0) == list(range(8))              # a permutation


def test_loader_resizes_mismatched_images(tmp_path):
    manifest = make_image_dataset(tmp_path, n=4, size=24)
    loader = ImageLoader(manifest, batch_size=2, image_size=16)
    batch, _ = next(iter(loader.epoch(0)))
    assert batch.shape == (2, 16, 16, 3)


def test_loader_decode_error_propagates(tmp_path):
    manifest = make_image_dataset(tmp_path, n=3, size=8)
    # Corrupt one file.
    paths = read_image_manifest(manifest)
    paths[1].write_bytes(b"not an image")
    loader = ImageLoader(manifest, batch_size=3, shuffle=False)
    with pytest.raises(IOError):
        list(loader.epoch(0))


def test_empty_manifest_raises(tmp_path):
    m = tmp_path / "images.txt"
    m.write_text("")
    with pytest.raises(ValueError, match="empty"):
        ImageLoader(m, batch_size=1)


def test_paired_loader(tmp_path):
    m_a = make_image_dataset(tmp_path / "a", n=6, size=8, seed=1)
    m_b = make_image_dataset(tmp_path / "b", n=4, size=8, seed=2)
    from denoising_diffusion_deep_fake_tpu.data.loader import PairedLoader

    pair = PairedLoader(ImageLoader(m_a, 2), ImageLoader(m_b, 2))
    batches = list(pair.epoch(0))
    assert len(batches) == 2  # min of the two epoch lengths
    (ba, ia), (bb, ib) = batches[0]
    assert ba.shape == bb.shape == (2, 8, 8, 3)


def test_class_balanced_sampling(tmp_path):
    # 9 images: 6 in class 0, 2 in class 1, 1 in class 2 -> balanced epochs
    # draw each class ~uniformly.
    manifest = make_image_dataset(tmp_path, n=9, size=8)
    from denoising_diffusion_deep_fake_tpu.data import (
        read_image_manifest, write_image_manifest)

    paths = read_image_manifest(manifest)
    classes = [0, 0, 0, 0, 0, 0, 1, 1, 2]
    balanced = tmp_path / "bal" / "images.txt"
    write_image_manifest(balanced, paths, classes)

    loader = ImageLoader(balanced, batch_size=3, class_balanced=True, seed=0)
    counts = np.zeros(3)
    for epoch in range(40):
        for _, idx in loader.epoch(epoch):
            for i in idx:
                counts[classes[i]] += 1
    frac = counts / counts.sum()
    np.testing.assert_allclose(frac, 1 / 3, atol=0.05)


def test_class_balanced_requires_classed_manifest(tmp_path):
    manifest = make_image_dataset(tmp_path, n=4, size=8)
    with pytest.raises(ValueError, match="difficulty-classed"):
        ImageLoader(manifest, batch_size=2, class_balanced=True)


def test_loader_ram_cache_decodes_once(tmp_path):
    """Cached epochs return identical batches while decoding each image once."""
    from helpers import make_image_dataset

    manifest = make_image_dataset(tmp_path, n=6, size=16, seed=0)
    calls = []

    def counting_decode(path):
        calls.append(path)
        from denoising_diffusion_deep_fake_tpu.data.loader import (
            default_decode)
        return default_decode(path)

    loader = ImageLoader(manifest, 3, shuffle=False, seed=0, image_size=16,
                         decode_fn=counting_decode, cache=True)
    epoch0 = [b for b, _ in loader.epoch(0)]
    n_after_first = len(calls)
    assert n_after_first == 6
    epoch1 = [b for b, _ in loader.epoch(1)]
    assert len(calls) == n_after_first  # second epoch fully served from RAM
    for a, b in zip(epoch0, epoch1):
        np.testing.assert_array_equal(a, b)


def test_loader_cache_auto_disables_over_limit(tmp_path):
    from helpers import make_image_dataset

    manifest = make_image_dataset(tmp_path, n=4, size=16, seed=0)
    big = ImageLoader(manifest, 2, cache="auto", cache_limit_bytes=10)
    small = ImageLoader(manifest, 2, cache="auto")
    assert not big._cache_enabled
    assert small._cache_enabled
