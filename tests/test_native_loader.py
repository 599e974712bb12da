"""Native C++ loader tests: decode parity vs cv2, batch API, error paths."""

import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.data import native_loader

from helpers import make_image_dataset

pytestmark = pytest.mark.skipif(not native_loader.available(),
                                reason="native library unavailable")

cv2 = pytest.importorskip("cv2")


def _write_jpeg(path, img):
    assert cv2.imwrite(str(path), cv2.cvtColor(img, cv2.COLOR_RGB2BGR),
                       [cv2.IMWRITE_JPEG_QUALITY, 95])


def test_png_decode_exact(tmp_path, rng):
    img = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    cv2.imwrite(str(p), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out = native_loader.decode_image(p, 24)
    np.testing.assert_array_equal(out, img)  # lossless + no resize


def test_jpeg_decode_close_to_cv2(tmp_path, rng):
    img = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = tmp_path / "x.jpg"
    _write_jpeg(p, img)
    ours = native_loader.decode_image(p, 32).astype(np.int16)
    ref = cv2.cvtColor(cv2.imread(str(p)), cv2.COLOR_BGR2RGB).astype(np.int16)
    # Different IDCT implementations may differ by a couple of levels.
    assert np.abs(ours - ref).max() <= 3
    assert np.abs(ours - ref).mean() < 1.0


def test_image_dims(tmp_path, rng):
    img = rng.integers(0, 256, (20, 36, 3), dtype=np.uint8)
    p = tmp_path / "wide.png"
    cv2.imwrite(str(p), img)
    assert native_loader.image_dims(p) == (36, 20)


def test_center_crop_resize(tmp_path):
    # Wide gradient image: native center-crops square before resizing.
    img = np.zeros((20, 40, 3), np.uint8)
    img[:, 10:30] = 255  # center band = crop region
    p = tmp_path / "band.png"
    cv2.imwrite(str(p), img)
    out = native_loader.decode_image(p, 10)
    assert out.shape == (10, 10, 3)
    assert out.mean() > 250  # crop kept the white center band


def test_load_batch_matches_single(tmp_path, rng):
    manifest = make_image_dataset(tmp_path, n=6, size=16, seed=3)
    from denoising_diffusion_deep_fake_tpu.data import read_image_manifest

    paths = [str(p) for p in read_image_manifest(manifest)]
    batch = native_loader.load_batch(paths, 16, n_threads=3)
    assert batch.shape == (6, 16, 16, 3)
    for i, p in enumerate(paths):
        np.testing.assert_array_equal(batch[i], native_loader.decode_image(p, 16))


def test_batch_error_reports_failing_path(tmp_path, rng):
    manifest = make_image_dataset(tmp_path, n=3, size=8, seed=1)
    from denoising_diffusion_deep_fake_tpu.data import read_image_manifest

    paths = [str(p) for p in read_image_manifest(manifest)]
    paths[1] = str(tmp_path / "missing.png")
    with pytest.raises(IOError, match="missing.png"):
        native_loader.load_batch(paths, 8)


def test_image_loader_uses_native_path(tmp_path):
    from denoising_diffusion_deep_fake_tpu.data import ImageLoader

    manifest = make_image_dataset(tmp_path, n=4, size=16, seed=2)
    loader = ImageLoader(manifest, batch_size=2, shuffle=False)
    assert loader.load_batch_fn is not None  # native engaged
    batch, idx = next(iter(loader.epoch(0)))
    assert batch.shape == (2, 16, 16, 3)
    # Pixel parity with the cv2 fallback path (PNGs are lossless).
    fallback = ImageLoader(manifest, batch_size=2, shuffle=False,
                           use_native=False)
    batch_cv, _ = next(iter(fallback.epoch(0)))
    np.testing.assert_array_equal(batch, batch_cv)
