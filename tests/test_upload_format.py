"""I420 training uploads (`upload_format: i420`, VERDICT r2 item 3).

Training batches ship 4:2:0-packed (half the host->device bytes) and are
unpacked to RGB on-device at the top of each train step. These tests bound
the chroma error, pin the config validation, and run the real runner path
end to end with packed uploads.
"""

import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.config import (
    DenoiserConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.ops.image import (
    i420_to_rgb,
    pack_rgb_batch_to_i420_np,
    unpack_upload,
)

from helpers import make_image_dataset


def _smooth_batch(rng, b=2, size=32):
    """Smooth, face-crop-like images (chroma subsampling error is tiny on
    smooth content; random noise would overstate it)."""
    yy, xx = np.mgrid[0:size, 0:size] / size
    base = np.stack([yy, xx, (yy + xx) / 2], axis=-1)
    batch = []
    for _ in range(b):
        shift = rng.random(3)
        # Quarter-period over the crop: chroma varies by only a few counts
        # within each 2x2 subsample block, like real face-crop content.
        batch.append(255 * (0.5 + 0.4 * np.sin(2 * np.pi *
                                               (0.25 * base + shift))))
    return np.clip(np.asarray(batch), 0, 255).astype(np.uint8)


def test_i420_upload_roundtrip_error_bounded(rng):
    batch = _smooth_batch(rng)
    packed = pack_rgb_batch_to_i420_np(batch)
    assert packed.shape == (batch.shape[0], batch.shape[1] * 3 // 2,
                            batch.shape[2])
    assert packed.nbytes == batch.nbytes // 2  # the whole point
    back = np.asarray(unpack_upload(packed, "i420"))
    assert back.shape == batch.shape
    # BT.601 studio-swing quantization + 2x2 chroma subsampling on smooth
    # content: a few 8-bit counts of error, no more.
    err = np.abs(back - batch.astype(np.float32))
    assert err.mean() < 2.0
    assert err.max() < 24.0  # worst pixels sit on chroma-block edges


def test_unpack_upload_rgb_is_identity(rng):
    batch = rng.integers(0, 256, (2, 8, 8, 3)).astype(np.uint8)
    out = unpack_upload(batch, "rgb")
    assert out is batch


def test_cv2_packing_matches_device_unpack_closely(rng):
    """Host cv2 pack -> device unpack must agree with cv2's own decode."""
    cv2 = pytest.importorskip("cv2")
    batch = _smooth_batch(rng, b=1)
    packed = pack_rgb_batch_to_i420_np(batch)
    ours = np.asarray(i420_to_rgb(packed))[0]
    cv2_rgb = cv2.cvtColor(packed[0], cv2.COLOR_YUV2RGB_I420)
    assert np.abs(ours - cv2_rgb.astype(np.float32)).max() <= 2.0


def test_config_rejects_bad_upload_format_combinations():
    base = dict(input_image_list_path="x", batch_size=2)
    with pytest.raises(ValueError, match="upload_format"):
        config_from_dict(DenoiserConfig,
                         dict(base, upload_format="jpeg"))
    with pytest.raises(ValueError, match="spatial_parallel"):
        config_from_dict(DenoiserConfig,
                         dict(base, upload_format="i420", spatial_parallel=2,
                              image_size=32, batch_size=2, data_parallel=1))
    with pytest.raises(ValueError, match="image_size % 4"):
        config_from_dict(DenoiserConfig,
                         dict(base, upload_format="i420", image_size=30))


def test_i420_rejects_odd_frames():
    from denoising_diffusion_deep_fake_tpu.ops.image import rgb_to_i420

    with pytest.raises(ValueError, match="height % 4"):
        rgb_to_i420(np.zeros((1, 30, 32, 3), np.uint8))
    with pytest.raises(ValueError, match="width % 2"):
        rgb_to_i420(np.zeros((1, 32, 31, 3), np.uint8))


def test_fit_denoiser_with_i420_uploads(tmp_path, rng):
    """The REAL runner path with packed uploads: loss finite and close to an
    identical rgb-upload run (chroma error only)."""
    from denoising_diffusion_deep_fake_tpu.training.runners import fit_denoiser

    manifest = make_image_dataset(tmp_path, n=8, size=32)
    losses = {}
    for fmt in ("rgb", "i420"):
        cfg = config_from_dict(DenoiserConfig, dict(
            input_image_list_path=str(manifest), batch_size=4,
            learning_rate=1e-3, max_epochs=1, encoder_name="resnet18",
            compute_dtype="float32", image_size=32, upload_format=fmt,
            noise_exponential_sampling_lambda=3.0,
            log_dir=str(tmp_path / f"runs_{fmt}"),
            checkpoint_dir=str(tmp_path / f"ckpt_{fmt}")))
        seen = []
        _, _, ctx = fit_denoiser(cfg, max_steps=2, verbose=False,
                                 step_callback=lambda s, st, m: seen.append(
                                     float(m["loss"])))
        assert ctx.global_step == 2
        assert all(np.isfinite(v) for v in seen)
        losses[fmt] = seen
    # Same seed, same order; only the wire format differs. The normalized
    # inputs differ by subsampled chroma only, so per-step losses track.
    np.testing.assert_allclose(losses["i420"], losses["rgb"], rtol=0.1)
