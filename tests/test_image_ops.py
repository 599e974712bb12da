"""Image op tests: normalization round-trip, grid geometry, center crop."""

import numpy as np
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.ops.image import (
    center_crop,
    center_crop_box,
    denormalise_to_uint8_rgb,
    grid_to_display,
    make_grid,
    normalise_uint8_rgb,
)

MEAN = [0.5, 0.5, 0.5]
STD = [0.5, 0.5, 0.5]


def test_normalise_round_trip(rng):
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    t = normalise_uint8_rgb(jnp.asarray(img), MEAN, STD)
    back = np.asarray(denormalise_to_uint8_rgb(t, MEAN, STD))
    np.testing.assert_array_equal(back, img)


def test_normalise_range():
    img = jnp.asarray(np.array([[[0, 128, 255]]], dtype=np.uint8))
    t = np.asarray(normalise_uint8_rgb(img, MEAN, STD))
    np.testing.assert_allclose(t[0, 0], [-1.0, 0.0039215, 1.0], atol=1e-4)


def test_denormalise_truncates_then_clamps():
    # Reference casts int() (truncation) before clamping (lit_module.py:293-294).
    t = jnp.asarray(np.array([[[1.9, -3.0, 0.999]]], dtype=np.float32))
    out = np.asarray(denormalise_to_uint8_rgb(t, MEAN, STD))
    # 1.9 -> 0.5*255*1.9+127.5 = 369.75 -> trunc 369 -> clamp 255
    # -3.0 -> -255 -> clamp 0 ; 0.999 -> 254.87 -> trunc 254
    np.testing.assert_array_equal(out[0, 0], [255, 0, 254])


def test_make_grid_geometry(rng):
    batch = jnp.asarray(rng.random((9, 8, 8, 3)).astype(np.float32))
    grid = np.asarray(make_grid(batch, nrow=3))
    # 3 rows x 3 cols of 8px cells with 2px padding: 3*(8+2)+2 = 32.
    assert grid.shape == (32, 32, 3)
    # First image lands at [2:10, 2:10].
    np.testing.assert_allclose(grid[2:10, 2:10], np.asarray(batch[0]))
    # Padding pixels are pad_value (0).
    assert grid[0].max() == 0.0


def test_grid_to_display_denorms_and_clamps():
    batch = jnp.full((9, 4, 4, 3), 3.0)
    disp = np.asarray(grid_to_display(batch))
    assert disp.max() <= 1.0 and disp.min() >= 0.0
    np.testing.assert_allclose(disp[2:6, 2:6], 1.0)


def test_center_crop_wide_and_tall():
    # Wide 100x50 to square -> crop x to [25, 75].
    assert center_crop_box(50, 100, 1, 1) == (0, 50, 25, 75)
    # Tall 50x100 to square -> crop y to [25, 75].
    assert center_crop_box(100, 50, 1, 1) == (25, 75, 0, 50)
    img = np.arange(100 * 50 * 3).reshape(50, 100, 3)
    out = center_crop(img, 1, 1)
    assert out.shape == (50, 50, 3)
    np.testing.assert_array_equal(out, img[:, 25:75])


class TestI420:
    """Device I420 pack/unpack matches OpenCV's converters (the host side
    of the half-bytes video transfer mode)."""

    def _rgb(self, rng, h=16, w=16):
        # Smooth-ish field: chroma subsampling error stays small, as on
        # real frames.
        import cv2

        small = rng.integers(0, 256, (h // 4, w // 4, 3), dtype=np.uint8)
        return cv2.resize(small, (w, h), interpolation=cv2.INTER_LINEAR)

    def test_rgb_to_i420_matches_cv2(self, rng):
        import cv2

        from denoising_diffusion_deep_fake_tpu.ops.image import rgb_to_i420

        rgb = self._rgb(rng)
        want = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2YUV_I420)
        got = np.asarray(rgb_to_i420(jnp.asarray(rgb[None])))[0]
        assert got.shape == want.shape
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    def test_i420_to_rgb_matches_cv2(self, rng):
        import cv2

        from denoising_diffusion_deep_fake_tpu.ops.image import i420_to_rgb

        rgb = self._rgb(rng)
        i420 = cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2YUV_I420)
        want = cv2.cvtColor(i420, cv2.COLOR_YUV2BGR_I420)[..., ::-1]
        got = np.asarray(i420_to_rgb(jnp.asarray(i420[None])))[0]
        assert np.abs(got - want.astype(np.float32)).max() <= 2.0

    def test_round_trip_matches_cv2_round_trip(self, rng):
        """Pack+unpack loses exactly what cv2's own 4:2:0 round trip loses
        (chroma subsampling — the same loss the mp4 encoder applies), no
        more: the device wire format is drop-in for the cv2 host side."""
        import cv2

        from denoising_diffusion_deep_fake_tpu.ops.image import (
            i420_to_rgb, rgb_to_i420)

        rgb = self._rgb(rng, 32, 32)
        rt = np.asarray(i420_to_rgb(rgb_to_i420(
            jnp.asarray(rgb[None].astype(np.float32)))))[0]
        cv_rt = cv2.cvtColor(
            cv2.cvtColor(rgb[..., ::-1].copy(), cv2.COLOR_BGR2YUV_I420),
            cv2.COLOR_YUV2BGR_I420)[..., ::-1].astype(np.float32)
        assert np.abs(rt - cv_rt).mean() < 1.0
        # Luma itself round-trips tightly (all loss is in chroma).
        y_rt = 0.257 * rt[..., 0] + 0.504 * rt[..., 1] + 0.098 * rt[..., 2]
        y_in = (0.257 * rgb[..., 0] + 0.504 * rgb[..., 1]
                + 0.098 * rgb[..., 2])
        assert np.abs(y_rt - y_in).mean() < 1.5


def test_panel_grid_u8_matches_writer_quantization(rng):
    """Device-built uint8 panels == the old path's pixels: grid_to_display
    then tensorboardX's own float->uint8 truncation ((x*255).astype)."""
    from denoising_diffusion_deep_fake_tpu.ops.image import panel_grid_u8

    batch = jnp.asarray(rng.random((12, 8, 8, 3)).astype(np.float32) * 2 - 1)
    got = np.asarray(panel_grid_u8(batch))
    want = (np.asarray(grid_to_display(batch)) * 255.0).astype(np.uint8)
    assert got.dtype == np.uint8 and got.shape == want.shape
    np.testing.assert_array_equal(got, want)
