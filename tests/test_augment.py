"""On-device augmentation tests: identity, exact shifts, flips, ranges."""

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    affine_warp,
    augment_batch,
    normalise_batch,
    sample_affine_params,
)


def _params(b, angle=0.0, scale=1.0, tx=0.0, ty=0.0, apply=True):
    return {
        "angle": jnp.full((b,), angle, jnp.float32),
        "scale": jnp.full((b,), scale, jnp.float32),
        "tx": jnp.full((b,), tx, jnp.float32),
        "ty": jnp.full((b,), ty, jnp.float32),
        "apply": jnp.full((b,), apply, bool),
    }


def test_identity_when_not_applied(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    out = affine_warp(x, _params(2, angle=33.0, scale=1.7, tx=0.4, apply=False))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_identity_params_roundtrip(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    out = affine_warp(x, _params(1))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_integer_pixel_shift(rng):
    # tx = 0.25 of W=8 -> shift content right by exactly 2 px, zero border.
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    out = np.asarray(affine_warp(x, _params(1, tx=0.25)))
    np.testing.assert_allclose(out[0, :, 2:], np.asarray(x)[0, :, :-2],
                               atol=1e-5)
    np.testing.assert_allclose(out[0, :, :2], 0.0, atol=1e-6)


def test_vertical_shift(rng):
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    out = np.asarray(affine_warp(x, _params(1, ty=-0.25)))
    np.testing.assert_allclose(out[0, :-2], np.asarray(x)[0, 2:], atol=1e-5)
    np.testing.assert_allclose(out[0, -2:], 0.0, atol=1e-6)


def test_rotation_180_is_flip(rng):
    # 180° about center (W/2, H/2) maps dst (x,y) -> src (W-x, H-y); for the
    # interior that's a flip shifted by one pixel; the x=0/y=0 border is out
    # of range (zeros).
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    out = np.asarray(affine_warp(x, _params(1, angle=180.0)))
    flipped = np.asarray(x)[0, ::-1, ::-1]
    np.testing.assert_allclose(out[0, 1:, 1:], flipped[:-1, :-1], atol=1e-4)
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)


def test_per_sample_independence(rng):
    x = jnp.asarray(rng.random((2, 8, 8, 3)).astype(np.float32))
    p = _params(2, tx=0.25)
    p["apply"] = jnp.asarray([True, False])
    out = np.asarray(affine_warp(x, p))
    np.testing.assert_allclose(out[1], np.asarray(x)[1], atol=1e-6)
    assert not np.allclose(out[0], np.asarray(x)[0])


def test_sample_affine_params_ranges():
    cfg = AffineAugmentConfig.shift_scale_rotate()
    p = sample_affine_params(jax.random.PRNGKey(0), 1000, cfg)
    assert float(jnp.max(jnp.abs(p["angle"]))) <= 15.0
    assert 0.9 <= float(jnp.min(p["scale"])) and float(jnp.max(p["scale"])) <= 1.1
    assert float(jnp.max(jnp.abs(p["tx"]))) <= 0.2
    frac = float(jnp.mean(p["apply"]))
    assert 0.6 < frac < 0.8  # p = 0.7


def test_kornia_preset_ranges():
    cfg = AffineAugmentConfig.random_affine()
    p = sample_affine_params(jax.random.PRNGKey(1), 500, cfg)
    assert bool(jnp.all(p["apply"]))  # p = 1.0
    assert 0.8 <= float(jnp.min(p["scale"])) and float(jnp.max(p["scale"])) <= 1.2


def test_normalise_batch():
    x = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
    out = np.asarray(normalise_batch(x, [0.5] * 3, [0.5] * 3))
    np.testing.assert_allclose(out, 1.0, atol=1e-6)


def test_augment_batch_jits(rng):
    x = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 3)).astype(np.uint8))
    cfg = AffineAugmentConfig.shift_scale_rotate()
    f = jax.jit(lambda k, b: augment_batch(k, b, [0.5] * 3, [0.5] * 3, cfg))
    out = f(jax.random.PRNGKey(0), x)
    assert out.shape == (4, 16, 16, 3)
    assert out.dtype == jnp.float32
    assert np.isfinite(np.asarray(out)).all()


def test_select_warp_method_routing_table():
    """The auto route (ADVICE r3 #1): fused kernel only within its VMEM
    envelope (32-aligned, 384..512 on single TPU); larger 32-aligned TPU
    shapes fall back to the row-tiled two-pass kernel, which is O(1) VMEM
    in image extent; everything else keeps the r3 routing."""
    from denoising_diffusion_deep_fake_tpu.ops.augment import select_warp_method

    cfg = AffineAugmentConfig.shift_scale_rotate()
    tpu1 = dict(backend="tpu", n_devices=1)
    assert select_warp_method(448, 448, cfg, **tpu1) == "pallas_fused"
    assert select_warp_method(384, 512, cfg, **tpu1) == "pallas_fused"
    # Above the whole-sample VMEM envelope: row-tiled kernel, NOT fused.
    assert select_warp_method(640, 640, cfg, **tpu1) == "pallas"
    assert select_warp_method(1024, 1024, cfg, **tpu1) == "pallas"
    assert select_warp_method(448, 544, cfg, **tpu1) == "pallas"
    # Multi-device or non-TPU: no Pallas (no GSPMD partitioning rule).
    assert select_warp_method(448, 448, cfg, backend="tpu",
                              n_devices=8) == "hybrid"
    assert select_warp_method(448, 448, cfg, backend="cpu",
                              n_devices=1) == "hybrid"
    # Small 32-aligned shapes keep the XLA hybrid.
    assert select_warp_method(256, 256, cfg, **tpu1) == "hybrid"
    assert select_warp_method(64, 64, cfg, **tpu1) == "hybrid"
    # Non-32-aligned: shear while the static tap window is small.
    assert select_warp_method(60, 60, cfg, **tpu1) == "shear"
    assert select_warp_method(500, 500, cfg, **tpu1) == "gather"
