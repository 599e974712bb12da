"""Shear-decomposed warp: exactness on separable cases, closeness on rotation."""

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    _shear_tap_bounds,
    affine_warp,
    affine_warp_shear,
    augment_batch,
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

TAPS = (24, 24)


def test_identity_exact(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    out = affine_warp_shear(x, _params(2), TAPS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_pure_shift_matches_gather_exactly(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    p = _params(2, tx=0.17, ty=-0.12)
    got = np.asarray(affine_warp_shear(x, p, TAPS))
    want = np.asarray(affine_warp(x, p))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pure_scale_matches_gather(rng):
    x = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    p = _params(1, scale=1.15)
    got = np.asarray(affine_warp_shear(x, p, TAPS))
    want = np.asarray(affine_warp(x, p))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotation_close_to_gather(rng):
    # Shear decomposition is a different (standard) resampling than direct
    # bilinear: interior pixels agree to ~1% of the dynamic range on smooth
    # content; border taps may differ by one pixel of support.
    base = np.zeros((20, 20), np.float32)
    base[5:15, 5:15] = np.linspace(0, 1, 10)  # smooth ramp patch
    x = jnp.asarray(np.tile(base[None, :, :, None], (1, 1, 1, 3)))
    p = _params(1, angle=12.0, scale=1.05, tx=0.05)
    got = np.asarray(affine_warp_shear(x, p, TAPS))
    want = np.asarray(affine_warp(x, p))
    interior = (slice(0, 1), slice(3, 17), slice(3, 17))
    err = np.abs(got[interior] - want[interior])
    assert err.mean() < 0.01, err.mean()
    assert err.max() < 0.08, err.max()


def test_full_random_param_range_agreement(rng):
    # Worst-case config ranges: every sample must stay close to the gather
    # reference, proving the static tap bound covers the range.
    cfg = AffineAugmentConfig.random_affine()  # ±15°, ±0.2 shift, 0.8-1.2
    x = jnp.asarray(rng.random((8, 24, 24, 3)).astype(np.float32))
    params = sample_affine_params(jax.random.PRNGKey(3), 8, cfg)
    taps = _shear_tap_bounds(24, 24, cfg)
    got = np.asarray(affine_warp_shear(x, params, taps))
    want = np.asarray(affine_warp(x, params))
    # Energy must match: no truncated taps (weights lost to window edges).
    got_mass = np.abs(got).sum(axis=(1, 2, 3))
    want_mass = np.abs(want).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(got_mass, want_mass, rtol=0.06)
    assert np.abs(got - want).mean() < 0.02


def test_not_applied_identity(rng):
    x = jnp.asarray(rng.random((2, 16, 16, 3)).astype(np.float32))
    out = affine_warp_shear(x, _params(2, angle=14.0, apply=False), TAPS)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


def test_augment_batch_shear_default_jits(rng):
    u8 = jnp.asarray(rng.integers(0, 256, (4, 32, 32, 3)).astype(np.uint8))
    cfg = AffineAugmentConfig.shift_scale_rotate()
    f = jax.jit(lambda k, b: augment_batch(k, b, (0.5,) * 3, (0.5,) * 3, cfg))
    out = f(jax.random.PRNGKey(0), u8)
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------- hybrid warp

from denoising_diffusion_deep_fake_tpu.ops.augment import affine_warp_hybrid


def test_hybrid_identity_exact(rng):
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    out = affine_warp_hybrid(x, _params(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-4)


def test_hybrid_pure_shift_matches_gather(rng):
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))
    p = _params(2, tx=0.15, ty=-0.1)
    got = np.asarray(affine_warp_hybrid(x, p))
    want = np.asarray(affine_warp(x, p))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_hybrid_scale_matches_gather(rng):
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    p = _params(1, scale=1.2)
    got = np.asarray(affine_warp_hybrid(x, p))
    want = np.asarray(affine_warp(x, p))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_hybrid_full_range_agreement(rng):
    cfg = AffineAugmentConfig.random_affine()
    x_np = np.zeros((8, 64, 64, 3), np.float32)
    # smooth content (resampling-method differences vanish on smooth fields)
    yy, xx = np.mgrid[0:64, 0:64] / 64.0
    x_np[:] = np.stack([np.sin(3 * xx + 2 * yy), yy * xx, xx],
                       axis=-1)[None]
    x = jnp.asarray(x_np)
    params = sample_affine_params(jax.random.PRNGKey(5), 8, cfg)
    got = np.asarray(affine_warp_hybrid(x, params))
    want = np.asarray(affine_warp(x, params))
    got_mass = np.abs(got).sum(axis=(1, 2, 3))
    want_mass = np.abs(want).sum(axis=(1, 2, 3))
    np.testing.assert_allclose(got_mass, want_mass, rtol=0.08)
    assert np.abs(got - want).mean() < 0.02
