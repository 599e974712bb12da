"""Pallas warp kernel vs the gather ground truth and the XLA hybrid path.

Runs in interpreter mode on CPU (the kernel itself is exercised on hardware
by tools/validate_pallas_tpu.py and the augment auto path).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.ops.augment import (
    AffineAugmentConfig,
    affine_warp,
    affine_warp_hybrid,
    augment_batch,
    sample_affine_params,
)
from denoising_diffusion_deep_fake_tpu.ops.pallas.warp_kernel import (
    affine_warp_pallas,
)

B, S = 2, 64


@pytest.fixture(scope="module")
def image():
    rng = np.random.default_rng(0)
    # Smooth image: interpolation-order differences between methods are
    # second-order on smooth data, so tolerances can be tight.
    y, x = np.mgrid[0:S, 0:S] / S
    base = np.stack([np.sin(4 * x + 2 * y), np.cos(3 * y), x * y], axis=-1)
    return jnp.asarray((base + 0.05 * rng.standard_normal((S, S, 3)))
                       .astype(np.float32)[None].repeat(B, axis=0))


def _params(angle=0.0, scale=1.0, tx=0.0, ty=0.0):
    ones = jnp.ones((B,), jnp.float32)
    return {"angle": ones * angle, "scale": ones * scale, "tx": ones * tx,
            "ty": ones * ty, "apply": jnp.ones((B,), bool)}


def test_identity_exact(image):
    out = affine_warp_pallas(image, _params(), interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(image), atol=2e-2)


def test_pure_shift_matches_gather(image):
    # Integer+fractional shift: both passes are single linear interps ->
    # matches direct bilinear to bf16-matmul precision.
    p = _params(tx=0.1, ty=-0.05)
    ref = np.asarray(affine_warp(image, p))
    out = np.asarray(affine_warp_pallas(image, p, interpret=True))
    np.testing.assert_allclose(out, ref, atol=2e-2)


def test_pure_scale_matches_gather(image):
    p = _params(scale=1.15)
    ref = np.asarray(affine_warp(image, p))
    out = np.asarray(affine_warp_pallas(image, p, interpret=True))
    interior = (slice(None), slice(4, -4), slice(4, -4))
    np.testing.assert_allclose(out[interior], ref[interior], atol=3e-2)


def test_rotation_tracks_gather_as_well_as_hybrid(image):
    cfg = AffineAugmentConfig.random_affine()
    params = sample_affine_params(jax.random.PRNGKey(3), B, cfg)
    ref = np.asarray(affine_warp(image, params))
    hyb = np.abs(np.asarray(affine_warp_hybrid(image, params)) - ref).mean()
    pal = np.abs(np.asarray(affine_warp_pallas(image, params,
                                               interpret=True)) - ref).mean()
    # The kernel resamples real data where the hybrid zero-pads its
    # intermediate, so it must be at least as close to ground truth.
    assert pal <= hyb + 1e-3, (pal, hyb)


def test_augment_batch_pallas_method(image):
    u8 = jnp.asarray(
        np.random.default_rng(1).integers(0, 256, (B, S, S, 3),
                                          dtype=np.uint8))
    cfg = AffineAugmentConfig.random_affine()
    out = augment_batch(jax.random.PRNGKey(0), u8, (0.5,) * 3, (0.5,) * 3,
                        cfg, method="pallas")
    assert out.shape == u8.shape and out.dtype == jnp.float32
    assert bool(jnp.isfinite(out).all())


def test_rejects_unaligned_height():
    img = jnp.zeros((1, 40, 64, 3), jnp.float32)
    params = {k: v[:1] for k, v in _params().items()}
    with pytest.raises(ValueError, match="multiple"):
        affine_warp_pallas(img, params, interpret=True)
