"""Loss tests: reference formula (MSE + 1-SSIM)/2 with [-1,1]→[0,1] rescale."""

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.ops import mse_loss, mse_ssim_loss
from denoising_diffusion_deep_fake_tpu.ops.losses import l1_difficulty_loss
from denoising_diffusion_deep_fake_tpu.ops.ssim import ssim


def test_mse_matches_torch_semantics(rng):
    a = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    b = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = float(mse_loss(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(got, np.mean((a - b) ** 2), rtol=1e-6)


def test_perfect_prediction_gives_zero_loss():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3)) * 2 - 1
    loss = float(mse_ssim_loss(x, x))
    assert abs(loss) < 1e-5


def test_loss_composition(rng):
    p = (rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    t = (rng.random((2, 32, 32, 3)).astype(np.float32)) * 2 - 1
    pj, tj = jnp.asarray(p), jnp.asarray(t)
    mse = float(mse_loss(pj, tj))
    s = float(ssim(jnp.clip((pj + 1) / 2, 0, 1), jnp.clip((tj + 1) / 2, 0, 1)))
    want = (mse + (1.0 - s)) / 2.0
    got = float(mse_ssim_loss(pj, tj))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_clips_out_of_range_before_ssim():
    # Values outside [-1,1] must be clipped for SSIM but not for MSE.
    p = jnp.full((1, 16, 16, 3), 3.0)
    t = jnp.full((1, 16, 16, 3), 1.0)
    # After clipping both normalize to 1.0 → SSIM == 1 → loss == MSE/2.
    got = float(mse_ssim_loss(p, t))
    np.testing.assert_allclose(got, np.mean((3.0 - 1.0) ** 2) / 2, rtol=1e-5)


def test_l1_difficulty_loss_per_image(rng):
    p = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    t = rng.standard_normal((4, 8, 8, 3)).astype(np.float32)
    got = np.asarray(l1_difficulty_loss(jnp.asarray(p), jnp.asarray(t)))
    want = np.abs(p - t).mean(axis=(1, 2, 3))
    assert got.shape == (4,)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_loss_math_is_fp32_for_bf16_networks(rng):
    """Round-3 TPU finding: a bf16 SSIM diverges training — its variance
    terms (E[x^2] - mu^2) cancel below bf16's 8-bit mantissa and the
    gradients turn to noise (BASELINE.md "TPU precision"). The loss path
    must therefore upcast whatever dtype the network computes in."""
    import jax.numpy as jnp

    from denoising_diffusion_deep_fake_tpu.ops.ssim import ssim

    p32 = jnp.asarray(rng.random((2, 32, 32, 3), np.float32) * 2 - 1)
    t32 = jnp.asarray(rng.random((2, 32, 32, 3), np.float32) * 2 - 1)
    p16, t16 = p32.astype(jnp.bfloat16), t32.astype(jnp.bfloat16)

    for fn in (mse_loss, mse_ssim_loss):
        out16 = fn(p16, t16)
        assert out16.dtype == jnp.float32
        # Only input quantization separates the two, not compute precision.
        np.testing.assert_allclose(float(fn(p32, t32)), float(out16),
                                   rtol=0.05)
    s16 = ssim((p16 + 1) / 2, (t16 + 1) / 2)
    assert s16.dtype == jnp.float32
