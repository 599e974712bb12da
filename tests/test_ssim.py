"""SSIM tests: properties + cross-check against an independent numpy impl."""

import jax
import jax.numpy as jnp
import numpy as np

from denoising_diffusion_deep_fake_tpu.ops.ssim import gaussian_kernel, ssim


def _np_gaussian(window=11, sigma=1.5):
    half = (window - 1) / 2.0
    xs = np.arange(window) - half
    g = np.exp(-(xs ** 2) / (2 * sigma ** 2))
    return g / g.sum()


def _np_blur_valid(x, k):
    # x: HWC; separable valid conv along H then W.
    from numpy.lib.stride_tricks import sliding_window_view

    h = sliding_window_view(x, len(k), axis=0) @ k  # (H-10, W, C)
    return sliding_window_view(h, len(k), axis=1) @ k  # (H-10, W-10, C)


def _np_ssim(x, y, k1=0.01, k2=0.03):
    k = _np_gaussian()
    c1, c2 = k1 ** 2, k2 ** 2
    vals = []
    for xi, yi in zip(x, y):
        mu_x = _np_blur_valid(xi, k)
        mu_y = _np_blur_valid(yi, k)
        sxx = _np_blur_valid(xi * xi, k) - mu_x ** 2
        syy = _np_blur_valid(yi * yi, k) - mu_y ** 2
        sxy = _np_blur_valid(xi * yi, k) - mu_x * mu_y
        ss = ((2 * mu_x * mu_y + c1) * (2 * sxy + c2)) / (
            (mu_x ** 2 + mu_y ** 2 + c1) * (sxx + syy + c2))
        vals.append(ss.mean())
    return np.array(vals)


def test_gaussian_kernel_normalized_symmetric():
    k = np.asarray(gaussian_kernel())
    assert k.shape == (11,)
    np.testing.assert_allclose(k.sum(), 1.0, rtol=1e-6)
    np.testing.assert_allclose(k, k[::-1], rtol=1e-6)


def test_ssim_identity_is_one():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
    val = float(ssim(x, x))
    assert abs(val - 1.0) < 1e-5


def test_ssim_matches_numpy_reference(rng):
    x = rng.random((3, 24, 24, 3)).astype(np.float32)
    y = np.clip(x + 0.1 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    got = np.asarray(ssim(jnp.asarray(x), jnp.asarray(y), reduce_batch=False))
    want = _np_ssim(x, y)
    # numpy ref accumulates in float64; fp32 variance cancellation costs ~1e-3.
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4)


def test_ssim_decreases_with_noise(rng):
    x = rng.random((1, 32, 32, 3)).astype(np.float32)
    small = np.clip(x + 0.02 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    big = np.clip(x + 0.3 * rng.standard_normal(x.shape), 0, 1).astype(np.float32)
    s_small = float(ssim(jnp.asarray(x), jnp.asarray(small)))
    s_big = float(ssim(jnp.asarray(x), jnp.asarray(big)))
    assert s_small > s_big


def test_ssim_jits():
    f = jax.jit(lambda a, b: ssim(a, b))
    x = jnp.ones((1, 16, 16, 3)) * 0.5
    assert abs(float(f(x, x)) - 1.0) < 1e-5
