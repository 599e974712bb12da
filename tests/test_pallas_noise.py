"""Pallas fused normalize+noise kernel tests.

The mosaic interpreter stubs ``prng_random_bits`` to zeros (upstream TODO), so
on CPU we can only pin the deterministic path (normalization, shapes, dtypes);
the stochastic behavior (noise moments, seed determinism) is TPU-gated and
also exercised by ``tools/validate_pallas_tpu.py`` on real hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from denoising_diffusion_deep_fake_tpu.ops.pallas.noise_kernel import (
    fused_noise_blend,
    fused_normalise_noise_blend,
)

on_tpu = jax.default_backend() == "tpu"
tpu_only = pytest.mark.skipif(not on_tpu, reason="PRNG needs real TPU")

MEAN = (0.5, 0.5, 0.5)
STD = (0.5, 0.5, 0.5)


def run(batch, ratios, seed=0):
    return fused_normalise_noise_blend(
        batch, jnp.asarray(ratios, jnp.float32), MEAN, STD, seed=seed,
        interpret=not on_tpu)


def test_zero_ratio_is_pure_normalization(rng):
    batch = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8))
    out = np.asarray(run(batch, np.zeros(8)))
    want = (np.asarray(batch).astype(np.float32) - 127.5) / 127.5
    np.testing.assert_allclose(out, want, atol=1e-5)


def test_output_shape_dtype(rng):
    batch = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8))
    out = run(batch, np.full(8, 0.5))
    assert out.shape == (8, 16, 16, 3)
    assert out.dtype == jnp.float32


def test_f32_variant_zero_ratio_identity(rng):
    x = jnp.asarray(rng.standard_normal((8, 16, 16, 3)).astype(np.float32))
    out = fused_noise_blend(x, jnp.zeros(8), seed=0, interpret=not on_tpu)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_jits_inside_larger_program(rng):
    batch = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8))

    @jax.jit
    def f(b):
        out = fused_normalise_noise_blend(
            b, jnp.zeros(8), MEAN, STD, seed=3, interpret=not on_tpu)
        return out.mean()

    assert np.isfinite(float(f(batch)))


@tpu_only
def test_unit_ratio_is_standard_normal(rng):
    big = jnp.asarray(rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8))
    out = np.asarray(run(big, np.ones(8)))
    assert abs(out.mean()) < 0.05
    assert abs(out.var() - 1.0) < 0.08
    assert np.abs(out).max() < 6.5


@tpu_only
def test_deterministic_per_seed(rng):
    batch = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8))
    a = np.asarray(run(batch, np.full(8, 0.5), seed=7))
    b = np.asarray(run(batch, np.full(8, 0.5), seed=7))
    c = np.asarray(run(batch, np.full(8, 0.5), seed=8))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


@tpu_only
def test_per_sample_noise_decorrelated(rng):
    batch = jnp.asarray(rng.integers(0, 256, (8, 16, 16, 3), dtype=np.uint8))
    out = np.asarray(run(batch, np.ones(8)))
    corr = np.corrcoef(out[0].ravel(), out[1].ravel())[0, 1]
    assert abs(corr) < 0.2


def test_unsupported_shape_raises(rng):
    import pytest as _pytest

    bad = jnp.asarray(rng.integers(0, 256, (4, 16, 16, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="unsupported"):
        run(bad, np.zeros(4))
    bad2 = jnp.asarray(rng.integers(0, 256, (8, 9, 9, 3), dtype=np.uint8))
    with _pytest.raises(ValueError, match="unsupported"):
        run(bad2, np.zeros(8))
