"""Continuous variance-preserving noise injection.

TPU-native re-implementation of the reference's noise schedule
(`/root/reference/d3f/train_deep_fake/lit_module.py:208-233`, duplicated at
`d3f/train_denoiser/lit_module.py:128-153`; fixed-ratio variant at
`d3f/balance_training_images/lit_module.py:109-120`):

* per-sample noise ratio ``r`` drawn from a truncated exponential on ``[0, 1]``
  via inverse-CDF sampling — biases training toward low noise levels,
* variance-preserving blend ``x_noisy = sqrt(1 - r) * x + sqrt(r) * eps`` with
  ``eps ~ N(0, 1)``.

All functions are pure, take explicit PRNG keys, and are shape-polymorphic so
they jit cleanly and fuse into the surrounding train step (one fused HBM pass:
XLA folds the ratio broadcast + two rsqrt-scaled FMAs into the U-Net's first
conv's input production).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_truncated_exponential(key: jax.Array, shape, lam: float,
                                 dtype=jnp.float32) -> jax.Array:
    """Draw samples in ``[0, 1)`` from an exponential truncated to [0, 1].

    Inverse-CDF method: with ``y ~ U[0, 1)`` and ``c = exp(-lam)``,

        r = (1 / lam) * log(1 / (y * (1 - c) + c))

    which matches the reference's `sample_random_number_from_exponential_distribution`
    (`/root/reference/d3f/train_deep_fake/lit_module.py:221-233`). Larger ``lam``
    concentrates mass near 0 (low noise).
    """
    y = jax.random.uniform(key, shape=shape, dtype=dtype)
    c = jnp.exp(jnp.asarray(-lam, dtype))
    return (1.0 / lam) * jnp.log(1.0 / (y * (1.0 - c) + c))


def blend_noise(batch: jax.Array, noise: jax.Array, ratio: jax.Array) -> jax.Array:
    """Variance-preserving blend: ``sqrt(1 - r) * x + sqrt(r) * noise``.

    ``ratio`` broadcasts against ``batch`` (typically shape ``(B, 1, 1, 1)``).
    Reference math: `/root/reference/d3f/train_deep_fake/lit_module.py:217`.
    """
    ratio = ratio.astype(batch.dtype)
    return jnp.sqrt(1.0 - ratio) * batch + jnp.sqrt(ratio) * noise


def blend_random_amount_of_noise(key: jax.Array, batch: jax.Array,
                                 lam: float) -> tuple[jax.Array, jax.Array]:
    """Noise each sample with its own truncated-exponential ratio.

    Returns ``(noisy_batch, ratios)``; ratios have shape ``(B, 1, 1, 1)``.
    Parity with `blend_random_amount_of_noise_with_each_sample`
    (`/root/reference/d3f/train_deep_fake/lit_module.py:208-219`).
    """
    key_r, key_n = jax.random.split(key)
    b = batch.shape[0]
    r = sample_truncated_exponential(
        key_r, (b,) + (1,) * (batch.ndim - 1), lam, dtype=jnp.float32)
    noise = jax.random.normal(key_n, batch.shape, dtype=batch.dtype)
    return blend_noise(batch, noise, r), r


def blend_fixed_amount_of_noise(key: jax.Array, batch: jax.Array,
                                ratio: float) -> jax.Array:
    """Noise every sample at one fixed ratio (the balancer's schedule).

    Parity with `blend_fixed_amount_of_noise_with_each_sample`
    (`/root/reference/d3f/balance_training_images/lit_module.py:109-120`).
    """
    noise = jax.random.normal(key, batch.shape, dtype=batch.dtype)
    r = jnp.full((batch.shape[0],) + (1,) * (batch.ndim - 1), ratio,
                 dtype=jnp.float32)
    return blend_noise(batch, noise, r)
