"""Structural similarity (SSIM) in pure JAX, NHWC, TPU-friendly.

Numerical-parity target: ``piqa.SSIM()`` with its defaults as used by the
reference's loss (`/root/reference/d3f/loss_functions/structural_similarity_loss.py:11`):
11-tap Gaussian window (sigma 1.5), per-channel (depthwise) filtering with
*valid* padding, ``k1=0.01, k2=0.03``, ``value_range=1``, mean over channels and
valid pixels per image, mean over batch for the scalar reduction.

Design notes (TPU): the window is separable, so each filtering pass is two 1-D
depthwise convolutions — cheap VPU work that XLA fuses with the surrounding
elementwise algebra. HOW the five filtered maps (mu_x, mu_y, E[x^2], E[y^2],
E[xy]) are computed is a measured, shape-dependent layout choice — see the
variant comment inside ``ssim`` (bit-identical math either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=None)
def _gaussian_kernel_tuple(window_size: int, sigma: float) -> tuple[float, ...]:
    import math

    half = (window_size - 1) / 2.0
    xs = [i - half for i in range(window_size)]
    g = [math.exp(-(x * x) / (2.0 * sigma * sigma)) for x in xs]
    s = sum(g)
    return tuple(v / s for v in g)


def gaussian_kernel(window_size: int = 11, sigma: float = 1.5,
                    dtype=jnp.float32) -> jax.Array:
    """Normalized 1-D Gaussian window, matching piqa's kernel construction."""
    return jnp.asarray(_gaussian_kernel_tuple(window_size, sigma), dtype=dtype)


def _depthwise_blur_1d(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """Valid-padding depthwise 1-D convolution along a spatial axis of NHWC."""
    c = x.shape[-1]
    k = kernel.shape[0]
    if axis == 1:  # H
        w = jnp.tile(kernel.reshape(k, 1, 1, 1), (1, 1, 1, c))
        window = (k, 1)
    else:  # W
        w = jnp.tile(kernel.reshape(1, k, 1, 1), (1, 1, 1, c))
        window = (1, k)
    return lax.conv_general_dilated(
        x, w.astype(x.dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        # Exact-precision blur regardless of the backend's matmul default:
        # sigma = E[x^2] - mu^2 cancels catastrophically if the filtered
        # maps carry bf16 rounding (TPU MXU one-pass default) — measured to
        # DIVERGE training (BASELINE.md round-3 "TPU precision"). The blur
        # is tiny depthwise VPU work; HIGHEST costs nothing measurable.
        precision=lax.Precision.HIGHEST,
    )


def _blur(x: jax.Array, kernel: jax.Array) -> jax.Array:
    return _depthwise_blur_1d(_depthwise_blur_1d(x, kernel, 1), kernel, 2)


def ssim(x: jax.Array, y: jax.Array, *, value_range: float = 1.0,
         window_size: int = 11, sigma: float = 1.5, k1: float = 0.01,
         k2: float = 0.03, reduce_batch: bool = True) -> jax.Array:
    """SSIM between NHWC image batches in ``[0, value_range]``.

    Returns a scalar (mean over batch) when ``reduce_batch`` else per-image
    values of shape ``(B,)``.
    """
    if x.shape != y.shape:
        raise ValueError(f"shape mismatch: {x.shape} vs {y.shape}")
    # SSIM is computed in fp32 whatever the network dtype: the variance
    # terms below are small differences of O(1) filtered maps, and bf16's
    # 8-bit mantissa turns them into pure noise (gradients included —
    # training under a bf16 SSIM measurably diverges; piqa computes in
    # fp32 too, so this is also the parity-correct choice). The upcast is
    # a few elementwise ops on the loss inputs — negligible next to the
    # U-Net convs that stay in bf16.
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    kernel = gaussian_kernel(window_size, sigma, dtype=jnp.float32)

    c1 = (k1 * value_range) ** 2
    c2 = (k2 * value_range) ** 2

    # Filtering strategy for [x, y, x*x, y*y, x*y] — chosen by STATIC shape;
    # every variant computes bit-identical per-channel math (the blur is
    # per-row, per-channel depthwise), so this is pure layout/fusion tuning
    # (round-5 A/B on TPU v5e, BASELINE.md "SSIM stacking saga"):
    # * plain axis-0 concat (rounds 1-4) is fast single-chip but puts each
    #   sample's maps B rows apart — under data sharding the SPMD
    #   partitioner inserted 62 collective-permutes + 12 all-to-alls per
    #   step to reshuffle activation chunks (collective-census find). Dead.
    # * channel-axis stacking is shard-clean but lane-slices at offsets
    #   3/6/9/12: +51 ms on the 448² swap step. Dead.
    # * per-sample interleave (rows 5b..5b+4 = sample b's maps) is
    #   shard-clean; measured 219.1 ms on the 448² swap step but costs
    #   ~2.5 ms/step on the 64² denoiser (the [5B,54,54,3] relayout).
    # * five independent blurs let each elementwise producer emit the
    #   conv's preferred layout directly: best at small maps (64² headline
    #   18.2k vs 15.5k imgs/s) but +37 ms at 448² (ten lane-starved
    #   3-channel convs lose to one 5B-row batch).
    # Crossover sits between 64² and 448²; route small maps to the
    # unstacked form, large ones to the per-sample interleave.
    if x.shape[1] * x.shape[2] <= 128 * 128:
        mu_x = _blur(x, kernel)
        mu_y = _blur(y, kernel)
        exx = _blur(x * x, kernel)
        eyy = _blur(y * y, kernel)
        exy = _blur(x * y, kernel)
    else:
        b = x.shape[0]
        stacked = jnp.stack([x, y, x * x, y * y, x * y],
                            axis=1).reshape((5 * b,) + x.shape[1:])
        f = _blur(stacked, kernel)
        f = f.reshape((b, 5) + f.shape[1:])
        mu_x, mu_y, exx, eyy, exy = (f[:, i] for i in range(5))

    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = exx - mu_xx
    sigma_y = eyy - mu_yy
    sigma_xy = exy - mu_xy

    ss = ((2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)) / (
        (mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2))

    per_image = jnp.mean(ss, axis=(1, 2, 3))
    return jnp.mean(per_image) if reduce_batch else per_image
