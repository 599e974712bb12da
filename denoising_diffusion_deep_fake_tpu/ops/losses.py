"""Training losses.

Parity target: ``MseStructuralSimilarityLoss``
(`/root/reference/d3f/loss_functions/structural_similarity_loss.py:5-26`):
``(MSE + (1 - SSIM)) / 2`` where inputs live in ``[input_min, input_max]``
(always ``[-1, 1]`` in the reference) and are affinely rescaled to ``[0, 1]``
and clipped before SSIM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.ops.ssim import ssim


def mse_loss(prediction: jax.Array, target: jax.Array) -> jax.Array:
    """Mean-squared error over all elements (torch ``nn.MSELoss`` semantics).

    Accumulated in fp32 whatever the network dtype: a bf16 mean over ~1e5+
    elements quantizes away the small per-pixel residuals that drive late
    training (the reference's torch loss is fp32 as well)."""
    d = prediction.astype(jnp.float32) - target.astype(jnp.float32)
    return jnp.mean(d * d)


def _normalise_between_zero_and_one(x: jax.Array, lo: float, hi: float) -> jax.Array:
    return jnp.clip((x - lo) / (hi - lo), 0.0, 1.0)


def mse_ssim_loss(prediction: jax.Array, target: jax.Array, *,
                  input_min: float = -1.0, input_max: float = 1.0) -> jax.Array:
    """``(MSE + (1 - SSIM)) / 2`` on NHWC batches.

    MSE is computed on the raw values; SSIM on the ``[0, 1]``-rescaled, clipped
    values — exactly the reference's ordering
    (`structural_similarity_loss.py:14-21`).
    """
    mse = mse_loss(prediction, target)
    prediction = prediction.astype(jnp.float32)
    target = target.astype(jnp.float32)
    p = _normalise_between_zero_and_one(prediction, input_min, input_max)
    t = _normalise_between_zero_and_one(target, input_min, input_max)
    ssim_loss = 1.0 - ssim(p, t, value_range=1.0)
    return (mse + ssim_loss) / 2.0


def l1_difficulty_loss(prediction: jax.Array, target: jax.Array) -> jax.Array:
    """Per-image mean absolute error, shape ``(B,)``.

    Parity with the balancer's `compute_difficulty_loss`
    (`/root/reference/d3f/balance_training_images/lit_module.py:137-140`).
    fp32 accumulation for the same reason as ``mse_loss`` (scores feed a
    min-max normalize + binning — bf16 ties would merge difficulty bins).
    """
    return jnp.mean(jnp.abs(prediction.astype(jnp.float32)
                            - target.astype(jnp.float32)), axis=(1, 2, 3))
