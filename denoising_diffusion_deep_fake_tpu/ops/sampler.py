"""Denoising samplers: single-pass (reference parity) + scanned DDIM.

The reference's swap inference is a SINGLE U-Net forward — no iterative
sampling loop exists anywhere in it (`/root/reference/d3f/script_tools/
put_video_through_fake_model.py:111-119` calls ``predict_fake`` once per
frame; SURVEY.md §3.4). That works because the model is a blind x0-predictor
with no timestep conditioning (SURVEY.md §2 model note).

This module keeps that single-pass mode for parity and adds the BASELINE
north-star extension (configs[3]): an iterative DDIM-style refinement fused
into ONE ``lax.scan``-compiled XLA program, bf16-friendly. With an
unconditioned x0-predictor the DDIM update at noise ratio ``r`` is:

    x0_hat  = f(x_r)
    eps_hat = (x_r - sqrt(1 - r) * x0_hat) / sqrt(r)
    x_r'    = sqrt(1 - r') * x0_hat + sqrt(r') * eps_hat      (r' < r)

i.e. re-noise the prediction along the deterministic (eta=0) DDIM trajectory.
The whole loop is device-resident: one compile, zero host round-trips, weights
stay in HBM across steps.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.ops.noise import blend_noise


def ddim_ratio_schedule(steps: int, r_start: float = 0.999,
                        r_end: float = 0.0) -> jax.Array:
    """Linearly decaying noise-ratio schedule ``[r_start, ..., r_end]``.

    ``steps + 1`` knots: the sampler transitions between consecutive pairs.
    """
    return jnp.linspace(r_start, r_end, steps + 1, dtype=jnp.float32)


def ddim_sample(predict_x0: Callable[[jax.Array], jax.Array],
                x_init: jax.Array, ratios: jax.Array,
                clip: tuple[float, float] | None = (-1.0, 1.0)) -> jax.Array:
    """Run the scanned DDIM refinement from ``x_init`` noised at ratios[0].

    ``predict_x0`` is the jittable x0-predictor (eval-mode U-Net forward).
    Returns the final x0 prediction. The scan compiles the N U-Net forwards
    into a single XLA while-program.

    ``clip`` bounds each intermediate x0 prediction to the data range before
    re-noising (DDPM-style static thresholding). The predictor here is BLIND
    (no noise-level conditioning), so any off-range artifact in x0_hat is
    re-noised and fed back: without clipping the iteration can amplify
    exponentially (measured: -100 dB PSNR blow-ups from r_start=0.7 on an
    undertrained model; stable with clipping). Pass None for raw DDIM.
    """
    r_pairs = jnp.stack([ratios[:-1], ratios[1:]], axis=1)

    def step(x, pair):
        r, r_next = pair[0], pair[1]
        x0_hat = predict_x0(x)
        if clip is not None:
            x0_hat = jnp.clip(x0_hat, clip[0], clip[1])
        # Guard r -> 0: eps_hat is irrelevant when sqrt(r') == 0 too.
        safe_r = jnp.maximum(r, 1e-8)
        eps_hat = (x - jnp.sqrt(1.0 - r) * x0_hat) * jax.lax.rsqrt(safe_r)
        x_next = jnp.sqrt(1.0 - r_next) * x0_hat + jnp.sqrt(r_next) * eps_hat
        return x_next.astype(x.dtype), None

    x_final, _ = jax.lax.scan(step, x_init, r_pairs)
    # Final knot is r == 0: one last x0 prediction.
    return predict_x0(x_final)


def swap_refine(predict_x0: Callable[[jax.Array], jax.Array], real: jax.Array,
                key: jax.Array, *, steps: int, r_start: float = 0.7,
                clip: tuple[float, float] | None = (-1.0, 1.0)) -> jax.Array:
    """Noise the input to ``r_start`` then DDIM-refine it in ``steps`` steps.

    The multi-step analogue of the reference's one-shot ``predict_fake`` —
    all fused in one scanned program. NOTE: single-pass remains the default
    because measured quality evidence (BASELINE.md rounds 3-4: converged
    models still lose ~17 dB of structure through a 3000-step refine) favors
    it; that evidence is SYNTHETIC-BLOB-derived (tools/ddim_quality.py
    tinted-blob identities — no real-image data exists on this host), so
    revisit the default if real-data evaluation ever says otherwise.
    """
    noise = jax.random.normal(key, real.shape, dtype=real.dtype)
    r0 = jnp.full((real.shape[0],) + (1,) * (real.ndim - 1), r_start,
                  real.dtype)
    x = blend_noise(real, noise, r0)
    ratios = ddim_ratio_schedule(steps, r_start=r_start)
    return ddim_sample(predict_x0, x, ratios, clip=clip)
