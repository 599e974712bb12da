"""Golden-value regression tests (SURVEY.md §4 test strategy).

Pin exact per-step outputs of the train loop and the noise ops under fixed
PRNG keys on CPU fp32 with the suite's 8-virtual-device env (XLA's
partitioning changes float rounding, so goldens must be recorded under the
same device count — regenerate with
``XLA_FLAGS=--xla_force_host_platform_device_count=8``). Recorded 2026-08-17
with the baked-in jax; the tolerances absorb compiler-revision-level float drift
while still catching any change to the math (schedule, loss, init, PRNG
derivation, augmentation ordering). If a DELIBERATE math change breaks
these, re-record and say why in the commit.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from denoising_diffusion_deep_fake_tpu.config import (
    DenoiserConfig,
    config_from_dict,
)
from denoising_diffusion_deep_fake_tpu.ops.noise import (
    blend_random_amount_of_noise,
    sample_truncated_exponential,
)
from denoising_diffusion_deep_fake_tpu.training.denoiser import DenoiserTrainer

# Re-pinned 2026-08-20 (round 5): ssim() routes small maps through five
# independent blurs (ops/ssim.py variant comment) — the FORWARD is
# bit-identical (step-1 losses unchanged below), but the BACKWARD sums the
# five filtered-map gradient contributions in a different association, so
# trajectories drift at reduction-order level from step 2 (the same fp
# class as BASELINE.md round 3's cross-platform decoherence). Values are
# environment-pinned: CPU backend with the conftest's 8 virtual devices
# (device count changes oneDNN threading = summation order).
GOLDEN_LOSSES = [0.9110961, 0.84828764, 0.82398367]
GOLDEN_EXP_R = [0.15101501, 0.01636913, 0.06087337, 0.45817333]
GOLDEN_NOISE_SUM = 21.053598
GOLDEN_RATIOS = [0.12144659, 0.03393044]
# Fused two-model swap step (EMA cross-feed ordering, lit_module.py:184-207
# parity) — 2 steps, resnet18 fp32 32², seeds as below. Step-1 train_a and
# both swap_difference/a values are unchanged from the 2026-08-17 pin
# (forward parity); the rest drifted with the backward reassociation.
GOLDEN_SWAP_STEPS = [
    {"loss_swap/train_a": 1.0707165, "loss_swap/train_b": 0.88901269,
     "swap_difference/a": 0.97938323, "swap_difference/b": 0.85310715},
    {"loss_swap/train_a": 0.9466542, "loss_swap/train_b": 0.8272295,
     "swap_difference/a": 0.74555886, "swap_difference/b": 0.76523036},
]


def test_denoiser_train_step_losses_pinned():
    cfg = config_from_dict(DenoiserConfig, dict(
        input_image_list_path="x", batch_size=2, learning_rate=1e-3,
        encoder_name="resnet18", compute_dtype="float32",
        noise_exponential_sampling_lambda=5.0), validate=False)
    trainer = DenoiserTrainer(cfg, steps_per_epoch=10, image_size=32)
    state = trainer.init_state(jax.random.PRNGKey(42))
    step = trainer.make_train_step(donate=False)
    rng = np.random.default_rng(123)
    batch = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch, key)
        losses.append(float(metrics["loss"]))
    np.testing.assert_allclose(losses, GOLDEN_LOSSES, rtol=1e-4)
    # The loop must actually learn something on a repeated batch.
    assert losses[2] < losses[0]


def test_truncated_exponential_pinned():
    r = sample_truncated_exponential(jax.random.PRNGKey(5), (4,), 5.0)
    np.testing.assert_allclose(np.asarray(r), GOLDEN_EXP_R, rtol=1e-5)


def test_noise_blend_pinned():
    # Same RNG consumption order as the golden generator: one uint8 batch
    # draw precedes the normal draw.
    rng = np.random.default_rng(123)
    rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 3)).astype(np.float32))
    noisy, ratio = blend_random_amount_of_noise(jax.random.PRNGKey(9), x, 5.0)
    assert abs(float(jnp.sum(noisy)) - GOLDEN_NOISE_SUM) < 1e-3
    np.testing.assert_allclose(np.asarray(ratio).reshape(-1), GOLDEN_RATIOS,
                               rtol=1e-5)


def test_swap_train_step_metrics_pinned():
    """The hardest parity surface (VERDICT r1 item 5): the fused two-model
    swap step with in-jit EMA ordering, pinned under fixed PRNG."""
    from denoising_diffusion_deep_fake_tpu.config import DeepFakeConfig
    from denoising_diffusion_deep_fake_tpu.training.deep_fake import (
        DeepFakeTrainer)

    cfg = config_from_dict(DeepFakeConfig, dict(
        mode="swap", data_path_a="x", data_path_b="y", batch_size=2,
        learning_rate=1e-3, encoder_name="resnet18", compute_dtype="float32",
        noise_exponential_sampling_lambda=8.0, ema_update_after_step=0),
        validate=False)
    trainer = DeepFakeTrainer(cfg, steps_per_epoch=10, image_size=32)
    states = trainer.init_states(jax.random.PRNGKey(42))
    step = trainer.make_train_step(donate=False)
    rng = np.random.default_rng(123)
    ba = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    bb = jnp.asarray(rng.integers(0, 256, (2, 32, 32, 3), dtype=np.uint8))
    key = jax.random.PRNGKey(7)
    for want in GOLDEN_SWAP_STEPS:
        states, metrics = step(states, ba, bb, key)
        got = {k: float(v) for k, v in metrics.items() if k in want}
        for k, v in want.items():
            np.testing.assert_allclose(got[k], v, rtol=1e-4, err_msg=k)
    # Learning signal: both swap losses drop across the pinned steps.
    assert (GOLDEN_SWAP_STEPS[1]["loss_swap/train_a"]
            < GOLDEN_SWAP_STEPS[0]["loss_swap/train_a"])
