from denoising_diffusion_deep_fake_tpu.ops.noise import (
    sample_truncated_exponential,
    blend_noise,
    blend_random_amount_of_noise,
    blend_fixed_amount_of_noise,
)
from denoising_diffusion_deep_fake_tpu.ops.ssim import ssim
from denoising_diffusion_deep_fake_tpu.ops.losses import mse_ssim_loss, mse_loss

__all__ = [
    "sample_truncated_exponential",
    "blend_noise",
    "blend_random_amount_of_noise",
    "blend_fixed_amount_of_noise",
    "ssim",
    "mse_ssim_loss",
    "mse_loss",
]
