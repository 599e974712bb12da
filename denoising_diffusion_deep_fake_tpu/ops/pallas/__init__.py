from denoising_diffusion_deep_fake_tpu.ops.pallas.noise_kernel import (
    fused_noise_blend,
    fused_normalise_noise_blend,
)

__all__ = ["fused_normalise_noise_blend", "fused_noise_blend"]
