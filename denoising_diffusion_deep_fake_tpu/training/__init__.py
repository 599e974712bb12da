from denoising_diffusion_deep_fake_tpu.training.optim import (
    cosine_annealing_lr,
    make_adam_with_cosine,
)
from denoising_diffusion_deep_fake_tpu.training.ema import (
    EmaConfig,
    ema_decay,
    ema_update,
)
from denoising_diffusion_deep_fake_tpu.training.state import ModelState

__all__ = [
    "cosine_annealing_lr",
    "make_adam_with_cosine",
    "EmaConfig",
    "ema_decay",
    "ema_update",
    "ModelState",
]
