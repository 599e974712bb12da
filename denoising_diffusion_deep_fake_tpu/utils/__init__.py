from denoising_diffusion_deep_fake_tpu.utils.logging_scheduler import (
    LoggingScheduler,
)
from denoising_diffusion_deep_fake_tpu.utils.tb import TensorBoardLogger

__all__ = ["LoggingScheduler", "TensorBoardLogger"]
