from denoising_diffusion_deep_fake_tpu.models.resnet import ResNetEncoder, RESNET_SPECS
from denoising_diffusion_deep_fake_tpu.models.unet import Unet, create_unet

__all__ = ["ResNetEncoder", "RESNET_SPECS", "Unet", "create_unet"]
