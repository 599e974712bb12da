from denoising_diffusion_deep_fake_tpu.data.manifest import (
    read_image_manifest,
    write_image_manifest,
)
from denoising_diffusion_deep_fake_tpu.data.loader import ImageLoader

__all__ = ["read_image_manifest", "write_image_manifest", "ImageLoader"]
