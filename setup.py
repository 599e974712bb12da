from setuptools import setup, find_packages

setup(
    name="denoising_diffusion_deep_fake_tpu",
    version="0.1.0",
    description="TPU-native face-swap-via-denoising framework (JAX/XLA/Pallas)",
    packages=find_packages(exclude=("tests",)),
    python_requires=">=3.10",
    entry_points={
        "console_scripts": [
            "d3f-tpu = denoising_diffusion_deep_fake_tpu.main:cli",
        ],
    },
)
